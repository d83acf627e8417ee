"""Snapshot-isolated mini table format (round 9, verdict stretch #8).

The repo already has MERGE/SCD2 and compaction/z-order as *computations*
(operators/maintenance.py, zorder.py); this module adds the missing
lakehouse *semantics*: a commit-log table format over plain parquet that
gives atomic commits, optimistic concurrency for multiple writers,
snapshot-isolated reads, and time travel — the (much reduced) essence of
the public Delta Lake / Iceberg designs, on nothing but the filesystem:

- layout: ``<table>/data/*.parquet`` plus a ``<table>/_log/`` of JSON
  manifests ``00000000.json, 00000001.json, …`` — version N's manifest
  lists the COMPLETE set of live data files at that snapshot (Iceberg
  -style full manifests; no log replay needed to read);
- atomicity: a manifest is staged under ``_log/.tmp-*`` and published
  with ``os.link`` to its final name — link(2) fails with EEXIST if the
  version was taken, which IS the commit arbitration (POSIX gives this
  atomically; no locks, no coordination service);
- optimistic concurrency: a writer that loses the race re-reads the log
  and retries on top of the new head. APPENDs always merge cleanly;
  OVERWRITE/compaction retries fail if the base snapshot moved (the
  conservative conflict rule — same default as Delta's);
- snapshot isolation: readers resolve a version ONCE and read only that
  manifest's files — concurrent commits never tear a read;
- time travel: any retained version is readable by number;
- row-level DELETE (round 11): copy-on-write at file granularity —
  :func:`delete_where` rewrites only the files containing matching rows
  and carries every untouched file's manifest entry forward verbatim;
  SQL DELETE semantics (NULL predicate keeps the row), overwrite-class
  conflict rule, history stays time-travelable across the delete;
- MERGE / upsert (round 11): :func:`merge_into` — whole-row UPDATE for
  matched ``on`` keys, INSERT for unmatched, same file-granular COW and
  conflict rule as DELETE; the source may evolve the schema like append;
- VACUUM (round 11): :func:`vacuum` — retention GC that drops old
  manifests and deletes only the data files no retained version
  references (reference-driven, so in-flight unpublished writes and
  shared history files are untouchable);
- OPTIMIZE (round 11): :func:`optimize` — small-file compaction as a
  snapshot-isolated commit (rows exactly preserved, optional
  single-column range clustering); pairs with vacuum to reclaim the
  fragmented layout once retention passes; round 12 adds
  ``cluster_by=[a, b]`` multi-column Z-ORDER clustering (Morton
  interleave via operators/zorder.py, bounds from manifest stats);
- per-file column statistics + data skipping (round 12): every
  manifest file entry records footer-derived min/max/null-count stats
  (operators/fileskip.py); :func:`snapshot_read`'s ``where=`` and the
  DELETE/MERGE discovery scans prune non-overlapping files BEFORE any
  Spark scan is built — the Delta/Iceberg skipping layer above
  parquet's own row-group pruning;
- change feed (round 12): :func:`read_changes` serves every row
  ADDED in a version range (create/append/overwrite new files from
  the log's ``added`` record; merge INSERTS from a sidecar
  :func:`merge_into` writes), stamped with commit version + kind —
  the Delta CDF essence, pairing the exactly-once write side for
  incremental table-to-table pipelines; ``include_deletes=True`` also
  serves the rows REMOVED by delete/overwrite commits, derived by a
  uniform snapshot diff (no eager change files to write);
- merge-on-read DELETE via deletion vectors (round 12):
  ``delete_where(mode="dv")`` writes matching row POSITIONS as a
  (file, pos) sidecar instead of rewriting files — the Delta
  deletion-vectors / Iceberg positional-delete essence; reads apply
  vectors with an anti-join (``_metadata.row_index``), repeated
  deletes union vectors, fully-deleted entries drop, and
  :func:`optimize` materializes vectors back into clean files.
  Delete-sized writes for small frequent deletes against huge files
  (the GDPR-erasure shape); COW stays the default where read
  amplification matters more;
- RESTORE (round 12): :func:`restore` resets the head to any retained
  snapshot as a new pure-metadata commit — history is never rewritten
  and the schema never narrows (old entries stay portable because the
  schema list only appends);
- empty snapshots are valid (round 12): a delete removing every row
  commits ``files: []`` and reads back as zero rows in the table
  schema; every operator works on top of one;
- pluggable commit arbitration (round 12): :func:`set_commit_arbiter`
  selects link(2) (default) or a conditional-write (write-if-absent
  claim + atomic rename) arbiter — the exact shape an S3/GCS
  conditional PUT replaces, so the object-store port is one function;
- schema evolution (round 10): each manifest carries a SCHEMA LIST and
  every data file records which schema id it was written under
  (Iceberg's design, reduced). Appends/overwrites may ADD columns and
  WIDEN types (byte→short→int→long, float→double); anything else —
  narrowing, renames, incompatible type changes — is rejected at commit
  time. Reads group files by their write-time schema, scan each group
  with exactly that schema, and align to the requested table schema
  (missing columns null, narrower types cast up) — so every historical
  snapshot stays readable after evolution, including reading an OLD
  snapshot through the EVOLVED schema.

Scale shape: the log holds one small JSON per commit and data files are
ordinary parquet — reads are ``spark.read.parquet(<explicit files>)``,
so Catalyst sees a plain multi-file scan (pushdown/pruning intact). At
100 TB the manifest lists grow with file count, not data size; real
systems shard manifests, which this deliberately does not (documented
boundary — the semantics, not the metadata layout, are the point).

DEPLOYMENT BOUNDARY (stated, not implied): commit arbitration uses
link(2) and LOG listing uses os.listdir, so driver and every committer
must share ONE POSIX filesystem (single node, or NFS with POSIX link
semantics). On an object store there is no atomic link — real systems
swap this layer for a conditional PUT or a catalog/lock service
(exactly what Delta's LogStore abstraction is). DATA files are no
longer listed from the OS at all (round-10 verdict #6): each commit's
file set is derived from Spark's committed-output enumeration at write
time and thereafter read only from manifests, so the data path has no
listing and no listing-races-with-writers on any filesystem. The COMMIT
layer runs on the driver; only data-file writes are distributed. That
is the right split for the semantics this module exists to demonstrate;
the log arbiter alone is what an S3 port would replace.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from rpa_etl_spark.operators import fileskip

_LOG = "_log"
_DATA = "data"
_CHANGES = "_changes"
_DV = "_dv"


class CommitConflict(RuntimeError):
    """Raised when an overwrite loses the optimistic-concurrency race."""


class ConstraintViolation(ValueError):
    """Raised when rows being written break a table CHECK constraint."""


class SchemaEvolutionError(ValueError):
    """Raised when a commit's schema cannot evolve the table's (narrowing,
    incompatible type change) — the caller must cast explicitly."""


# permitted widenings, by StructField.dataType.typeName()
_INT_ORDER = {"byte": 0, "short": 1, "integer": 2, "long": 3}
_FLOAT_ORDER = {"float": 0, "double": 1}


def _wider(a, b):
    """The wider of two DataTypes if they are EQUAL or sit on one numeric
    widening chain, else None. Full-type equality first: typeName alone
    would call array<int> and array<string> (or two decimals of different
    precision) the same, letting an incompatible change commit and read
    back as silent nulls — parameterized types must match exactly."""
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    for order in (_INT_ORDER, _FLOAT_ORDER):
        if an in order and bn in order:
            return a if order[an] >= order[bn] else b
    return None


# StructField.metadata key holding a column's STABLE FIELD ID (round 13
# — the Delta column-mapping / Iceberg field-id essence): ids are minted
# at commit time, ride every stored schema, survive renames, and are how
# a file written before a rename still yields the renamed column. Spark
# carries field metadata through StructType JSON untouched.
_TFID = "tfid"


def _field_id(f) -> "int | None":
    try:
        v = f.metadata.get(_TFID)
    except Exception:  # noqa: BLE001 — no metadata at all
        return None
    return int(v) if isinstance(v, (int, float)) else None


def _with_id(f, fid: int):
    from pyspark.sql.types import StructField

    md = dict(f.metadata or {})
    md[_TFID] = int(fid)
    return StructField(f.name, f.dataType, f.nullable, md)


def _max_field_id(schemas: list[dict]) -> int:
    """Largest field id any stored schema ever used (ids are never
    reused — a re-added column after a drop gets a FRESH id, so the
    dropped column's data stays hidden)."""
    from pyspark.sql.types import StructType

    mx = 0
    for sj in schemas:
        for f in StructType.fromJson(sj).fields:
            fid = _field_id(f)
            if fid is not None and fid > mx:
                mx = fid
    return mx


def _enrich_ids(schema, next_id: int):
    """Stamp stable field ids onto every field lacking one (existing ids
    — inherited from stored table schemas through merge_schemas — are
    kept). Returns (schema', next_id')."""
    from pyspark.sql.types import StructType

    fields = []
    for f in schema.fields:
        fid = _field_id(f)
        if fid is None:
            fid = next_id
            next_id += 1
        fields.append(_with_id(f, fid))
    return StructType(fields), next_id


def merge_schemas(table_schema, df_schema):
    """Evolve ``table_schema`` by ``df_schema``: shared columns must match
    exactly or widen along a numeric chain (either direction — a narrower
    incoming file is fine to WRITE, it reads back cast up); new df columns
    append after the table columns; table columns absent from the df are
    kept (they read as null for the new files). Any other change —
    narrowing, implicit renames, cross-family or parameterized-type
    changes (array/map/struct element types, decimal precision) — raises
    SchemaEvolutionError before anything publishes. (EXPLICIT renames/
    drops are their own metadata-only commits: :func:`rename_column` /
    :func:`drop_column`.)

    Matching is by STABLE FIELD ID first when both sides carry one (only
    schemas this module stored do — it makes a restore across a rename
    fuse the old field with its renamed self, keeping the TABLE's
    current name), then by name; a name match whose explicit ids differ
    is NOT fused (a re-added column after a drop is a different
    column)."""
    from pyspark.sql.types import StructField, StructType

    used: set[int] = set()
    out = []
    for f in table_schema.fields:
        fid = _field_id(f)
        g = None
        if fid is not None:
            g = next((d for d in df_schema.fields
                      if _field_id(d) == fid and id(d) not in used), None)
        if g is None:
            cand = next((d for d in df_schema.fields
                         if d.name == f.name and id(d) not in used), None)
            if cand is not None:
                cid = _field_id(cand)
                if cid is None or fid is None or cid == fid:
                    g = cand
        if g is None:
            out.append(f)
            continue
        used.add(id(g))
        w = _wider(f.dataType, g.dataType)
        if w is None:
            raise SchemaEvolutionError(
                f"column {f.name!r}: cannot evolve "
                f"{f.dataType.simpleString()} <-> {g.dataType.simpleString()}"
            )
        # the table's name and id always win (renames are table-side)
        out.append(
            f if f.dataType == w
            else StructField(f.name, w, True, dict(f.metadata or {}))
        )
    out.extend(d for d in df_schema.fields if id(d) not in used)
    names = [f.name for f in out]
    if len(names) != len(set(names)):
        dup = sorted({n for n in names if names.count(n) > 1})
        raise SchemaEvolutionError(
            f"evolution would duplicate column name(s) {dup} (a new "
            "column collides with a renamed one)"
        )
    return StructType(out)


def _upgrade_manifest(m: dict) -> dict:
    """Read-side upgrade of a pre-schema-evolution (round-9) manifest:
    file entries were plain path strings and the only schema record was
    the table's simpleString. Reconstructs the v2 shape (one schema,
    every file under it) so old persisted tables stay readable and
    appendable; an unparseable legacy schema fails with a clear message
    instead of a KeyError deep in a commit."""
    if "schemas" in m:
        return m
    from pyspark.sql.types import StructType

    try:
        schema = StructType.fromDDL(m["schema"])
    except Exception as e:  # noqa: BLE001
        raise ValueError(
            "legacy (pre-schema-evolution) manifest whose schema string "
            f"{m.get('schema')!r} cannot be parsed — rewrite the table "
            "via create_table/append to migrate"
        ) from e
    out = dict(m)
    out["schemas"] = [schema.jsonValue()]
    out["schema_id"] = 0
    out["files"] = [{"path": f, "schema_id": 0} for f in m["files"]]
    return out


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:08d}.json")


def current_version(path: str) -> int:
    """Latest committed version, or -1 for an empty/absent table.

    The one remaining listing in the module, and an inherent one: the
    head IS defined by what the log directory contains (Delta lists
    _delta_log the same way). It is benign under concurrency — staged
    .tmp files fail the isdigit filter and the max over committed
    versions is monotone — and bounded: one small JSON per commit,
    never data-sized."""
    try:
        names = os.listdir(_log_dir(path))
    except FileNotFoundError:
        return -1
    versions = [
        int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()
    ]
    return max(versions, default=-1)


def _read_manifest_raw(path: str, version: int) -> dict:
    """One manifest EXACTLY as committed — incremental manifests carry
    ``add``/``remove`` deltas, not a file list (see :func:`read_manifest`
    for the materialized view)."""
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


# write a full-snapshot checkpoint sidecar every N commits: the log
# replay a reader pays is bounded by N delta manifests + one checkpoint,
# and every commit's manifest stays O(its own change), never O(table) —
# the Delta _last_checkpoint / Iceberg manifest-list essence (round-12
# verdict #3: full per-commit file lists were tens of MB of driver JSON
# per commit at 10^5 files)
_CKPT_EVERY = 16


def _ckpt_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:08d}.ckpt.json")


def write_checkpoint(path: str, version: "int | None" = None) -> str:
    """Materialize ``version``'s live file list as a checkpoint sidecar
    (``_log/NNNNNNNN.ckpt.json``). Checkpoints are DERIVED data — their
    content is fully determined by the manifest chain, so the write
    needs no arbitration (temp + atomic rename; a concurrent writer
    produces byte-equivalent content) and a crash before one lands only
    means readers replay a longer delta chain. _commit emits one every
    ``_CKPT_EVERY`` commits; vacuum emits one for its retention cutoff
    so retained versions never depend on dropped manifests."""
    if version is None:
        version = current_version(path)
    files = read_manifest(path, version)["files"]
    tmp = os.path.join(_log_dir(path), f".tmp-ckpt-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump({"version": version, "files": files},
                  f, separators=(",", ":"))
        f.flush()
        os.fsync(f.fileno())
    final = _ckpt_path(path, version)
    os.rename(tmp, final)
    return final


def _read_ckpt(path: str, version: int) -> "list[dict] | None":
    try:
        with open(_ckpt_path(path, version)) as f:
            return json.load(f)["files"]
    except FileNotFoundError:
        return None
    except Exception:  # noqa: BLE001 — torn/corrupt sidecar: replay log
        return None


def read_manifest(path: str, version: int) -> dict:
    """Version ``version``'s manifest with its live file list
    MATERIALIZED under ``files`` (the shape every consumer reads).
    Full manifests (v0, legacy tables) return as stored; incremental
    manifests replay ``add``/``remove`` deltas forward from the nearest
    checkpoint sidecar or full manifest — at most ``_CKPT_EVERY`` small
    JSON reads, independent of table history length."""
    top = _upgrade_manifest(_read_manifest_raw(path, version))
    if "files" in top:
        return top
    deltas: list[dict] = []
    cur = version
    m = top
    base: "list[dict] | None" = None
    while True:
        ck = _read_ckpt(path, cur)
        if ck is not None:
            base = ck
            break
        if "files" in m:
            base = m["files"]
            break
        deltas.append(m)
        cur = m["parent"]
        if cur < 0:
            base = []
            break
        m = _upgrade_manifest(_read_manifest_raw(path, cur))
    by_path: dict[str, dict] = {e["path"]: e for e in base}
    for d in reversed(deltas):
        for p in d.get("remove", ()):
            by_path.pop(p, None)
        for e in d.get("add", ()):
            by_path[e["path"]] = e
    out = dict(top)
    out["files"] = list(by_path.values())
    return out


def _stage_manifest(path: str, manifest: dict) -> str:
    os.makedirs(_log_dir(path), exist_ok=True)
    staged = os.path.join(_log_dir(path), f".tmp-{uuid.uuid4().hex}.json")
    with open(staged, "w") as f:
        json.dump(manifest, f, separators=(",", ":"))
        f.flush()
        os.fsync(f.fileno())
    return staged


def _publish_link(path: str, version: int, manifest: dict) -> bool:
    """link(2) arbiter: atomic on POSIX — exactly one staged file can
    acquire the final name, so concurrent committers serialize without
    locks. Requires one shared POSIX filesystem."""
    staged = _stage_manifest(path, manifest)
    try:
        os.link(staged, _manifest_path(path, version))
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(staged)


def _claim_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f".claim-{version:08d}")


def _publish_conditional(path: str, version: int, manifest: dict) -> bool:
    """Conditional-write (write-if-absent) arbiter — the shape an object
    store provides natively (S3 ``If-None-Match: *`` conditional PUT,
    GCS ``ifGenerationMatch=0``): create a per-version claim marker with
    O_EXCL (exactly one creator succeeds), then publish the full
    manifest with an atomic rename so readers never see partial JSON.
    Swapping in a real object store replaces the marker+rename pair with
    ONE conditional PUT of the manifest itself (atomic there), which
    also removes this emulation's one local caveat: a committer that
    dies between claim and rename leaves the version claimed-unpublished
    until a janitor clears the marker (real systems put a timeout/commit
    coordinator here; the default link arbiter has no such window)."""
    staged = _stage_manifest(path, manifest)
    try:
        fd = os.open(_claim_path(path, version), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        os.unlink(staged)
        return False
    os.close(fd)
    # publish via link, NOT rename: rename silently overwrites, so a
    # conditional-arbiter committer racing a link-arbiter committer of
    # the same table (a misconfiguration — all writers must use one
    # arbiter — but a possible one, since the arbiter is per-process)
    # could clobber an already-published manifest (round-12 ADVICE #4).
    # link(2) fails on an existing target, converting the clobber into
    # a lost race. A real object store replaces claim+publish with ONE
    # conditional PUT of the manifest, which has neither problem.
    try:
        os.link(staged, _manifest_path(path, version))
        return True
    except FileExistsError:
        return False  # claim marker stays; harmless (version is published)
    finally:
        os.unlink(staged)


_ARBITERS = {"link": _publish_link, "conditional": _publish_conditional}
_ARBITER = {"name": "link"}


def set_commit_arbiter(name: str) -> None:
    """Select the commit-arbitration strategy: ``"link"`` (default —
    POSIX link(2), filesystem-atomic) or ``"conditional"`` (write-if-
    absent claim + atomic rename — the object-store conditional-PUT
    shape, so an S3/GCS port swaps exactly one function)."""
    if name not in _ARBITERS:
        raise ValueError(f"unknown arbiter {name!r}; one of {sorted(_ARBITERS)}")
    _ARBITER["name"] = name


def _publish(path: str, version: int, manifest: dict) -> bool:
    """Atomically claim ``version`` with the manifest; False if taken.
    Dispatches to the selected arbiter (see :func:`set_commit_arbiter`)."""
    return _ARBITERS[_ARBITER["name"]](path, version, manifest)


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def partition_spec(path: str, version: "int | None" = None) -> list[str]:
    """The table's partition columns (``create_table(partition_by=…)``),
    in declared order; ``[]`` for an unpartitioned/absent table. The
    spec is fixed at create time and carried forward by every commit —
    it sits at the manifest's top level, so the RAW read suffices (no
    file-list materialization; this runs once per data write)."""
    if version is None:
        version = current_version(path)
    if version < 0:
        return []
    return list(_read_manifest_raw(path, version).get("partition_by") or [])


def _pv_from_rel(rel: str, partition_by: list[str]) -> dict:
    """Partition values parsed from a file's hive-style relative path
    (``data/<uuid>/day=2024-01-01/part-….parquet``): raw strings as
    written in the directory names, unescaped; the hive null marker
    maps to None. These are LAYOUT metadata + the pruning group key —
    typed pruning bounds come from the footer stats (the partition
    column stays physically present in every file)."""
    from urllib.parse import unquote

    vals: dict = {}
    for comp in rel.split(os.sep):
        if "=" not in comp:
            continue
        k, _, v = comp.partition("=")
        if k in partition_by:
            vals[k] = None if v == _HIVE_NULL else unquote(v)
    return {c: vals.get(c) for c in partition_by}


def _write_data_files(df, path: str, subdir: str = _DATA,
                      partition_by: "list[str] | None" = None) -> list[dict]:
    """Write the DataFrame as parquet under a fresh uuid subdirectory of
    data/ (so concurrent writers never collide on file names); returns
    file ENTRIES ``{"path": rel, "rows": n, "stats": {col: {min, max,
    nulls}}}`` — per-file column statistics read from each committed
    file's parquet FOOTER at write time (round-11 verdict #1), the
    data-skipping source for :func:`snapshot_read`'s pruned scans and
    the COW discovery paths.

    The file list comes from Spark's own committed-output enumeration
    (``read.parquet(out_dir).inputFiles()`` — the Hadoop committer's
    published view), NOT a raw ``os.listdir`` (round-10 verdict #6): the
    engine's view is exactly the set of files the write committed, it
    cannot race temporary/in-flight files, and it works on any
    Hadoop-supported filesystem — the DATA path no longer assumes POSIX
    listability (the commit LOG still does; see module docstring). The
    footer read is metadata-only (no data pages) and amortizes into the
    write; on an object store it is one ranged GET per file.

    Timestamp columns are written as INT64 TIMESTAMP_MICROS (pinned
    around the write): Spark's default INT96 encoding carries NO footer
    statistics, so a time-range predicate — the dominant selective
    predicate on an event table — could never prune a file (round-12
    verdict #1). Micros is also what Delta/Iceberg require.

    PARTITIONED tables (round-14, first-class partition columns): rows
    route into hive-style ``col=value/`` directories, but — unlike a
    plain ``partitionBy`` write — every partition column stays
    PHYSICALLY PRESENT in the files (the write partitions on a hidden
    duplicate ``__pv_<col>`` whose directories are renamed afterwards),
    so footer stats, schema alignment, deletion vectors and every read
    path work identically to the unpartitioned case. Each entry records
    its partition values under ``pv`` — the O(partitions) pruning group
    key. ``partition_by=None`` looks the spec up from the table head
    (every verb inherits the layout with no call-site changes); sidecar
    writes (changes/dv subdirs) never partition."""
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    if partition_by is None and subdir == _DATA:
        partition_by = partition_spec(path)
    partition_by = partition_by or []
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(
            f"write into a table partitioned by {partition_by} must "
            f"include the partition column(s) {missing}"
        )
    sub = os.path.join(subdir, uuid.uuid4().hex)
    out_dir = os.path.join(path, sub)
    sess = df.sparkSession
    tt_key = "spark.sql.parquet.outputTimestampType"
    tt_prev = sess.conf.get(tt_key)
    sess.conf.set(tt_key, "TIMESTAMP_MICROS")
    hidden = {c: f"__pv_{c}" for c in partition_by}
    try:
        if partition_by:
            staged = df
            for c, h in hidden.items():
                staged = staged.withColumn(h, F.col(c))
            staged.write.mode("overwrite") \
                .partitionBy(*hidden.values()).parquet(out_dir)
        else:
            df.write.mode("overwrite").parquet(out_dir)
    finally:
        sess.conf.set(tt_key, tt_prev)
    try:
        committed = sess.read.parquet(out_dir).inputFiles()
    except Exception:
        if partition_by:
            # an empty partitionBy write commits NO part files at all
            # (unlike the unpartitioned committer), so there is no
            # schema to infer — a valid zero-file commit
            committed = []
        else:
            raise
    rel_paths = sorted(
        os.path.join(
            sub,
            os.path.relpath(unquote(urlparse(uri).path),
                            os.path.abspath(out_dir)),
        )
        for uri in committed
    )
    if partition_by:
        # rename the hidden partition directories to their public
        # hive-style names (``__pv_day=X`` -> ``day=X``), deepest first
        # so parent paths stay valid; one rename per partition directory
        all_dirs = sorted(
            (os.path.join(dp, d) for dp, dn, _fn in os.walk(out_dir)
             for d in dn if d.startswith("__pv_")),
            key=len, reverse=True,
        )
        for full in all_dirs:
            os.rename(full, os.path.join(
                os.path.dirname(full), os.path.basename(full)[len("__pv_"):]
            ))
        # give every data file a GLOBALLY UNIQUE basename: one Spark
        # task writes the SAME part-NNNNN name into every partition
        # directory it touches, and deletion vectors key rows by
        # basename — colliding names would make one file's vector
        # delete rows from its same-named siblings (a real wrong-rows
        # bug, caught round 14). One metadata rename per file, same
        # asymptotic cost as the footer-stats read below. (This layout
        # layer is POSIX-bound like the commit log — see module notes.)
        committed_bn = {
            os.path.basename(unquote(urlparse(uri).path))
            for uri in committed
        }
        rel_paths = []
        for dp, _dn, fn in os.walk(out_dir):
            for f in fn:
                if f not in committed_bn:
                    continue  # committer artifacts (_SUCCESS, .crc)
                new = f"part-{uuid.uuid4().hex}.parquet"
                os.rename(os.path.join(dp, f), os.path.join(dp, new))
                try:  # drop the stale Hadoop checksum for the old name
                    os.unlink(os.path.join(dp, "." + f + ".crc"))
                except OSError:
                    pass
                rel_paths.append(
                    os.path.relpath(os.path.abspath(os.path.join(dp, new)),
                                    os.path.abspath(path)))
        rel_paths.sort()
    entries = [
        {"path": rel,
         **({"pv": _pv_from_rel(rel, partition_by)} if partition_by else {}),
         **fileskip.collect_file_stats(os.path.join(path, rel))}
        for rel in rel_paths
    ]
    # empty partitions commit empty part files: they contribute no rows,
    # so keep them out of the manifest (a fully-empty write is a valid
    # zero-file commit — empty snapshots read back as zero rows) and off
    # the disk (reference-driven vacuum would never reclaim them)
    for e in entries:
        if e["rows"] == 0:
            try:
                os.unlink(os.path.join(path, e["path"]))
            except OSError:
                pass
    kept = [e for e in entries if e["rows"] > 0]
    if not kept:
        # a fully-empty write leaves a uuid directory holding only
        # committer markers (_SUCCESS/.crc) that no manifest will ever
        # reference — reference-driven vacuum could never reclaim it
        # (round-12 ADVICE #3)
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    return kept


def _schema_id(schemas: list[dict], schema_json: dict) -> int:
    """Index of ``schema_json`` in the manifest's schema list, appending
    it if new. Schemas are compared structurally (json equality)."""
    for i, s in enumerate(schemas):
        if s == schema_json:
            return i
    schemas.append(schema_json)
    return len(schemas) - 1


def _discard_files(path: str, entries: list[dict]) -> None:
    """Remove the uuid data subdirectory a FAILED commit wrote (all files
    of one write share it). Losers of commit races and rejected schema
    evolutions must not leak snapshot-sized orphan directories — the
    write happens before arbitration by design (data first, then the
    atomic manifest link), so the failure paths own the cleanup."""
    import shutil

    if entries:
        # the write's uuid root is the first TWO path components
        # (``data/<uuid>``) — a partitioned entry's dirname would be the
        # hive subdirectory (``data/<uuid>/day=X``), leaking siblings
        sub = os.sep.join(entries[0]["path"].split(os.sep)[:2])
        shutil.rmtree(os.path.join(path, sub), ignore_errors=True)


def _session_tz(spark) -> str:
    """The SQL session time zone — what timestamp literals in pruning
    predicates resolve in (fileskip's ``tz=``)."""
    try:
        return spark.conf.get("spark.sql.session.timeZone") or "UTC"
    except Exception:  # noqa: BLE001 — no conf: stay conservative
        return "UTC"


class _TxnAlreadyApplied(Exception):
    """Internal: the (app, batch) transaction is already in the log —
    the commit must be skipped and its staged files discarded."""

    def __init__(self, version: int):
        self.version = version


def _txns_map(path: str, head: int, head_manifest: "dict | None" = None) -> dict:
    """The ``{app: last_batch}`` transaction watermark map as of
    ``head`` — ONE head-manifest read for any manifest written since the
    map was introduced (each commit carries the full map forward, the
    Delta ``setTransaction`` snapshot-state design), with a one-time
    legacy reconstruction walk for tables whose head predates it. This
    is what keeps a long-running streaming sink O(1) per micro-batch
    instead of O(history) (round-11 ADVICE #3: the previous newest-first
    scan re-read every manifest on every txn-carrying append)."""
    m = head_manifest if head_manifest is not None else read_manifest(path, head)
    if "txns" in m:
        return dict(m["txns"])
    # legacy manifests: reconstruct from the retained log once; the next
    # commit persists the map and all later reads are O(1)
    txns: dict = {}
    for v in range(head + 1):
        try:
            mv = read_manifest(path, v)
        except FileNotFoundError:
            continue
        t = mv.get("txn")
        if t:
            txns[t["app"]] = max(int(t["batch"]), txns.get(t["app"], -1))
    return txns


def _last_txn_batch(path: str, head: int, app: str) -> "int | None":
    """Most recent batch id committed for ``app`` — one head-manifest
    read (see :func:`_txns_map`)."""
    return _txns_map(path, head).get(app)


def _inherit_ids(df_schema, merged):
    """Carry ``merged``'s stable field ids onto the df schema's fields
    (matched by id when the df field already has one — a stored-schema
    df like restore's — else by name), keeping the df's own NAMES: a
    file's stored schema records its PHYSICAL column names plus the ids
    that map them to whatever the table later calls those columns."""
    from pyspark.sql.types import StructType

    by_id = {_field_id(f): f for f in merged.fields
             if _field_id(f) is not None}
    by_name = {f.name: f for f in merged.fields}
    fields = []
    for f in df_schema.fields:
        fid = _field_id(f)
        tgt = by_id.get(fid) if fid is not None else None
        if tgt is None:
            tgt = by_name.get(f.name)
        tid = _field_id(tgt) if tgt is not None else None
        fields.append(_with_id(f, tid) if tid is not None else f)
    return StructType(fields)


def _commit(path: str, kind: str, new_files: list[dict], df_schema,
            base_version: int, *, strict_base: bool,
            carry_files: "list[dict] | None" = None,
            txn: "dict | None" = None,
            change_files: "list[dict] | None" = None,
            schema_override=None,
            constraints_override: "dict | None" = None,
            enforced: "dict | None" = None,
            max_retries: int = 50) -> int:
    """Publish a commit on top of the head, retrying on lost races.
    ``strict_base``: fail (CommitConflict) if the head moved past
    ``base_version`` — the overwrite rule; appends re-merge instead.
    ``carry_files``: explicit surviving file entries to carry into the
    new manifest (the copy-on-write DELETE path — untouched files keep
    their original entries, schema ids included); only meaningful with
    ``strict_base=True``, which guarantees the list was computed against
    the head being replaced. ``txn``: an ``{"app", "batch"}`` idempotence
    record stamped into the manifest; the duplicate check runs INSIDE
    the retry loop (like schema evolution) so a lost race against a
    replay of the SAME transaction resolves to a skip, never a double
    apply. ``change_files``: change-feed sidecar entries (merge inserts)
    recorded alongside the commit for :func:`read_changes`. Schema
    evolution (merge + the new file's schema id) is recomputed INSIDE
    the retry loop, against whatever head the retry lands on."""
    from pyspark.sql.types import StructType

    attempt = 0
    while True:
        head = current_version(path)
        if strict_base and head != base_version:
            raise CommitConflict(
                f"table advanced to v{head} since v{base_version}; "
                "re-read and retry the overwrite"
            )
        txns: dict = {}
        prev_files: list[dict] = []
        cons: dict = {}
        pby: list = []
        if head >= 0:
            prev = read_manifest(path, head)
            prev_files = prev["files"]
            cons = dict(prev.get("constraints") or {})
            pby = list(prev.get("partition_by") or [])
            txns = _txns_map(path, head, prev)
            if txn is not None:
                last = txns.get(txn["app"])
                if last is not None and int(txn["batch"]) <= last:
                    raise _TxnAlreadyApplied(head)
            schemas = list(prev["schemas"])
            table_schema = StructType.fromJson(schemas[prev["schema_id"]])
            if schema_override is not None:
                # explicit metadata schema change (rename/drop): the
                # caller computed the new table schema; no merge
                merged = schema_override
            else:
                merged = merge_schemas(table_schema, df_schema)
            if carry_files is not None:
                live = list(carry_files)
            elif kind == "append":
                live = list(prev["files"])
            else:
                live = []
        else:
            schemas = []
            merged = df_schema
            live = []
        if constraints_override is not None:
            cons = dict(constraints_override)
        elif enforced is not None and cons != enforced:
            # the caller validated its rows against a DIFFERENT
            # constraint set than the head now carries (a concurrent
            # add_constraint won the race): re-read, re-validate, retry
            raise CommitConflict(
                f"table constraints changed since validation "
                f"({sorted(enforced)} -> {sorted(cons)}); re-read and retry"
            )
        # stamp stable field ids: fields inherited from stored schemas
        # keep theirs, new columns mint fresh ones (never reused)
        merged, _ = _enrich_ids(merged, _max_field_id(schemas) + 1)
        df_use = _inherit_ids(df_schema, merged)
        df_sid = _schema_id(schemas, df_use.jsonValue())
        table_sid = _schema_id(schemas, merged.jsonValue())
        live = live + [{**e, "schema_id": df_sid} for e in new_files]
        if txn is not None:
            txns[txn["app"]] = int(txn["batch"])
        manifest = {
            "version": head + 1,
            "parent": head,
            "kind": kind,
            "schema": merged.simpleString(),
            "schemas": schemas,
            "schema_id": table_sid,
            "n_live": len(live),
            "added": [e["path"] for e in new_files],
            "txns": txns,
            "committed_at": time.time(),
        }
        if cons:
            manifest["constraints"] = cons
        if pby:
            manifest["partition_by"] = pby
        if head < 0:
            # the first commit IS the full snapshot
            manifest["files"] = live
        else:
            # incremental manifest: record only what changed vs the
            # parent (round-12 verdict #3 — a full per-commit file list
            # made every commit O(table)); an entry whose content
            # changed (a grown deletion vector) re-adds under its path
            prev_by = {e["path"]: e for e in prev_files}
            live_by = {e["path"]: e for e in live}
            manifest["add"] = [
                e for p, e in live_by.items() if prev_by.get(p) != e
            ]
            manifest["remove"] = [p for p in prev_by if p not in live_by]
        if change_files is not None:
            manifest["change_files"] = [
                {**e, "schema_id": df_sid} for e in change_files
            ]
        if txn is not None:
            manifest["txn"] = {"app": txn["app"], "batch": int(txn["batch"])}
        if _publish(path, head + 1, manifest):
            new_v = head + 1
            if new_v % _CKPT_EVERY == 0:
                try:
                    write_checkpoint(path, new_v)
                except OSError:
                    pass  # derived data: readers replay a longer chain
            return new_v
        attempt += 1
        if attempt > max_retries:
            raise CommitConflict(f"lost {max_retries} commit races at {path}")


def _commit_rebase(path: str, kind: str, new_files: list[dict], df_schema,
                   base_version: int,
                   carry_files: list[dict],
                   change_files: "list[dict] | None" = None,
                   append_compat=None,
                   manifest_compat=None,
                   schema_override=None,
                   enforced: "dict | None" = None,
                   max_rebases: int = 20) -> int:
    """Strict (overwrite-class) commit with LOGICAL conflict detection —
    the Delta ConflictChecker essence, reduced: when the head moved past
    ``base_version``, the commit need not fail if every intervening
    commit was a PURE ADDITION (kind ``append``, removes nothing,
    modifies nothing) whose added entries each satisfy
    ``append_compat(entry)`` — the caller's proof that the addition
    cannot interact with this operation (for a predicate op: the
    entry's stats prove no row matches; for compaction: anything).
    Compatible additions REBASE: their entries carry into the new
    manifest alongside the survivors, and the commit retries on the new
    head. Anything else — an intervening delete/merge/overwrite/
    optimize, an addition that MIGHT overlap, a vacuumed gap, no
    ``append_compat`` — raises CommitConflict exactly as before.

    Why it matters at scale: compaction and predicate-scoped COW writes
    run for minutes on a 100 TB table while streaming ingest commits
    every few seconds; without logical detection every long write loses
    every race. With it, OPTIMIZE never conflicts with appends, and a
    delete/update/merge conflicts only when an append's stats OVERLAP
    its predicate/keys — the same stats machinery the read path prunes
    with (soundness: ``can_match`` is conservative, so unknown stats
    read as overlap = conflict, never a wrong rebase)."""
    bv = base_version
    carry = list(carry_files)
    rebases = 0
    while True:
        try:
            return _commit(path, kind, new_files, df_schema,
                           base_version=bv, strict_base=True,
                           carry_files=carry, change_files=change_files,
                           schema_override=schema_override,
                           enforced=enforced)
        except CommitConflict:
            if append_compat is None or rebases >= max_rebases:
                raise
            head = current_version(path)
            added_entries: list[dict] = []
            ok = True
            for v in range(bv + 1, head + 1):
                try:
                    raw = _read_manifest_raw(path, v)
                except FileNotFoundError:
                    ok = False  # vacuumed mid-race: cannot prove anything
                    break
                if raw.get("kind") != "append" or raw.get("remove"):
                    ok = False
                    break
                if manifest_compat is not None and not manifest_compat(raw):
                    ok = False
                    break
                adds = raw.get("add")
                if adds is None:  # legacy full manifest: no cheap delta
                    ok = False
                    break
                if not all(append_compat(e) for e in adds):
                    ok = False
                    break
                added_entries.extend(adds)
            if not ok:
                raise
            carry = carry + added_entries
            bv = head
            rebases += 1


def _no_match_compat(predicate: "str | None", tz: str):
    """append_compat proving an added entry holds NO row matching
    ``predicate`` — None (always-conflict) when the predicate is
    outside the prunable subset."""
    compiled = fileskip.compile_predicate(predicate) \
        if predicate is not None else None
    if compiled is None:
        return None
    return lambda e: not fileskip.can_match(compiled, e, tz)


def create_table(df, path: str,
                 partition_by: "list[str] | None" = None) -> int:
    """Create (or fail if the table exists) — version 0 EXACTLY. The
    commit is strict on version 0, so two racing create_table calls
    cannot both succeed (the round-9 review caught the loser previously
    re-publishing as v1 and silently replacing the winner's snapshot).

    ``partition_by`` (round-14) declares FIRST-CLASS PARTITION COLUMNS:
    every data-writing verb lays files out in hive-style
    ``col=value/`` directories, manifest entries record their partition
    values, and reads/verb discovery prune whole partitions in
    O(partitions) before any per-file stats arithmetic
    (fileskip.prune_entries). The spec is fixed for the table's
    lifetime and carried forward by every commit; partition columns
    cannot be renamed or dropped."""
    if current_version(path) >= 0:
        raise FileExistsError(f"table already exists at {path}")
    partition_by = list(partition_by or [])
    if len(set(partition_by)) != len(partition_by):
        raise ValueError(f"duplicate partition column in {partition_by}")
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(
            f"partition column(s) {missing} not in {df.columns}")
    files = _write_data_files(df, path, partition_by=partition_by)
    schema0, _ = _enrich_ids(df.schema, 1)  # mint stable field ids
    sjson = schema0.jsonValue()
    manifest = {
        "version": 0,
        "parent": -1,
        "kind": "create",
        "schema": schema0.simpleString(),
        "schemas": [sjson],
        "schema_id": 0,
        "files": [{**e, "schema_id": 0} for e in files],
        "added": [e["path"] for e in files],
        "txns": {},
        "committed_at": time.time(),
    }
    if partition_by:
        manifest["partition_by"] = partition_by
    if not _publish(path, 0, manifest):
        _discard_files(path, files)  # the winner's snapshot stays; ours goes
        raise FileExistsError(f"table already exists at {path}")
    return 0


def append(df, path: str, txn: "dict | None" = None) -> int:
    """Append rows — merges cleanly with concurrent appends (file sets
    union; no conflict possible). The table schema evolves per
    :func:`merge_schemas` (add columns / widen types; else
    SchemaEvolutionError).

    ``txn={"app": str, "batch": int}`` makes the append IDEMPOTENT — the
    Delta txn essence, for exactly-once streaming sinks: the manifest
    records (app, batch); a replay whose batch id is ≤ the app's last
    recorded batch is SKIPPED (current version returned, staged files
    discarded), and the duplicate check re-runs inside the commit retry
    loop so even two racing replays of the same batch apply once. Batch
    ids must be monotonically increasing per app (Structured Streaming's
    foreachBatch batchId contract). Every manifest carries the full
    ``{app: last_batch}`` watermark map forward (Delta's setTransaction
    snapshot state), so the duplicate check is ONE head-manifest read —
    O(1) per micro-batch, not O(history) — and replay protection
    survives :func:`vacuum` (the head always remembers every app's
    watermark)."""
    if txn is not None:
        # cheap pre-check before paying the data write (the in-loop
        # check remains authoritative under races)
        head = current_version(path)
        if head >= 0:
            last = _last_txn_batch(path, head, txn["app"])
            if last is not None and int(txn["batch"]) <= last:
                return head
    cons = constraints(path)
    if cons:
        _check_constraints(df, cons)
    files = _write_data_files(df, path)
    try:
        return _commit(path, "append", files, df.schema,
                       base_version=current_version(path),
                       strict_base=False, txn=txn, enforced=cons)
    except _TxnAlreadyApplied as skip:
        _discard_files(path, files)
        return skip.version
    except (CommitConflict, SchemaEvolutionError):
        _discard_files(path, files)
        raise


def streaming_append_sink(path: str, app: str):
    """foreachBatch writer with exactly-once semantics into the table
    format: ``stream.writeStream.foreachBatch(streaming_append_sink(p,
    "my-app")).start()``. Structured Streaming replays a micro-batch
    after a mid-batch failure (at-least-once delivery); the txn record
    turns the replay into a no-op, so the TABLE sees each batch exactly
    once — the commit-log rendering of the partition-overwrite
    idempotent sink in streaming/pipeline.py."""

    def write(batch_df, batch_id: int) -> None:
        append(batch_df, path, txn={"app": app, "batch": int(batch_id)})

    return write


def overwrite(df, path: str, base_version: int | None = None,
              where: "str | None" = None, change_feed: bool = True) -> int:
    """Replace the table's contents atomically. Fails with
    CommitConflict if the head moved past ``base_version`` (optimistic
    concurrency — the caller re-reads and retries). Schema evolution as
    in :func:`append` — history stays readable, so an overwrite may
    still only widen, never narrow.

    ``where`` (round-12 verdict #4 — the Delta ``replaceWhere``
    essence) makes the overwrite SELECTIVE: exactly the rows matching
    the predicate are replaced by ``df``'s rows, atomically, at file
    granularity — files the stats prove untouched carry their entries
    forward verbatim (the fileskip pruning + delete_where COW
    machinery). Every ``df`` row must itself satisfy the predicate
    (ValueError otherwise — Delta's constraint; a row outside the
    replaced region would silently corrupt the rest of the table).
    The commit kind is ``replace``; its change feed carries ``df``'s
    rows as the inserts sidecar, and the replaced rows surface through
    ``read_changes(include_deletes=True)``'s snapshot diff.

    Scale shape: a partition-shaped replace (the nightly re-ingest of
    one day, the classic replaceWhere use) discovers its affected
    files by manifest stats — on a time-clustered 100 TB table it
    rewrites the day, never the table."""
    if base_version is None:
        base_version = current_version(path)
    if where is None:
        cons = constraints(path, base_version) if base_version >= 0 else {}
        if cons:
            _check_constraints(df, cons)
        files = _write_data_files(df, path)
        try:
            return _commit(path, "overwrite", files, df.schema,
                           base_version=base_version, strict_base=True,
                           enforced=cons)
        except (CommitConflict, SchemaEvolutionError):
            _discard_files(path, files)
            raise
    return _replace_where(df, path, where, base_version, change_feed)


def _replace_where(df, path: str, where: str, base_version: int,
                   change_feed: bool) -> int:
    """Selective-overwrite body (see :func:`overwrite`)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    spark = df.sparkSession
    if base_version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    pred = F.expr(where)
    stray = df.where(~F.coalesce(pred, F.lit(False))).limit(1).count()
    if stray:
        raise ValueError(
            f"overwrite(where={where!r}): the replacement frame has rows "
            "NOT matching the predicate — they would land outside the "
            "replaced region (Delta's replaceWhere constraint)"
        )
    m = read_manifest(path, base_version)
    table = StructType.fromJson(m["schemas"][m["schema_id"]])
    merged = merge_schemas(table, df.schema)
    src = df.select(
        *[F.col(f.name).cast(f.dataType) if f.name in df.columns
          else F.lit(None).cast(f.dataType).alias(f.name)
          for f in merged.fields]
    )
    cons = dict(m.get("constraints") or {})
    if cons:
        _check_constraints(src, cons)
    candidates = fileskip.prune_entries(
        m["files"], where, _session_tz(spark),
        partition_by=m.get("partition_by"))
    affected_uris = []
    if candidates:
        affected_uris = [
            r["__file"]
            for r in _aligned_with_file(spark, path, m, merged,
                                        only_entries=candidates)
            .where(pred).select("__file").distinct().collect()
        ]
    if not affected_uris and not src.limit(1).count():
        return base_version  # nothing replaced, nothing inserted
    survivors = _entries_not_in(path, m, affected_uris)
    new_data = src
    if affected_uris:
        survivor_set = {id(e) for e in survivors}
        kept_parts = [
            g.where(~F.coalesce(pred, F.lit(False)))
            for _sid, g in _aligned_schema_groups(
                spark, path, m, merged,
                only_entries=[
                    e for e in m["files"] if id(e) not in survivor_set
                ],
            )
        ]
        kept = kept_parts[0]
        for part in kept_parts[1:]:
            kept = kept.unionByName(part)
        new_data = kept.unionByName(src)
    change_entries: "list[dict] | None" = None
    if change_feed:
        inserts = src.withColumn("_ck", F.lit("insert"))
        # no emptiness pre-gate — _write_data_files returns [] for an
        # empty frame, so the limit(1) job was a redundant source scan
        change_entries = [
            {**e, "ck": True}
            for e in _write_data_files(inserts, path, subdir=_CHANGES)
        ]
    new_files = _write_data_files(new_data, path)
    try:
        return _commit_rebase(
            path, "replace", new_files, merged,
            base_version=base_version,
            carry_files=survivors,
            change_files=change_entries,
            append_compat=_no_match_compat(where, _session_tz(spark)),
            enforced=cons,
        )
    except (CommitConflict, SchemaEvolutionError):
        _discard_files(path, new_files)
        if change_entries:
            _discard_files(path, change_entries)
        raise


def update_where(spark, path: str, predicate: str, assignments: dict,
                 base_version: "int | None" = None,
                 change_feed: bool = True) -> int:
    """Column-level ``UPDATE <table> SET col = expr WHERE predicate``
    (round-12 verdict #4) — copy-on-write at FILE granularity like
    :func:`delete_where`: files whose stats prove no row matches carry
    forward untouched (never opened); files with matches rewrite with
    ``assignments`` applied to exactly the matching rows. SQL UPDATE
    semantics: a row updates iff the predicate is TRUE (NULL keeps it);
    every SET expression sees the row's OLD values (simultaneous
    assignment); results cast to the column's existing type — UPDATE
    never evolves the schema (append/merge do that). Unknown SET
    columns raise ValueError before anything writes.

    ``change_feed`` (default on) records the updated rows' pre- and
    post-images in the commit's change sidecar (``_change_kind =
    'update_preimage' / 'update_postimage'`` in :func:`read_changes` —
    the Delta CDF shape); the sidecar write is update-sized.

    Concurrency: strict on ``base_version`` (overwrite-class). A
    predicate matching nothing returns the current version without
    committing. Returns the new version."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if not assignments:
        raise ValueError("update_where needs at least one SET assignment")
    if base_version is None:
        base_version = current_version(path)
    if base_version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    m = read_manifest(path, base_version)
    target = StructType.fromJson(m["schemas"][m["schema_id"]])
    known = {f.name for f in target.fields}
    unknown = sorted(set(assignments) - known)
    if unknown:
        raise ValueError(
            f"update_where SET columns {unknown} not in table schema "
            f"{sorted(known)}"
        )
    pred = F.expr(predicate)
    candidates = fileskip.prune_entries(
        m["files"], predicate, _session_tz(spark),
        partition_by=m.get("partition_by"))
    if not candidates:
        return base_version
    affected_uris = [
        r["__file"]
        for r in _aligned_with_file(spark, path, m, target,
                                    only_entries=candidates)
        .where(pred).select("__file").distinct().collect()
    ]
    if not affected_uris:
        return base_version
    survivors = _entries_not_in(path, m, affected_uris)
    survivor_set = {id(e) for e in survivors}
    parts = [
        g for _sid, g in _aligned_schema_groups(
            spark, path, m, target,
            only_entries=[e for e in m["files"] if id(e) not in survivor_set],
        )
    ]
    scan = parts[0]
    for p_ in parts[1:]:
        scan = scan.unionByName(p_)
    cond = F.coalesce(pred, F.lit(False))

    def _applied(frame, always: bool):
        sel = []
        for f in target.fields:
            if f.name in assignments:
                newv = F.expr(assignments[f.name]).cast(f.dataType)
                sel.append(
                    (newv if always else
                     F.when(cond, newv).otherwise(F.col(f.name)))
                    .alias(f.name)
                )
            else:
                sel.append(F.col(f.name))
        return frame.select(*sel)

    updated = _applied(scan, always=False)
    updated.schema  # analyze NOW: a bad SET expression must fail before
    # any sidecar/data write stages a uuid directory nothing will clean
    cons = dict(m.get("constraints") or {})
    if cons:
        _check_constraints(_applied(scan.where(cond), always=True), cons)
    change_entries: "list[dict] | None" = None
    if change_feed:
        pre = scan.where(cond)
        changes = (
            pre.withColumn("_ck", F.lit("update_preimage"))
            .unionByName(
                _applied(pre, always=True)
                .withColumn("_ck", F.lit("update_postimage"))
            )
        )
        change_entries = [
            {**e, "ck": True}
            for e in _write_data_files(changes, path, subdir=_CHANGES)
        ]
    new_files = _write_data_files(updated, path)
    try:
        return _commit_rebase(
            path, "update", new_files, target,
            base_version=base_version,
            carry_files=survivors,
            change_files=change_entries,
            append_compat=_no_match_compat(predicate, _session_tz(spark)),
            enforced=cons,
        )
    except (CommitConflict, SchemaEvolutionError):
        _discard_files(path, new_files)
        if change_entries:
            _discard_files(path, change_entries)
        raise


def delete_where(spark, path: str, predicate: str,
                 base_version: "int | None" = None,
                 mode: str = "cow",
                 dv_rewrite_fraction: float = 0.5) -> int:
    """Row-level DELETE as copy-on-write at FILE granularity — the
    reduced essence of Delta/Iceberg COW deletes: files containing no
    matching row carry their manifest entries into the new version
    UNTOUCHED (no rewrite, no data movement); only files with at least
    one match are rewritten without their matching rows. SQL DELETE
    semantics: a row is removed iff ``predicate`` evaluates TRUE — a
    NULL predicate keeps the row. The predicate is evaluated against the
    TABLE schema (rows from pre-evolution files see added columns as
    null, widened types cast up — exactly what snapshot_read returns),
    and rewritten files are stamped with the current table schema id.

    Concurrency: strict on ``base_version`` like :func:`overwrite` (a
    concurrent append could add rows the predicate should have removed;
    losing the race raises CommitConflict — re-read and retry). Returns
    the new version; a predicate matching nothing returns the current
    version WITHOUT committing (no empty commits in the log).

    ``mode="dv"`` (round 12) switches to MERGE-ON-READ: instead of
    rewriting affected files, the matching rows' POSITIONS are written
    as a deletion-vector sidecar (one (file, pos) parquet per commit)
    and the affected entries carry a ``dv`` record — the Delta
    deletion-vectors / Iceberg positional-delete essence. Reads apply
    the vector with an anti-join at scan time; :func:`optimize`
    materializes vectors back into clean files. The write cost becomes
    delete-sized (positions, not file bytes) — the right trade when
    deletes are small and frequent against huge files; COW remains
    right when read amplification matters more. A file whose every row
    is dv-deleted drops from the manifest entirely (no dangling
    all-deleted entries). Repeated dv deletes on the same file UNION
    their vectors. ``dv_rewrite_fraction`` (default 0.5, round-12
    verdict #7) auto-materializes any file whose TOTAL deleted fraction
    would cross the threshold — rewritten clean in the same commit —
    so the anti-join read tax stays bounded even if OPTIMIZE is never
    called; pass 1.0 for pure merge-on-read.

    Scale shape: the affected-file discovery scan is FIRST pruned by
    per-file manifest statistics (fileskip.prune_entries — files whose
    min/max prove no row can match never open; at 100 TB a selective
    delete on a clustered column touches a handful of files, not the
    snapshot); the predicate reaches the parquet scan as PushedFilters
    (the ``__file`` marker is the deterministic _metadata.file_path, so
    the filter pushes through it — gated in tests); only distinct file
    names (plus, in dv mode, delete-sized position sets) collect/write.
    The COW rewrite then reads EXACTLY the affected files by explicit
    list. A delete matching EVERY row commits a valid EMPTY snapshot
    (``files: []`` — snapshot_read returns zero rows in the table
    schema). History stays intact: older snapshots still list the
    pre-delete files and vectors, so time travel across the delete
    works and nothing may vacuum data files that any retained version
    references."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if mode not in ("cow", "dv"):
        raise ValueError(f"unknown delete mode {mode!r}; 'cow' or 'dv'")
    if base_version is None:
        base_version = current_version(path)
    if base_version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    m = read_manifest(path, base_version)
    target = StructType.fromJson(m["schemas"][m["schema_id"]])
    pred = F.expr(predicate)

    # manifest-level skip: entries whose stats prove the predicate false
    # are untouchable survivors — they never even open for discovery
    candidates = fileskip.prune_entries(
        m["files"], predicate, _session_tz(spark),
        partition_by=m.get("partition_by"))
    if not candidates:
        return base_version

    if mode == "dv":
        return _delete_where_dv(
            spark, path, predicate, base_version, m, target, candidates,
            dv_rewrite_fraction,
        )

    # affected = files with >= 1 TRUE-predicate row; bounded by file count
    affected_uris: list[str] = []
    for _sid, group in _aligned_schema_groups(
        spark, path, m, target, only_entries=candidates, with_file=True
    ):
        affected_uris += [
            r["__file"]
            for r in group.where(pred).select("__file").distinct().collect()
        ]
    if not affected_uris:
        return base_version
    survivors_entries = _entries_not_in(path, m, affected_uris)
    survivor_set = {id(e) for e in survivors_entries}

    # rewrite ONLY the affected files (explicit per-group lists), keeping
    # rows where the predicate is not TRUE (NULL keeps — SQL DELETE
    # semantics)
    kept_parts = []
    for _sid, group in _aligned_schema_groups(
        spark, path, m, target,
        only_entries=[e for e in m["files"] if id(e) not in survivor_set],
    ):
        kept_parts.append(group.where(~F.coalesce(pred, F.lit(False))))
    kept = kept_parts[0]
    for part in kept_parts[1:]:
        kept = kept.unionByName(part)
    # no emptiness pre-gate: _write_data_files drops zero-row files and
    # returns [] for an all-deleted rewrite, so the extra limit(1) job
    # (a second scan of every affected file) bought nothing (round 14)
    new_files = _write_data_files(kept, path)
    try:
        return _commit_rebase(
            path, "delete", new_files, target,
            base_version=base_version,
            carry_files=survivors_entries,
            append_compat=_no_match_compat(predicate, _session_tz(spark)),
        )
    except (CommitConflict, SchemaEvolutionError):
        _discard_files(path, new_files)
        raise


def _delete_where_dv(spark, path, predicate, base_version, m, target,
                     candidates, rewrite_fraction: float) -> int:
    """Merge-on-read delete body: write the matching positions as a
    (file, pos) sidecar and carry EVERY data file forward — affected
    entries gain (or grow) their ``dv`` record, fully-deleted entries
    drop. One discovery scan finds positions (already excluding rows
    earlier vectors deleted, so vectors never double-count); existing
    vectors of the affected files merge into the new sidecar so each
    entry references exactly ONE current vector set.

    ``rewrite_fraction`` (round-12 verdict #7) bounds the merge-on-read
    read tax WITHOUT a manual OPTIMIZE: a file whose total deleted
    fraction (existing vector + this delete) would cross the threshold
    is MATERIALIZED instead — rewritten copy-on-write in the same
    commit, its vector gone — so a table whose owner never calls
    OPTIMIZE still converges to at most ``rewrite_fraction`` dead rows
    per file. 1.0 (or higher) disables auto-materialization."""
    import os.path as _osp

    from pyspark.sql import functions as F

    # positions scan: the discovery scan, keeping (file, pos)
    matches = _positions_matching(spark, path, m, target, candidates,
                                  predicate)
    per_file = {r["file"]: r["n"] for r in
                matches.groupBy("file").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
    if not per_file:
        return base_version
    affected_bn = set(per_file)
    survivors, affected = [], []
    for e in m["files"]:
        (affected if _osp.basename(e["path"]) in affected_bn
         else survivors).append(e)
    # split the affected files by their WOULD-BE deleted fraction:
    # fully-deleted entries just drop; entries crossing the rewrite
    # threshold materialize COW in this same commit; the rest grow (or
    # gain) a vector
    dropped_bn: set[str] = set()
    rewrite_entries: list[dict] = []
    dv_entries_in: list[dict] = []
    for e in affected:
        bn = _osp.basename(e["path"])
        total_dead = per_file[bn] + (e.get("dv") or {}).get("rows", 0)
        if "rows" in e and total_dead >= e["rows"]:
            dropped_bn.add(bn)
        elif "rows" in e and total_dead >= rewrite_fraction * e["rows"]:
            rewrite_entries.append(e)
        else:
            dv_entries_in.append(e)
    new_files: list[dict] = []
    if rewrite_entries:
        # materialize: live rows of these entries (their existing
        # vectors already applied by the aligned scan) minus this
        # delete's matches
        parts = [
            g.where(~F.coalesce(F.expr(predicate), F.lit(False)))
            for _sid, g in _aligned_schema_groups(
                spark, path, m, target, only_entries=rewrite_entries
            )
        ]
        rewritten = parts[0]
        for p_ in parts[1:]:
            rewritten = rewritten.unionByName(p_)
        new_files = _write_data_files(rewritten, path)
    dv_keep_bn = {_osp.basename(e["path"]) for e in dv_entries_in}
    carry = list(survivors)
    dv_entries: list[dict] = []
    if dv_keep_bn:
        bn_lit = F.array(*[F.lit(b) for b in sorted(dv_keep_bn)])
        new_dv = matches.where(F.array_contains(bn_lit, F.col("file")))
        old_dv_paths = sorted({
            p for e in dv_entries_in if e.get("dv")
            for p in e["dv"]["paths"]
        })
        if old_dv_paths:
            old_rows = _dv_rows_frame(spark, path, old_dv_paths).where(
                F.array_contains(bn_lit, F.col("file"))
            )
            new_dv = new_dv.unionByName(old_rows).distinct()
        dv_entries = _write_data_files(new_dv, path, subdir=_DV)
        dv_paths = [e["path"] for e in dv_entries]
        totals = {r["file"]: r["n"] for r in
                  _dv_rows_frame(spark, path, dv_paths)
                  .groupBy("file").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
        dv_used = False
        for e in dv_entries_in:
            bn = _osp.basename(e["path"])
            n = totals.get(bn, 0)
            if "rows" in e and n >= e["rows"]:
                continue  # every row deleted: drop the entry entirely
            carry.append({**e, "dv": {"paths": dv_paths, "rows": n}})
            dv_used = True
        if not dv_used:
            # every vector-carrying candidate ended up fully deleted:
            # the freshly written sidecar would be referenced by NO
            # manifest entry, so vacuum's reference walk could never
            # reclaim it (round-12 ADVICE #3) — discard before commit
            _discard_files(path, dv_entries)
            dv_entries = []
    try:
        return _commit_rebase(
            path, "delete", new_files, target,
            base_version=base_version,
            carry_files=carry,
            append_compat=_no_match_compat(predicate, _session_tz(spark)),
        )
    except (CommitConflict, SchemaEvolutionError):
        if dv_entries:
            _discard_files(path, dv_entries)
        _discard_files(path, new_files)
        raise


def _positions_matching(spark, path, m, target, entries, predicate):
    """(file-basename, pos) of every LIVE row matching ``predicate`` in
    the given entries — dv-aware (already-deleted positions excluded),
    predicate pushed into the scan."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    pred = F.expr(predicate)
    by_sid: dict[int, list[dict]] = {}
    for e in entries:
        by_sid.setdefault(e["schema_id"], []).append(e)
    parts = []
    for sid, group_entries in sorted(by_sid.items()):
        file_schema = StructType.fromJson(m["schemas"][sid])
        scan = spark.read.schema(file_schema).parquet(
            *[os.path.join(path, e["path"]) for e in group_entries]
        ).select(
            *_aligned_cols(file_schema, target),
            _basename_col(F.col("_metadata.file_path")).alias("file"),
            F.col("_metadata.row_index").alias("pos"),
        )
        matched = scan.where(pred).select("file", "pos")
        dv_paths = sorted({
            p for e in group_entries if e.get("dv")
            for p in e["dv"]["paths"]
        })
        if dv_paths:
            dv = _dv_rows_frame(spark, path, dv_paths)
            matched = matched.join(dv, ["file", "pos"], "left_anti")
        parts.append(matched)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _dv_rows_frame(spark, path: str, dv_paths: list[str]):
    """The (file, pos) deletion-vector rows of the given sidecar files."""
    return spark.read.schema("file string, pos long").parquet(
        *[os.path.join(path, p) for p in sorted(dv_paths)]
    )


def _basename_col(col):
    from pyspark.sql import functions as F

    return F.element_at(F.split(col, "/"), -1)


def _align_map(file_schema, target) -> dict:
    """target column name -> the FILE's physical column name holding it
    (None = absent, reads as null). Matched by STABLE FIELD ID when the
    file's stored schema carries ids (every schema this module stored
    since field ids — so a file written before a rename still yields
    the renamed column, and a re-added column never leaks a dropped
    column's old data); legacy id-free schemas match by name."""
    file_ids = {_field_id(f): f.name for f in file_schema.fields
                if _field_id(f) is not None}
    file_names = set(file_schema.fieldNames())
    out = {}
    for f in target.fields:
        fid = _field_id(f)
        if file_ids:
            src = file_ids.get(fid) if fid is not None else None
            # a target field without an id can only come from a legacy
            # schema_version; fall back to name for it alone
            if fid is None and f.name in file_names:
                src = f.name
        else:
            src = f.name if f.name in file_names else None
        out[f.name] = src
    return out


def _aligned_cols(file_schema, target):
    """The SELECT list aligning one file group to ``target``: matched
    columns cast to the target type under the target NAME, absent
    columns as typed nulls."""
    from pyspark.sql import functions as F

    src = _align_map(file_schema, target)
    return [
        F.col(src[f.name]).cast(f.dataType).alias(f.name)
        if src[f.name] is not None
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in target.fields
    ]


def _aligned_schema_groups(spark, path: str, m: dict, target,
                           only_entries: "list[dict] | None" = None,
                           with_file: bool = False):
    """Yield ``(schema_id, frame)`` per write-time-schema group of
    manifest ``m``, each frame aligned to ``target`` (the snapshot_read
    contract: missing columns null, narrower types cast up) and with
    the snapshot's DELETION VECTORS applied (round 12: entries carrying
    a ``dv`` record anti-join their sidecar's (file, pos) rows away —
    the merge-on-read delete path; dv-free entries keep the plain
    scan). ``with_file=True`` adds a ``__file`` column (the
    deterministic ``_metadata.file_path``, so predicates above it still
    push into the scan — unlike input_file_name). ``only_entries``
    restricts the scan to an explicit entry subset (the COW rewrite
    path)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    by_sid: dict[int, list[dict]] = {}
    for entry in (m["files"] if only_entries is None else only_entries):
        by_sid.setdefault(entry["schema_id"], []).append(entry)
    for sid, entries in sorted(by_sid.items()):
        file_schema = StructType.fromJson(m["schemas"][sid])
        aligned_cols = _aligned_cols(file_schema, target)
        file_col = [F.col("_metadata.file_path").alias("__file")] \
            if with_file else []
        parts = []
        plain = [e for e in entries if not e.get("dv")]
        dved = [e for e in entries if e.get("dv")]
        if plain:
            scan = spark.read.schema(file_schema).parquet(
                *[os.path.join(path, e["path"]) for e in plain]
            )
            parts.append(scan.select(*aligned_cols, *file_col))
        if dved:
            scan = spark.read.schema(file_schema).parquet(
                *[os.path.join(path, e["path"]) for e in dved]
            ).select(
                *aligned_cols,
                F.col("_metadata.file_path").alias("__file"),
                F.col("_metadata.row_index").alias("__pos"),
            )
            dv = _dv_rows_frame(
                spark, path,
                sorted({p for e in dved for p in e["dv"]["paths"]}),
            )
            kept = scan.join(
                dv,
                (_basename_col(scan["__file"]) == dv["file"])
                & (scan["__pos"] == dv["pos"]),
                "left_anti",
            ).drop("__pos")
            parts.append(kept if with_file else kept.drop("__file"))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        yield sid, out


def _empty_frame(spark, target, with_file: bool = False):
    """Zero rows in exactly the ``target`` schema (the valid-empty-
    snapshot read shape; optionally with the __file marker column)."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = (
        StructType(list(target.fields) + [StructField("__file", StringType())])
        if with_file
        else target
    )
    return spark.createDataFrame([], schema)


def _aligned_with_file(spark, path: str, m: dict, target,
                       only_entries: "list[dict] | None" = None):
    """The snapshot's rows aligned to ``target`` plus a ``__file`` column
    naming the physical file each row came from (the deterministic
    ``_metadata.file_path`` — predicates and join keys above it still
    push/prune normally). An empty entry set (empty snapshot, or
    everything pruned) yields an empty frame in the same shape."""
    parts = [
        g
        for _sid, g in _aligned_schema_groups(
            spark, path, m, target, only_entries=only_entries,
            with_file=True,
        )
    ]
    if not parts:
        return _empty_frame(spark, target, with_file=True)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _entries_not_in(path: str, m: dict, affected_uris: list[str]) -> list[dict]:
    """Manifest entries of ``m`` whose physical file is NOT among the
    ``affected_uris`` (input_file_name URIs) — the carry-forward set of
    a copy-on-write commit."""
    from urllib.parse import unquote, urlparse

    affected_paths = {
        os.path.realpath(unquote(urlparse(u).path)) for u in affected_uris
    }
    return [
        e for e in m["files"]
        if os.path.realpath(os.path.join(path, e["path"])) not in affected_paths
    ]


def merge_into(spark, path: str, source, on: "list[str]",
               base_version: "int | None" = None,
               change_feed: bool = True) -> int:
    """COW MERGE (upsert), the Delta ``MERGE … UPDATE SET * / INSERT *``
    essence reduced to whole-row semantics: a source row whose ``on`` key
    exists in the table REPLACES that row; an unmatched source row
    INSERTS. File granularity copy-on-write, like :func:`delete_where`:
    files containing no matched key carry their manifest entries forward
    verbatim; only files with at least one match rewrite (their
    unmatched rows + nothing else — the replacements and inserts land in
    the new files alongside them).

    Contract guards (raise ValueError before anything writes):
    - ``source`` must be key-unique on ``on`` — duplicate source keys
      make the update ambiguous (Delta throws the same way);
    - ``source`` must carry EVERY current table column (same or
      widenable type) — whole-row replacement with a partial row would
      silently null the missing columns. Extra source columns EVOLVE the
      table schema exactly as append does (add/widen; else
      SchemaEvolutionError).

    Concurrency: strict on ``base_version`` (overwrite-class); NULL keys
    never match (SQL join semantics), so NULL-keyed source rows insert.

    Scale shape: the discovery scan is pruned TWICE before any data
    reads — per-file manifest stats against the source's key BOUNDS (one
    tiny aggregate over the source; a single-key merge into a clustered
    table opens only the overlapping files), then one key-join scan over
    the surviving files (collects only distinct file names); the rewrite
    reads only those files; the matched/unmatched split is one hash join
    keyed on ``on`` — the same shuffle a SQL MERGE pays.

    ``change_feed`` (default on) additionally records the merge's
    INSERTED rows (source keys not present in the table) as a change
    sidecar in the manifest — what :func:`read_changes` serves for merge
    commits; the sidecar write is insert-sized, the Delta CDF cost
    shape. Pass False to skip it (read_changes then refuses ranges
    crossing this commit)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if base_version is None:
        base_version = current_version(path)
    if base_version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    m = read_manifest(path, base_version)
    table = StructType.fromJson(m["schemas"][m["schema_id"]])

    missing = [f.name for f in table.fields if f.name not in source.columns]
    if missing:
        raise ValueError(
            f"merge_into source lacks table columns {missing} — whole-row "
            "replacement requires every current column (select them "
            "explicitly, or use delete_where+append for partial shapes)"
        )
    # the post-merge table schema (source may add/widen); the aligned
    # scan and every rewritten row are cast to it so the new files are
    # uniform under one schema id
    merged = merge_schemas(table, source.schema)
    src = source.select(
        *[F.col(f.name).cast(f.dataType) for f in merged.fields
          if f.name in source.columns],
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in merged.fields
          if f.name not in source.columns],
    ).select(*[f.name for f in merged.fields])
    cons = dict(m.get("constraints") or {})
    if cons:
        _check_constraints(src, cons)
    keys = src.select(*on).distinct()

    # ONE aggregate job prices three things at once (round 14 — these
    # were three separate source scans): the duplicate-key guard (max
    # per-key count over the grouped source), the source row count (sum
    # of the counts — the empty-source early exit's input), and the
    # manifest-skip key bounds (min/max per key column over the DISTINCT
    # keys, which equals min/max over the rows — min/max are set
    # functions, and the widening casts into `merged` are injective so
    # grouping src is grouping source).
    from pyspark.sql.types import TimestampType

    # timestamp keys aggregate as unix_micros (epoch ints) so the
    # bound literal never round-trips through Python datetime/tz;
    # everything else aggregates raw and converts via
    # fileskip.literal_from_py, which REJECTS NaN/inf bounds —
    # Spark's max() returns NaN (NaN sorts greatest), and comparing
    # against a NaN bound is False everywhere, which would prune
    # every file and turn matched rows into duplicate inserts
    # (round-12 ADVICE #2)
    dtypes = {f.name: f.dataType for f in src.schema.fields}
    is_ts = {k: isinstance(dtypes.get(k), TimestampType) for k in on}
    aggs = [F.max("__n").alias("__dupmax"),
            F.coalesce(F.sum("__n"), F.lit(0)).alias("__rows")]
    for k in on:
        c = F.unix_micros(F.col(k)) if is_ts[k] else F.col(k)
        aggs += [F.min(c).alias(f"__lo_{k}"), F.max(c).alias(f"__hi_{k}")]
    b = (
        src.groupBy(*on).agg(F.count(F.lit(1)).alias("__n"))
        .agg(*aggs).collect()[0]
    )
    if (b["__dupmax"] or 0) > 1:
        raise ValueError(
            f"merge_into source has duplicate keys on {on} — the update "
            "target row would be ambiguous; de-duplicate the source first"
        )
    src_rows = int(b["__rows"])

    # manifest-level skip: a file can hold a matched row only if, for
    # EVERY key column, its stats range overlaps the source's non-null
    # [min, max] (NULL source keys never match, so the non-null bounds
    # are the complete match window)
    candidates = m["files"]
    node = None
    if m["files"]:
        for k in on:
            lo, hi = b[f"__lo_{k}"], b[f"__hi_{k}"]
            if lo is None:
                # every source value of this key is NULL (or the source
                # is empty): no row can match anywhere
                candidates = []
                node = None
                break
            if is_ts[k]:
                llo, lhi = (fileskip.ts_micros_literal(lo),
                            fileskip.ts_micros_literal(hi))
            else:
                llo, lhi = (fileskip.literal_from_py(lo),
                            fileskip.literal_from_py(hi))
            if llo is None or lhi is None:
                continue  # unprunable key type/value: no constraint
            rng = ("and", ("cmp", k, ">=", llo), ("cmp", k, "<=", lhi))
            node = rng if node is None else ("and", node, rng)
        if node is not None:
            tz = _session_tz(spark)
            candidates = [
                e for e in m["files"] if fileskip.can_match(node, e, tz)
            ]
    aligned = _aligned_with_file(spark, path, m, merged,
                                 only_entries=candidates)

    affected_uris = [
        r["__file"]
        for r in aligned.join(keys, on, "left_semi")
        .select("__file").distinct().collect()
    ]
    if not affected_uris and not src_rows:
        return base_version  # empty source, nothing matched: no commit
    survivors_entries = _entries_not_in(path, m, affected_uris)
    # unmatched rows of the affected files + every source row (matched =
    # replacement, unmatched = insert) — one anti join, one union. The
    # rewrite reads EXACTLY the affected files by explicit list (the
    # same delete_where structure — never the full snapshot behind a
    # runtime isin filter).
    new_data = src
    if affected_uris:
        survivor_set = {id(e) for e in survivors_entries}
        kept_parts = [
            g.join(keys, on, "left_anti")
            for _sid, g in _aligned_schema_groups(
                spark, path, m, merged,
                only_entries=[
                    e for e in m["files"] if id(e) not in survivor_set
                ],
            )
        ]
        kept = kept_parts[0]
        for part in kept_parts[1:]:
            kept = kept.unionByName(part)
        new_data = kept.unionByName(src)

    change_entries: "list[dict] | None" = None
    if change_feed:
        # the merge's INSERTS (source rows whose key exists nowhere in
        # the table — pruning is conservative, so any matchable key is
        # in the candidate scan) plus, round-12 verdict #6, the matched
        # keys' UPDATE IMAGES: pre-image = the table's old row, post-
        # image = the replacing source row — written as one change-sized
        # sidecar whose ``_ck`` column carries the change kind (the
        # Delta CDF update_preimage/update_postimage shape)
        matched_keys = keys.join(aligned.select(*on), on, "left_semi")
        inserts = src.join(matched_keys, on, "left_anti")
        pre = aligned.drop("__file").join(matched_keys, on, "left_semi")
        post = src.join(matched_keys, on, "left_semi")
        changes = (
            inserts.withColumn("_ck", F.lit("insert"))
            .unionByName(pre.withColumn("_ck", F.lit("update_preimage")))
            .unionByName(post.withColumn("_ck", F.lit("update_postimage")))
        )
        # no emptiness pre-gate: _write_data_files returns [] for an
        # empty change set (it drops zero-row files), so the limit(1)
        # job — which re-evaluated the three-way union — was pure cost
        change_entries = [
            {**e, "ck": True}
            for e in _write_data_files(changes, path, subdir=_CHANGES)
        ]
    new_files = _write_data_files(new_data, path)
    try:
        return _commit_rebase(
            path, "merge", new_files, merged,
            base_version=base_version,
            carry_files=survivors_entries,
            change_files=change_entries,
            # an appended file whose stats prove it cannot hold ANY row
            # inside the source's key bounds cannot contain a matched
            # key — safe to rebase over (None = unprunable keys: strict)
            append_compat=(
                (lambda e: not fileskip.can_match(node, e,
                                                  _session_tz(spark)))
                if node is not None else None
            ),
            enforced=cons,
        )
    except (CommitConflict, SchemaEvolutionError):
        _discard_files(path, new_files)
        if change_entries:
            _discard_files(path, change_entries)
        raise


def optimize(spark, path: str, target_bytes: int = 128 * 1024 * 1024,
             sort_col: "str | None" = None,
             cluster_by: "list[str] | None" = None,
             where: "str | None" = None,
             base_version: "int | None" = None) -> int:
    """OPTIMIZE — small-file compaction as a table-format commit: rewrite
    the snapshot into ~``target_bytes``-sized files (kind ``optimize``),
    rows EXACTLY preserved. Small files are the canonical 100 TB scan
    killer (a task + footer + seek per file); streaming appends and COW
    deletes/merges accumulate them, and this is the reclaim step — the
    commit-log rendering of ``operators/maintenance.compact_parquet``
    (same sizing rule) with snapshot isolation on top: readers of older
    versions keep their file lists, and :func:`vacuum` reclaims the
    pre-optimize files once retention passes.

    ``sort_col`` additionally restores single-column clustering via a
    range repartition. ``cluster_by=[a, b]`` (round-11 verdict #5)
    restores MULTI-column clustering: the two numeric columns are
    interleaved into one Morton code (operators/zorder.py) whose bounds
    come from the manifest's per-file statistics (no extra data pass),
    then range-partitioned and sorted within partitions — each output
    file owns a small tile in (a, b) space, so per-file min/max ranges
    shrink for BOTH columns and :func:`snapshot_read`'s stats pruning
    skips files for predicates on either one (the OPTIMIZE…ZORDER BY
    payoff). Without either, the rewrite is a pure coalesce — no
    shuffle, each output task concatenates input files.

    ``where`` (round 14) SCOPES the compaction: only files the
    manifest stats (and partition values, on a partitioned table)
    cannot prove non-matching are rewritten; everything else carries
    forward verbatim. Compaction rewrites whole files without
    filtering rows, so ANY candidate selection is semantics-preserving
    — the predicate is a maintenance selector, not a row filter. This
    is the "OPTIMIZE one day/partition" op: on a 100 TB table the
    nightly compaction of today's streaming ingest touches one
    partition directory, never the table.

    Concurrency: strict on ``base_version`` — compacting over a lost
    race would silently drop the concurrent commit's rows. A no-op
    (already ≤ the target file count, or an empty snapshot) returns the
    current version without committing."""
    import math

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from rpa_etl_spark.operators import zorder

    if sort_col is not None and cluster_by is not None:
        raise ValueError("pass sort_col OR cluster_by, not both")
    if cluster_by is not None and len(cluster_by) < 2:
        raise ValueError(
            "cluster_by takes two or more numeric columns "
            "(use sort_col for single-column clustering)"
        )
    if base_version is None:
        base_version = current_version(path)
    if base_version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    m = read_manifest(path, base_version)
    target = StructType.fromJson(m["schemas"][m["schema_id"]])
    if not m["files"]:
        return base_version  # empty snapshot: nothing to compact
    if where is not None:
        cand = fileskip.prune_entries(
            m["files"], where, _session_tz(spark),
            partition_by=m.get("partition_by"))
    else:
        cand = m["files"]
    if not cand:
        return base_version  # nothing in scope
    cand_paths = {e["path"] for e in cand}
    keep = [e for e in m["files"] if e["path"] not in cand_paths]
    total = sum(
        os.path.getsize(os.path.join(path, e["path"])) for e in cand
    )
    n_out = max(1, math.ceil(total / target_bytes))
    has_dv = any(e.get("dv") for e in cand)
    if (len(cand) <= n_out and sort_col is None
            and cluster_by is None and not has_dv):
        # already compact AND vector-free: no empty commit (a deletion
        # vector always justifies the rewrite — optimize MATERIALIZES
        # merge-on-read deletes back into clean files)
        return base_version
    parts = [g for _sid, g in _aligned_schema_groups(
        spark, path, m, target, only_entries=cand)]
    df = parts[0]
    for p_ in parts[1:]:
        df = df.unionByName(p_)
    if cluster_by is not None:
        bounds = _cluster_bounds({**m, "files": cand}, cluster_by, df)
        code = zorder.morton(
            [(F.col(c), lo, hi) for c, (lo, hi) in zip(cluster_by, bounds)]
        )
        df = (
            df.withColumn("_z", code)
            .repartitionByRange(n_out, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
        )
    elif sort_col is not None:
        df = df.repartitionByRange(n_out, sort_col)
    else:
        df = df.coalesce(n_out)
    new_files = _write_data_files(df, path)
    try:
        return _commit_rebase(
            path, "optimize", new_files, target,
            base_version=base_version,
            carry_files=keep,
            # compaction interacts with NO addition: concurrent appends
            # rebase in unconditionally (their files simply stay
            # uncompacted until the next OPTIMIZE) — the property that
            # lets compaction run continuously against streaming ingest
            append_compat=lambda e: True,
        )
    except (CommitConflict, SchemaEvolutionError):
        _discard_files(path, new_files)
        raise


def _cluster_bounds(m: dict, cols: list[str], df) -> list[tuple[float, float]]:
    """[lo, hi] per cluster column — from the manifest's per-file stats
    when every live file carries them (pure metadata, the normal case),
    else one column-pruned min/max aggregate over the snapshot being
    rewritten (legacy files without stats)."""
    out: list[tuple[float, float]] = []
    have_all = all(
        isinstance((e.get("stats") or {}).get(c, {}).get("min"), (int, float))
        and not isinstance((e.get("stats") or {}).get(c, {}).get("min"), bool)
        and "t" not in (e.get("stats") or {}).get(c, {})  # tagged (ts/dec)
        # bounds are ENCODINGS, not the column's numeric value space
        for e in m["files"]
        for c in cols
    )
    if have_all:
        for c in cols:
            lo = min(e["stats"][c]["min"] for e in m["files"])
            hi = max(e["stats"][c]["max"] for e in m["files"])
            out.append((float(lo), float(hi)))
        return out
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    for c in cols:
        lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
        if lo is None:
            raise ValueError(f"cluster_by column {c!r} has no non-null values")
        out.append((float(lo), float(hi)))
    return out


def _guard_constrained_column(path: str, column: str, verb: str,
                              base_version: int) -> None:
    """Refuse renaming/dropping a column a CHECK constraint references
    (the expression would break every later write — Delta blocks the
    same way). Conservative word-boundary match on the expression text;
    drop the constraint first, then change the column."""
    import re as _re

    for cname, expr in constraints(path, base_version).items():
        if _re.search(rf"\b{_re.escape(column)}\b", expr, _re.IGNORECASE):
            raise ValueError(
                f"cannot {verb} column {column!r}: CHECK constraint "
                f"{cname!r} ({expr}) references it — drop_constraint first"
            )


def _guard_partition_column(path: str, column: str, verb: str,
                            base_version: int) -> None:
    """Refuse renaming/dropping a partition column: the hive directory
    layout and every entry's ``pv`` record are keyed by the declared
    name for the table's lifetime (Delta/Iceberg refuse the same)."""
    if column in partition_spec(path, base_version):
        raise ValueError(
            f"cannot {verb} column {column!r}: it is a partition column "
            f"(partition_by={partition_spec(path, base_version)})"
        )


def _metadata_schema_change(path: str, kind: str, new_schema,
                            base_version: "int | None") -> int:
    """Shared body of rename/drop: a PURE-METADATA commit carrying every
    live file forward under the new table schema. Rebase-safe over
    concurrent appends that did not themselves evolve the schema (their
    files align by field id regardless of the rename/drop)."""
    from pyspark.sql.types import StructType

    if base_version is None:
        base_version = current_version(path)
    if base_version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    m = read_manifest(path, base_version)
    base_schema_json = m["schemas"][m["schema_id"]]

    def same_schema(raw: dict) -> bool:
        return raw["schemas"][raw["schema_id"]] == base_schema_json

    return _commit_rebase(
        path, kind, [], new_schema,
        base_version=base_version,
        carry_files=list(m["files"]),
        schema_override=new_schema,
        append_compat=lambda e: True,
        manifest_compat=same_schema,
    )


def rename_column(path: str, old: str, new: str,
                  base_version: "int | None" = None) -> int:
    """RENAME a column WITHOUT rewriting any data — the Delta
    column-mapping / Iceberg field-id essence (round 13): every stored
    schema stamps each column with a STABLE FIELD ID, reads align files
    to the table schema by id, so a pure-metadata commit that changes
    only the field's NAME re-labels every historical file instantly.
    Old snapshots read through their own schemas keep the old name;
    reads through the renamed schema (the default at head) serve the
    same data under the new name.

    Guards: the old name must exist, the new must not; every LIVE file
    must have been written under an id-carrying schema (tables created
    before field ids align by name — renaming them would silently null
    the column; OPTIMIZE once to rewrite under an id-carrying schema).
    Statistics caveat: files written BEFORE the rename keep their stats
    under the old physical name, so predicates on the new name skip
    nothing for them (sound — they are simply always read) until the
    next OPTIMIZE rewrites them.

    Concurrency: rebases over concurrent appends (their files carry ids
    and align fine); any intervening schema evolution conflicts."""
    from pyspark.sql.types import StructField, StructType

    if base_version is None:
        base_version = current_version(path)
    schema = table_schema(path, base_version)
    names = [f.name for f in schema.fields]
    if old not in names:
        raise ValueError(f"no column {old!r} (have {names})")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    _guard_constrained_column(path, old, "rename", base_version)
    _guard_partition_column(path, old, "rename", base_version)
    m = read_manifest(path, base_version)
    for e in m["files"]:
        fs = StructType.fromJson(m["schemas"][e["schema_id"]])
        if not any(_field_id(f) is not None for f in fs.fields):
            raise ValueError(
                f"live file {e['path']} predates stable field ids — its "
                "columns align by NAME, so a rename would null them; "
                "run optimize() once to rewrite under the current schema"
            )
    renamed = StructType([
        StructField(new, f.dataType, f.nullable, dict(f.metadata or {}))
        if f.name == old else f
        for f in schema.fields
    ])
    return _metadata_schema_change(path, "rename_column", renamed,
                                   base_version)


def drop_column(path: str, name: str,
                base_version: "int | None" = None) -> int:
    """DROP a column WITHOUT rewriting any data (round 13): a pure-
    metadata commit removes the field from the table schema; the data
    stays in the files but no read through this or any later schema
    selects it (alignment is by stable field id, and a LATER re-added
    column with the same name mints a FRESH id — the dropped column's
    old values can never leak into it). Old snapshots read through
    their own schemas still see the column; vacuum reclaims the bytes
    when the pre-drop versions age out and the files rewrite.

    Same guards and concurrency posture as :func:`rename_column`."""
    from pyspark.sql.types import StructType

    if base_version is None:
        base_version = current_version(path)
    schema = table_schema(path, base_version)
    names = [f.name for f in schema.fields]
    if name not in names:
        raise ValueError(f"no column {name!r} (have {names})")
    if len(names) == 1:
        raise ValueError("cannot drop the only column")
    _guard_constrained_column(path, name, "drop", base_version)
    _guard_partition_column(path, name, "drop", base_version)
    dropped = StructType([f for f in schema.fields if f.name != name])
    return _metadata_schema_change(path, "drop_column", dropped,
                                   base_version)


def constraints(path: str, version: "int | None" = None) -> dict:
    """The table's CHECK constraints ``{name: sql_expr}`` at ``version``
    (default head); ``{}`` for an absent/empty table."""
    if version is None:
        version = current_version(path)
    if version < 0:
        return {}
    return dict(read_manifest(path, version).get("constraints") or {})


def _check_constraints(df, cons: dict) -> None:
    """Raise ConstraintViolation if any ``df`` row makes any constraint
    FALSE (SQL-standard CHECK: TRUE and UNKNOWN/NULL pass). One
    change-sized filter job per constraint, with a sample offending row
    in the error."""
    from pyspark.sql import functions as F

    for name, expr in sorted(cons.items()):
        bad = df.where(
            ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
        ).limit(1).collect()
        if bad:
            raise ConstraintViolation(
                f"CHECK constraint {name!r} ({expr}) violated, e.g. by "
                f"{bad[0].asDict()!r}"
            )


def add_constraint(spark, path: str, name: str, expr: str,
                   base_version: "int | None" = None) -> int:
    """ADD a named CHECK constraint (the Delta ``ALTER TABLE … ADD
    CONSTRAINT`` essence): from this commit on, every write that adds
    or changes rows (append / overwrite / replaceWhere / merge source /
    update post-images) is validated — a violating row fails the WHOLE
    write with :class:`ConstraintViolation` before anything publishes.
    Adding the constraint first validates every EXISTING row (one scan,
    like Delta). SQL-standard semantics: a row violates iff the
    expression is FALSE — NULL/UNKNOWN passes (add an ``x IS NOT NULL``
    constraint for null rejection).

    Race-safe: writers validate against the constraint set of the head
    they read, and the commit loop re-checks that the head still
    carries exactly that set — a concurrent add_constraint flips the
    write into a CommitConflict (re-read, re-validate, retry) instead
    of letting unvalidated rows slip in under the new rule."""
    if base_version is None:
        base_version = current_version(path)
    if base_version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    cons = constraints(path, base_version)
    if name in cons:
        raise ValueError(f"constraint {name!r} already exists: {cons[name]}")
    schema = table_schema(path, base_version)
    m = read_manifest(path, base_version)
    # an empty snapshot has no rows to validate — skip the scan job
    # (the common create-empty → constrain → ingest bootstrap pattern)
    # but still ANALYZE the expression against the table schema so a
    # malformed/unresolvable constraint is rejected here, not at the
    # first write
    if m["files"]:
        _check_constraints(
            snapshot_read(spark, path, base_version), {name: expr})
    else:
        from pyspark.sql import functions as F

        _empty_frame(spark, schema).where(
            F.expr(expr).cast("boolean")
        ).schema  # analysis only — no job
    return _commit(
        path, "add_constraint", [], schema,
        base_version=base_version, strict_base=True,
        carry_files=list(m["files"]),
        schema_override=schema,
        constraints_override={**cons, name: expr},
    )


def drop_constraint(path: str, name: str,
                    base_version: "int | None" = None) -> int:
    """Remove a CHECK constraint (metadata-only commit)."""
    if base_version is None:
        base_version = current_version(path)
    if base_version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    cons = constraints(path, base_version)
    if name not in cons:
        raise ValueError(f"no constraint {name!r} (have {sorted(cons)})")
    cons.pop(name)
    schema = table_schema(path, base_version)
    m = read_manifest(path, base_version)
    return _commit(
        path, "drop_constraint", [], schema,
        base_version=base_version, strict_base=True,
        carry_files=list(m["files"]),
        schema_override=schema,
        constraints_override=cons,
    )


def version_at_time(path: str, ts) -> int:
    """TIMESTAMP-BASED time travel (Delta's ``timestampAsOf``): the
    newest RETAINED version whose commit time is <= ``ts`` (a unix
    epoch float/int or a datetime; naive datetimes are taken as UTC).
    Raises ValueError when every retained commit is newer (the Delta
    behavior — there is no snapshot that early). Pure metadata: one
    raw-manifest read per retained version, newest-first, stopping at
    the first hit."""
    import datetime as _dt

    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        ts = ts.timestamp()
    head = current_version(path)
    if head < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    oldest = None
    for v in range(head, -1, -1):
        try:
            m = _read_manifest_raw(path, v)
        except FileNotFoundError:
            break  # vacuumed below here
        oldest = (v, m.get("committed_at"))
        if m.get("committed_at") is not None and m["committed_at"] <= ts:
            return v
    raise ValueError(
        f"no retained snapshot at or before ts={ts}: the oldest retained "
        f"commit is v{oldest[0]} at {oldest[1]}"
    )


def table_schema(path: str, version: int | None = None):
    """The table's StructType at ``version`` (default: head)."""
    from pyspark.sql.types import StructType

    if version is None:
        version = current_version(path)
    m = read_manifest(path, version)
    return StructType.fromJson(m["schemas"][m["schema_id"]])


def snapshot_read(spark, path: str, version: int | None = None,
                  schema_version: int | None = None,
                  where: "str | None" = None,
                  at_time=None):
    """Snapshot-isolated read: resolve the version ONCE, then scan
    exactly that manifest's files (plain parquet multi-file scans —
    pushdown and pruning intact). ``version`` time-travels. An EMPTY
    snapshot (a delete that removed every row) reads back as zero rows
    in the table schema.

    ``schema_version`` picks WHICH table schema the rows come back in
    (default: the schema as of ``version``). Passing a later version's
    schema reads an old snapshot THROUGH the evolved schema — added
    columns come back null, widened columns cast up. Files are grouped
    by their write-time schema id and each group is scanned with exactly
    the schema it was written under, then aligned; a fixed requested
    schema also means the read can't be torn by a concurrent evolution.

    ``where`` (round-11 verdict #1) is a SQL predicate applied to the
    read — and, BEFORE the Spark scan is built, to the manifest's
    per-file statistics: files whose min/max prove no row can match are
    never opened (fileskip.prune_entries — manifest-level data skipping,
    the layer ABOVE parquet's own row-group pruning: at 100 TB the plan
    lists only the overlapping files instead of handing Catalyst the
    whole snapshot). The predicate is STILL applied to the surviving
    rows, so the result is exact whatever the stats say.

    ``at_time`` (Delta's ``timestampAsOf``) time-travels by COMMIT TIME
    instead of version number — the newest retained snapshot at or
    before the given epoch/datetime (see :func:`version_at_time`);
    mutually exclusive with ``version``."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if at_time is not None:
        if version is not None:
            raise ValueError("pass version OR at_time, not both")
        version = version_at_time(path, at_time)
    if version is None:
        version = current_version(path)
    if version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    if schema_version is not None and schema_version < version:
        # the contract is reading forward through an EVOLVED schema; an
        # older schema would silently narrow/drop data (review fix)
        raise ValueError(
            f"schema_version {schema_version} predates snapshot {version}; "
            "schemas only evolve forward — read through an equal-or-later one"
        )
    m = read_manifest(path, version)
    target = (
        table_schema(path, schema_version)
        if schema_version is not None
        else StructType.fromJson(m["schemas"][m["schema_id"]])
    )
    entries = fileskip.prune_entries(m["files"], where, _session_tz(spark),
                                     partition_by=m.get("partition_by"))
    parts = [
        g for _sid, g in _aligned_schema_groups(
            spark, path, m, target, only_entries=entries
        )
    ]
    if not parts:
        out = _empty_frame(spark, target)
    else:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    return out.where(F.expr(where)) if where is not None else out


def pruned_file_counts(path: str, version: "int | None" = None,
                       where: "str | None" = None,
                       tz: str = "UTC") -> tuple[int, int]:
    """(files the pruned scan would open, files the snapshot holds) —
    the data-skipping evidence for tests and declared queries, computed
    from the manifest alone (no Spark). ``tz``: session time zone for
    timestamp literals (match the session the read would run in)."""
    if version is None:
        version = current_version(path)
    m = read_manifest(path, version)
    return (len(fileskip.prune_entries(m["files"], where, tz,
                                       partition_by=m.get("partition_by"))),
            len(m["files"]))


def read_changes(spark, path: str, from_version: int = 0,
                 to_version: "int | None" = None,
                 include_deletes: bool = False):
    """Incremental (change-feed) read — the Delta CDF essence: every row
    appended by commits in ``[from_version, to_version]``, each stamped
    with ``_commit_version`` (int) and ``_change_kind``, aligned to the
    table schema as of ``to_version``. This is the incremental-
    consumption read side pairing :func:`streaming_append_sink`'s
    exactly-once write side — a downstream stage reads ONLY the new
    commits since its last watermark instead of rescanning the
    snapshot, and (re)applies them idempotently with a per-version
    ``txn``.

    Per commit kind, ``_change_kind = 'insert'`` rows:
    - ``create`` / ``append`` / ``overwrite``: the commit's NEW data
      files (the log's ``added`` record) hold exactly the appended
      rows — zero extra write cost, derived from the log.
    - ``merge``: rewritten files mix pre-existing rows with updates, so
      the INSERTED rows come from the commit's change sidecar (written
      by :func:`merge_into` unless ``change_feed=False`` — a merge
      commit in range without a sidecar raises ValueError rather than
      silently under-reporting). Matched-key UPDATES are modeled
      in-place (this format's merge is whole-row replacement): they are
      neither inserts nor deletes, by design.
    - ``delete`` / ``optimize``: no row additions.
    - ``restore``: the rows the restore brought BACK (old snapshot
      minus parent snapshot), derived by the same diff rule as deletes.

    ``include_deletes=True`` additionally emits ``_change_kind =
    'delete'`` rows for ``delete`` (both COW and deletion-vector),
    ``overwrite``, and ``restore`` commits, derived by SNAPSHOT DIFF: the parent's live
    rows of every changed entry (an entry that disappeared, or whose
    deletion vector grew) multiset-MINUS the commit's replacement rows
    (exceptAll) — one uniform rule that yields exactly the removed rows
    for a COW rewrite, a vector growth, a full-file drop, and an
    overwrite. Requires the PARENT manifest of each such commit to
    still be retained (FileNotFoundError otherwise — same retention
    contract as the rest of the feed); costs a scan of the changed
    entries plus an exceptAll shuffle, the price of deriving what Delta
    records eagerly (documented trade: our deletes stay write-free).

    The feed extends as far as retained manifests: a vacuumed version
    inside the range raises FileNotFoundError (Delta's CDF retention
    behavior). Scale shape: one explicit-file-list scan per commit over
    only the NEW (or, for deletes, changed) files — incremental cost
    proportional to the change volume, never the table size."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    head = current_version(path)
    if head < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    if to_version is None:
        to_version = head
    if not (0 <= from_version <= to_version <= head):
        raise ValueError(
            f"bad change range [{from_version}, {to_version}] for head {head}"
        )
    target = table_schema(path, to_version)
    parts = []
    for v in range(from_version, to_version + 1):
        m = read_manifest(path, v)
        if m["kind"] in ("create", "append", "overwrite"):
            if "added" in m:
                added = set(m["added"])
                new_entries = [e for e in m["files"] if e["path"] in added]
            else:
                # legacy manifest (pre-"added"): diff against the parent,
                # which must still be retained
                prev = read_manifest(path, v - 1) \
                    if v > 0 else {"files": []}
                before = {e["path"] for e in prev["files"]}
                new_entries = [
                    e for e in m["files"] if e["path"] not in before
                ]
        elif m["kind"] in ("merge", "replace", "update"):
            if "change_files" not in m:
                raise ValueError(
                    f"version {v} is a {m['kind']} committed without a "
                    "change feed (change_feed=False) — the feed over "
                    "this range would be incomplete"
                )
            new_entries = list(m["change_files"])
        else:  # delete / optimize: no additions
            new_entries = []
        by_group: dict[tuple[int, bool], list[str]] = {}
        for e in new_entries:
            key = (e["schema_id"], bool(e.get("ck")))
            by_group.setdefault(key, []).append(os.path.join(path, e["path"]))
        for (sid, ck), files in sorted(by_group.items()):
            file_schema = StructType.fromJson(m["schemas"][sid])
            read_schema = file_schema
            if ck:
                # change sidecar rows carry their kind in a _ck column
                # (insert / update_preimage / update_postimage); legacy
                # sidecars without it are inserts by construction
                from pyspark.sql.types import StringType, StructField

                read_schema = StructType(
                    list(file_schema.fields)
                    + [StructField("_ck", StringType())]
                )
            kind_col = (F.col("_ck") if ck else F.lit("insert"))
            part = spark.read.schema(read_schema).parquet(*files).select(
                *_aligned_cols(file_schema, target),
                F.lit(v).cast("int").alias("_commit_version"),
                kind_col.alias("_change_kind"),
            )
            parts.append(part)
        diff_deletes = (
            include_deletes and v > 0
            and m["kind"] in ("delete", "overwrite", "restore", "replace")
        )
        diff_inserts = m["kind"] == "restore" and v > 0
        if diff_deletes or diff_inserts:
            prev = read_manifest(path, v - 1)
            pf = {e["path"]: e for e in prev["files"]}
            cf = {e["path"]: e for e in m["files"]}
            changed_parent = [
                e for pth, e in pf.items()
                if pth not in cf or cf[pth].get("dv") != e.get("dv")
            ]
            replacement_child = [
                e for pth, e in cf.items()
                if pth not in pf or e.get("dv") != pf[pth].get("dv")
            ]

            def _live(manifest, entries):
                gs = [
                    g for _s, g in _aligned_schema_groups(
                        spark, path, manifest, target, only_entries=entries
                    )
                ]
                if not gs:
                    return _empty_frame(spark, target)
                out = gs[0]
                for p_ in gs[1:]:
                    out = out.unionByName(p_)
                return out

            old = _live(prev, changed_parent)
            new = _live(m, replacement_child)
            if diff_inserts:
                parts.append(
                    new.exceptAll(old).select(
                        "*",
                        F.lit(v).cast("int").alias("_commit_version"),
                        F.lit("insert").alias("_change_kind"),
                    )
                )
            if diff_deletes:
                parts.append(
                    old.exceptAll(new).select(
                        "*",
                        F.lit(v).cast("int").alias("_commit_version"),
                        F.lit("delete").alias("_change_kind"),
                    )
                )
    if not parts:
        from pyspark.sql.types import IntegerType, StringType, StructField

        return _empty_frame(
            spark,
            StructType(
                list(target.fields)
                + [
                    StructField("_commit_version", IntegerType()),
                    StructField("_change_kind", StringType()),
                ]
            ),
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def row_count(path: str, version: "int | None" = None) -> int:
    """EXACT row count from the manifest alone — zero Spark jobs, zero
    file opens (the Delta/Iceberg count(*) metadata-only answer). Every
    entry records its footer row count at write time, and every commit
    kind preserves the invariant (appends add entries, COW rewrites
    replace them), so the sum IS the snapshot's count. Raises on a
    legacy (pre-stats) manifest whose entries lack counts — scan those
    with ``snapshot_read(...).count()`` once and rewrite to migrate."""
    if version is None:
        version = current_version(path)
    if version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    m = read_manifest(path, version)
    missing = [e["path"] for e in m["files"] if "rows" not in e]
    if missing:
        raise ValueError(
            f"{len(missing)} legacy entries lack row counts (e.g. "
            f"{missing[0]}); use snapshot_read().count()"
        )
    return sum(
        e["rows"] - (e.get("dv") or {}).get("rows", 0) for e in m["files"]
    )


def clear_stale_claims(path: str) -> int:
    """Janitor for the CONDITIONAL arbiter's documented crash window: a
    committer that died between claiming a version and renaming its
    manifest leaves the claim marker behind, and every later writer of
    that version conflicts forever. A claim strictly above the current
    head with no published manifest is exactly that wreckage — remove
    it (an object-store port replaces this with the store's conditional
    PUT, which has no such window, or a commit-timeout sweeper). Only
    run when no committer is legitimately mid-publish (the same
    operational contract as Delta's log cleanup). Returns the number of
    claims cleared."""
    head = current_version(path)
    cleared = 0
    try:
        names = os.listdir(_log_dir(path))
    except FileNotFoundError:
        return 0
    for n in names:
        if not n.startswith(".claim-"):
            continue
        v = int(n.split("-", 1)[1])
        if v > head and not os.path.exists(_manifest_path(path, v)):
            try:
                os.unlink(os.path.join(_log_dir(path), n))
                cleared += 1
            except FileNotFoundError:
                pass
    return cleared


def restore(path: str, version: int,
            base_version: "int | None" = None) -> int:
    """RESTORE the table to a retained ``version`` as a NEW commit (the
    Delta RESTORE essence): the old snapshot's file entries (deletion
    vectors included) carry into a fresh manifest at the head — history
    is never rewritten, the bad commits stay time-travelable, and the
    restore itself can be restored away. Pure metadata: no Spark, no
    data movement, O(entries).

    Correctness hinges on two invariants this module maintains:
    - the schema LIST only ever appends (every commit copies its
      parent's list), so an old entry's ``schema_id`` indexes the same
      schema in any later manifest — old entries are portable;
    - schemas only evolve forward: the restored TABLE schema is the
      old schema merged into the current one (wider wins), so a
      restore never narrows what later readers see — the old rows come
      back through the evolved schema like any old snapshot read.

    Guards: every data and vector file of the restored snapshot must
    still exist (a :func:`vacuum` past it makes the restore impossible
    — ValueError names the first missing file). Strict on
    ``base_version`` like overwrite. A restore TO the current head is
    a no-op (current version returned, no empty commit)."""
    from pyspark.sql.types import StructType

    if base_version is None:
        base_version = current_version(path)
    if base_version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    if version == base_version:
        return base_version
    old = read_manifest(path, version)
    needed = [e["path"] for e in old["files"]]
    needed += [p for e in old["files"] if e.get("dv")
               for p in e["dv"]["paths"]]
    for rel in needed:
        if not os.path.exists(os.path.join(path, rel)):
            raise ValueError(
                f"cannot restore to v{version}: {rel} was vacuumed away"
            )
    old_schema = StructType.fromJson(old["schemas"][old["schema_id"]])
    return _commit(
        path, "restore", [], old_schema,
        base_version=base_version, strict_base=True,
        carry_files=list(old["files"]),
    )


def sync_changes(spark, src_path: str, dst_path: str, app: str,
                 max_versions: "int | None" = None) -> int:
    """One-call EXACTLY-ONCE incremental table-to-table sync: apply
    every source commit's ADDITIONS (see :func:`read_changes`) past the
    destination's recorded watermark, one idempotent txn-stamped append
    per source version. The watermark IS the destination's own txn map
    (``{app: last_source_version}`` in its head manifest — O(1) read),
    so there is NO external checkpoint to lose: kill this anywhere and
    re-run — versions already applied are skipped by the txn guard,
    versions not yet applied replay, nothing double-applies. Empty
    versions (a delete, an optimize) still advance the watermark with a
    zero-file commit. Returns the number of source versions applied.

    This packages the change feed as the next pipeline stage's source
    (round-11 verdict #4's 'natural source' framing): run it from cron,
    a foreachBatch hook, or a loop — each call costs the NEW commits
    only, never a rescan. Additions-only by construction (source
    deletes do not propagate; the destination is an append-only
    materialization of everything the source ingested).

    ``max_versions`` caps how many source versions ONE call applies —
    the ``maxVersionsPerTrigger`` of the streaming wrapper
    (:func:`stream_changes`), bounding a micro-batch's size when the
    stream falls behind."""
    src_head = current_version(src_path)
    if src_head < 0:
        raise FileNotFoundError(f"no committed version at {src_path}")
    dst_head = current_version(dst_path)
    if dst_head < 0:
        # idempotent bootstrap: an EMPTY destination in the source's
        # current schema; rows only ever land via txn-guarded appends,
        # so a crash between create and the first append replays safely
        try:
            create_table(_empty_frame(spark, table_schema(src_path)),
                         dst_path)
        except FileExistsError:
            pass  # lost a bootstrap race: the winner's empty table is ours
        dst_head = current_version(dst_path)
    last = _txns_map(dst_path, dst_head).get(app)
    start = 0 if last is None else last + 1
    end = src_head
    if max_versions is not None:
        end = min(end, start + max_versions - 1)
    applied = 0
    from pyspark.sql import functions as F

    for v in range(start, end + 1):
        rows = (
            read_changes(spark, src_path, v, v)
            # additions-only materialization: update images describe
            # rows the destination already ingested, not new rows
            .where(F.col("_change_kind") == "insert")
            .drop("_commit_version", "_change_kind")
        )
        append(rows, dst_path, txn={"app": app, "batch": v})
        applied += 1
    return applied


class ChangeStream:
    """STREAMING source over the change feed (round-12 verdict #5) —
    the Delta ``readStream``-on-a-table essence as a micro-batch driver
    loop: every trigger applies at most ``max_versions_per_trigger``
    new source commits to the destination table via
    :func:`sync_changes`, then sleeps ``poll_interval_s`` when caught
    up. The stream's CHECKPOINT is the destination's own transaction
    map (``{app: last_source_version}`` in its head manifest), so there
    is no external state to lose: kill the loop anywhere — mid-batch,
    between batches, before the first — and a restarted stream resumes
    from the last committed version, applying each source version
    EXACTLY ONCE (the txn guard turns replays into no-ops). This is
    the long-running rendering of the one-call ``sync_changes``; a
    real Structured Streaming integration would wrap the same trigger
    body in a DataSourceV2 micro-batch reader — the offset log would
    hold what the txn map already holds.

    Usage::

        stream = ChangeStream(spark, src, dst, app="replicate")
        stream.start()            # daemon thread; returns immediately
        ...
        stream.stop()             # graceful; .crash() for an abrupt kill

    Scale shape: each trigger costs the NEW commits only (explicit-file
    scans of their added files); an idle stream costs one head-manifest
    read per poll."""

    def __init__(self, spark, src_path: str, dst_path: str, app: str,
                 max_versions_per_trigger: int = 10,
                 poll_interval_s: float = 0.25):
        self.spark = spark
        self.src_path = src_path
        self.dst_path = dst_path
        self.app = app
        self.max_versions_per_trigger = max_versions_per_trigger
        self.poll_interval_s = poll_interval_s
        self.versions_applied = 0
        self.error: "BaseException | None" = None
        self._stop = None
        self._thread = None

    def _run(self) -> None:
        try:
            while not self._stop.is_set():
                applied = sync_changes(
                    self.spark, self.src_path, self.dst_path, self.app,
                    max_versions=self.max_versions_per_trigger,
                )
                self.versions_applied += applied
                if applied == 0:
                    self._stop.wait(self.poll_interval_s)
        except BaseException as e:  # noqa: BLE001 — surfaced to the caller
            self.error = e

    def start(self) -> "ChangeStream":
        import threading

        if self._thread is not None and self._thread.is_alive():
            raise RuntimeError("stream already running")
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 60.0) -> None:
        """Graceful shutdown: finish the in-flight trigger, then exit."""
        if self._thread is None:
            return
        self._stop.set()
        self._thread.join(timeout)
        if self.error is not None:
            raise self.error

    def crash(self) -> None:
        """Abrupt kill for tests: abandon the thread WITHOUT waiting —
        whatever the in-flight trigger committed stays committed, the
        rest replays on restart (exactly-once either way)."""
        if self._stop is not None:
            self._stop.set()
        self._thread = None

    def await_caught_up(self, timeout: float = 60.0) -> None:
        """Block until the destination's watermark reaches the source's
        current head (for tests and drain-then-stop shutdowns)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            if self.error is not None:
                raise self.error
            src_head = current_version(self.src_path)
            dst_head = current_version(self.dst_path)
            if src_head < 0:
                return
            if dst_head >= 0:
                last = _txns_map(self.dst_path, dst_head).get(self.app)
                if last is not None and last >= src_head:
                    return
            time.sleep(0.05)
        raise TimeoutError(
            f"stream {self.app!r} not caught up within {timeout}s"
        )


def history(path: str) -> list[dict]:
    """[{version, parent, kind, n_files}, ...] oldest first. Versions
    removed by :func:`vacuum` are skipped (their manifests are gone)."""
    head = current_version(path)
    out = []
    for v in range(head + 1):
        try:
            m = _read_manifest_raw(path, v)
        except FileNotFoundError:
            continue  # vacuumed version
        n = m.get("n_live")
        if n is None:  # pre-incremental manifest: full list inline
            n = len(_upgrade_manifest(m)["files"])
        out.append(
            {
                "version": v,
                "parent": m["parent"],
                "kind": m["kind"],
                "n_files": n,
            }
        )
    return out


def vacuum(path: str, keep_last: int = 2,
           max_age_s: "float | None" = None) -> dict:
    """Retention GC — the Delta VACUUM essence, reduced: drop manifests
    older than the newest ``keep_last`` versions and delete the data
    files referenced ONLY by dropped versions. After a vacuum the head
    and its ``keep_last - 1`` predecessors still time-travel; older
    versions raise FileNotFoundError (the documented retention trade).

    ``max_age_s`` adds TIME-BASED retention (Delta's retention hours):
    a version committed within the last ``max_age_s`` seconds is kept
    even beyond ``keep_last`` — retention becomes "newest keep_last
    versions AND everything younger than the window", so
    :func:`version_at_time` keeps resolving anywhere inside it.

    Safety rules:
    - a data file is deleted iff a DROPPED manifest references it and NO
      retained manifest does — overwrite/delete commits keep history
      sharing files, and shared files must survive;
    - files the log knows nothing about are NEVER touched: an in-flight
      writer stages its uuid directory before publishing, and a vacuum
      racing it must not eat the unpublished data (this is why the GC
      is reference-driven, not orphan-listing-driven);
    - version numbering is preserved (no renumbering) — the log may
      have leading gaps afterwards, which history()/read paths skip.

    Returns {"dropped_versions", "deleted_files", "deleted_dirs"}.
    """
    head = current_version(path)
    out = {"dropped_versions": [], "deleted_files": 0, "deleted_dirs": 0}
    if head < 0:
        return out
    cutoff = head - max(1, keep_last) + 1  # retain versions >= cutoff
    if max_age_s is not None:
        horizon = time.time() - max_age_s
        v = 0
        while v < cutoff:
            try:
                m = _read_manifest_raw(path, v)
            except FileNotFoundError:
                v += 1
                continue
            if m.get("committed_at") is not None \
                    and m["committed_at"] >= horizon:
                cutoff = v  # this and everything newer is in the window
                break
            v += 1
    if cutoff <= 0:
        return out
    retained: set[str] = set()
    for v in range(cutoff, head + 1):
        try:
            m = read_manifest(path, v)
        except FileNotFoundError:
            continue
        retained.update(e["path"] for e in m["files"])
        retained.update(e["path"] for e in m.get("change_files", []))
        retained.update(
            p for e in m["files"] if e.get("dv") for p in e["dv"]["paths"]
        )
    # materialize every dropped version BEFORE touching the log: an
    # incremental manifest replays its parents, so dropping v while
    # iterating would break materializing v+1
    dropped: list[tuple[int, dict]] = []
    for v in range(cutoff):
        try:
            dropped.append((v, read_manifest(path, v)))
        except FileNotFoundError:
            continue  # vacuumed by an earlier pass
    # checkpoint the cutoff so retained versions reconstruct without the
    # manifests about to drop (their delta chains stop at this sidecar).
    # Only when something actually drops: a re-vacuum with a LARGER
    # keep_last computes a cutoff whose manifest an earlier pass already
    # removed — missing manifests form a prefix, so cutoff's manifest
    # exists exactly when `dropped` is non-empty (round-13 ADVICE #1)
    if dropped:
        write_checkpoint(path, cutoff)
    touched_dirs: set[str] = set()
    for v, m in dropped:
        dropped_entries = list(m["files"]) + list(m.get("change_files", []))
        dropped_entries += [
            {"path": p} for e in m["files"] if e.get("dv")
            for p in e["dv"]["paths"]
        ]
        for e in dropped_entries:
            if e["path"] in retained:
                continue
            try:
                os.unlink(os.path.join(path, e["path"]))
                out["deleted_files"] += 1
            except FileNotFoundError:
                pass  # shared with another dropped version, already gone
            d = os.path.dirname(e["path"])
            while d.count(os.sep) >= 1:  # partition dirs AND uuid root
                touched_dirs.add(d)
                d = os.path.dirname(d)
        os.unlink(_manifest_path(path, v))
        for side in (_claim_path(path, v), _ckpt_path(path, v)):
            try:  # claim marker / checkpoint sidecar, if present
                os.unlink(side)
            except FileNotFoundError:
                pass
        out["dropped_versions"].append(v)
    for d in sorted(touched_dirs, reverse=True):  # deepest first
        full = os.path.join(path, d)
        try:
            if not os.path.isdir(full):
                continue
            # Spark's Hadoop committer leaves _SUCCESS and .crc markers
            # in every data directory — a directory is "empty" once only
            # committer artifacts remain (round-11 ADVICE #2: the plain
            # listdir check meant fully-reclaimed dirs leaked forever)
            leftovers = os.listdir(full)
            if any(not n.startswith((".", "_")) for n in leftovers):
                continue  # real data remains (or appeared); leave it
            for n in leftovers:
                try:
                    os.unlink(os.path.join(full, n))
                except OSError:
                    pass
            os.rmdir(full)
            out["deleted_dirs"] += 1
        except OSError:
            pass  # non-empty or racing writer; leave it
    return out
