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
- time travel: any retained version is readable by number.

Scale shape: the log holds one small JSON per commit and data files are
ordinary parquet — reads are ``spark.read.parquet(<explicit files>)``,
so Catalyst sees a plain multi-file scan (pushdown/pruning intact). At
100 TB the manifest lists grow with file count, not data size; real
systems shard manifests, which this deliberately does not (documented
boundary — the semantics, not the metadata layout, are the point).
"""

from __future__ import annotations

import json
import os
import time
import uuid

_LOG = "_log"
_DATA = "data"


class CommitConflict(RuntimeError):
    """Raised when an overwrite loses the optimistic-concurrency race."""


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:08d}.json")


def current_version(path: str) -> int:
    """Latest committed version, or -1 for an empty/absent table."""
    try:
        names = os.listdir(_log_dir(path))
    except FileNotFoundError:
        return -1
    versions = [
        int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()
    ]
    return max(versions, default=-1)


def read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def _publish(path: str, version: int, manifest: dict) -> bool:
    """Atomically claim ``version`` with the manifest; False if taken.
    link(2) is atomic on POSIX: exactly one staged file can acquire the
    final name, so concurrent committers serialize without locks."""
    os.makedirs(_log_dir(path), exist_ok=True)
    staged = os.path.join(_log_dir(path), f".tmp-{uuid.uuid4().hex}.json")
    with open(staged, "w") as f:
        json.dump(manifest, f, separators=(",", ":"))
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(staged, _manifest_path(path, version))
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(staged)


def _write_data_files(df, path: str) -> list[str]:
    """Write the DataFrame as parquet under a fresh uuid subdirectory of
    data/ (so concurrent writers never collide on file names); returns
    table-relative file paths."""
    sub = os.path.join(_DATA, uuid.uuid4().hex)
    out_dir = os.path.join(path, sub)
    df.write.mode("overwrite").parquet(out_dir)
    return [
        os.path.join(sub, n)
        for n in sorted(os.listdir(out_dir))
        if n.endswith(".parquet")
    ]


def _commit(path: str, kind: str, files: list[str], schema: str,
            base_version: int, *, strict_base: bool,
            max_retries: int = 50) -> int:
    """Publish a commit on top of the head, retrying on lost races.
    ``strict_base``: fail (CommitConflict) if the head moved past
    ``base_version`` — the overwrite rule; appends re-merge instead."""
    attempt = 0
    while True:
        head = current_version(path)
        if strict_base and head != base_version:
            raise CommitConflict(
                f"table advanced to v{head} since v{base_version}; "
                "re-read and retry the overwrite"
            )
        if kind == "append" and head >= 0:
            live = read_manifest(path, head)["files"] + files
        else:
            live = files
        manifest = {
            "version": head + 1,
            "parent": head,
            "kind": kind,
            "schema": schema,
            "files": live,
            "committed_at": time.time(),
        }
        if _publish(path, head + 1, manifest):
            return head + 1
        attempt += 1
        if attempt > max_retries:
            raise CommitConflict(f"lost {max_retries} commit races at {path}")


def create_table(df, path: str) -> int:
    """Create (or fail if the table exists) — version 0 EXACTLY. The
    commit is strict on version 0, so two racing create_table calls
    cannot both succeed (the round-9 review caught the loser previously
    re-publishing as v1 and silently replacing the winner's snapshot)."""
    if current_version(path) >= 0:
        raise FileExistsError(f"table already exists at {path}")
    files = _write_data_files(df, path)
    manifest = {
        "version": 0,
        "parent": -1,
        "kind": "create",
        "schema": df.schema.simpleString(),
        "files": files,
        "committed_at": time.time(),
    }
    if not _publish(path, 0, manifest):
        raise FileExistsError(f"table already exists at {path}")
    return 0


def append(df, path: str) -> int:
    """Append rows — merges cleanly with concurrent appends (file sets
    union; no conflict possible)."""
    files = _write_data_files(df, path)
    return _commit(path, "append", files, df.schema.simpleString(),
                   base_version=current_version(path), strict_base=False)


def overwrite(df, path: str, base_version: int | None = None) -> int:
    """Replace the table's contents atomically. Fails with
    CommitConflict if the head moved past ``base_version`` (optimistic
    concurrency — the caller re-reads and retries)."""
    if base_version is None:
        base_version = current_version(path)
    files = _write_data_files(df, path)
    return _commit(path, "overwrite", files, df.schema.simpleString(),
                   base_version=base_version, strict_base=True)


def snapshot_read(spark, path: str, version: int | None = None):
    """Snapshot-isolated read: resolve the version ONCE, then scan
    exactly that manifest's files (a plain parquet multi-file scan —
    pushdown and pruning intact). ``version`` time-travels."""
    if version is None:
        version = current_version(path)
    if version < 0:
        raise FileNotFoundError(f"no committed version at {path}")
    m = read_manifest(path, version)
    files = [os.path.join(path, f) for f in m["files"]]
    if not files:
        raise ValueError(f"version {version} lists no files")
    return spark.read.parquet(*files)


def history(path: str) -> list[dict]:
    """[{version, parent, kind, n_files}, ...] oldest first."""
    head = current_version(path)
    out = []
    for v in range(head + 1):
        m = read_manifest(path, v)
        out.append(
            {
                "version": v,
                "parent": m["parent"],
                "kind": m["kind"],
                "n_files": len(m["files"]),
            }
        )
    return out
