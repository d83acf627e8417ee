"""Z-order layout: the Morton-curve write must actually enable
multi-column file skipping — measured on real parquet footer statistics,
not assumed."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from rpa_etl_spark.operators.zorder import morton2, write_zordered
from rpa_etl_spark.tables import load


def _file_ranges(path: str, cols: tuple[str, str]):
    """Per parquet file: (min, max) of each column, from footer stats."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.read_metadata(f)
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def _files_intersecting(ranges, box):
    n = 0
    for r in ranges:
        if all(r[c][0] <= hi and r[c][1] >= lo for c, (lo, hi) in box.items()):
            n += 1
    return n


def test_morton_code_is_deterministic_and_bounded(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    code = morton2(F.col("user_id"), 0, 200, F.col("value"), 0.0, 600.0)
    rows = ev.select(code.alias("z")).agg(F.min("z"), F.max("z")).collect()[0]
    assert rows[0] >= 0
    assert rows[1] < (1 << 32)  # 2 dims x 16 bits


def test_zorder_layout_skips_files_on_both_dimensions(spark, sf_dir, tmp_path):
    """A box predicate on (user_id, value) must intersect strictly fewer
    files under the z-ordered layout than under a user_id-only sort,
    where every file's `value` range is full-width (so value predicates
    can never skip)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cols = ("user_id", "value")
    b = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    u_lo, u_hi, v_lo, v_hi = b
    # query box: top half of users, bottom quarter of values — selective
    # on BOTH dims, so a single-column sort can only answer one of them
    box = {
        "user_id": ((u_lo + u_hi) / 2, u_hi),
        "value": (v_lo, v_lo + (v_hi - v_lo) / 4),
    }

    z_path = str(tmp_path / "zorder")
    write_zordered(ev, z_path, "user_id", (u_lo, u_hi), "value", (v_lo, v_hi), n_files=8)
    z_ranges = _file_ranges(z_path, cols)

    s_path = str(tmp_path / "single")
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(s_path)
    )
    s_ranges = _file_ranges(s_path, cols)

    # layouts must be lossless
    assert (
        spark.read.parquet(z_path).count()
        == spark.read.parquet(s_path).count()
        == ev.count()
    )

    z_hit = _files_intersecting(z_ranges, box)
    s_hit = _files_intersecting(s_ranges, box)
    # user_id-sort answers the user_id half (1-2 files) but every one of
    # its files spans all values; z-order tiles BOTH dims
    assert z_hit < len(z_ranges), f"z-order never excluded a file: {z_ranges}"
    assert z_hit <= s_hit, f"z-order ({z_hit}) worse than single-sort ({s_hit})"


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    """200-way fragmented table → a handful of target-sized files,
    losslessly, and without a shuffle when unsorted (coalesce plan)."""
    from rpa_etl_spark.operators.maintenance import compact_parquet, parquet_data_size

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    frag = str(tmp_path / "fragmented")
    ev.repartition(200).write.parquet(frag)
    import glob as g

    assert len(g.glob(f"{frag}/*.parquet")) == 200
    total = parquet_data_size(frag)

    dst = str(tmp_path / "compacted")
    n_files = compact_parquet(spark, frag, dst, target_bytes=max(1, total // 4))
    assert n_files <= 8, n_files
    assert spark.read.parquet(dst).count() == ev.count()

    dst2 = str(tmp_path / "compacted_sorted")
    compact_parquet(spark, frag, dst2, target_bytes=max(1, total // 4), sort_col="user_id")
    back = spark.read.parquet(dst2)
    assert back.count() == ev.count()
    rngs = _file_ranges(dst2, ("user_id",))
    spans = [r["user_id"][1] - r["user_id"][0] for r in rngs]
    full = max(r["user_id"][1] for r in rngs) - min(r["user_id"][0] for r in rngs)
    assert min(spans) < full, "sorted compaction produced no clustering"


def test_morton_n_generalizes_morton2(spark):
    """The N-dim morton (round 12) with the same two dims and bit width
    must equal morton2 bit-for-bit; a 3-dim code stays a bounded long
    and orders distinct tiles distinctly."""
    from rpa_etl_spark.operators.zorder import morton

    df = spark.range(0, 512).select(
        ((F.col("id") * 37) % 100).alias("a"),
        ((F.col("id") * 61) % 97).alias("b"),
        ((F.col("id") * 17) % 89).alias("c"),
    )
    two = df.select(
        morton2(F.col("a"), 0, 99, F.col("b"), 0, 96).alias("m2"),
        morton([(F.col("a"), 0, 99), (F.col("b"), 0, 96)]).alias("mn"),
    )
    assert two.where("m2 != mn").count() == 0
    three = df.select(
        "a", "b", "c",
        morton(
            [(F.col("a"), 0, 99), (F.col("b"), 0, 96), (F.col("c"), 0, 88)]
        ).alias("m3"),
    )
    lo, hi, n, n_tiles = three.agg(
        F.min("m3"), F.max("m3"), F.count_distinct("m3"),
        F.count_distinct("a", "b", "c"),
    ).collect()[0]
    assert 0 <= lo <= hi < (1 << 63)
    # 21 bits/dim over <=100 values: the scaling is injective, so
    # distinct (a,b,c) tiles get distinct codes exactly
    assert n == n_tiles


def test_optimize_cluster_by_three_columns(spark, tmp_path):
    """optimize(cluster_by=[a, b, c]) — the N-dim path end-to-end: rows
    preserved, per-file spans shrink on ALL THREE columns."""
    from rpa_etl_spark.operators import tablefmt as TF

    p = str(tmp_path / "t")
    df = spark.range(0, 4096).select(
        ((F.col("id") * 2654435761) % 1024).alias("a"),
        ((F.col("id") * 40503) % 1024).alias("b"),
        ((F.col("id") * 2246822519) % 1024).alias("c"),
    )
    TF.create_table(df.repartition(8), p)
    # enough output files for the curve to cut EVERY dimension: the top
    # Morton bits alternate dims, so k files only split ~log2(k) of them
    TF.optimize(spark, p, target_bytes=2_500, cluster_by=["a", "b", "c"])
    m0 = TF._upgrade_manifest(TF.read_manifest(p, 0))
    m1 = TF._upgrade_manifest(TF.read_manifest(p, 1))
    assert len(m1["files"]) >= 12
    assert TF.snapshot_read(spark, p).count() == 4096
    for col in ("a", "b", "c"):
        before = sum(
            e["stats"][col]["max"] - e["stats"][col]["min"]
            for e in m0["files"]
        ) / len(m0["files"])
        after = sum(
            e["stats"][col]["max"] - e["stats"][col]["min"]
            for e in m1["files"]
        ) / len(m1["files"])
        assert after < 0.8 * before, (col, before, after)
