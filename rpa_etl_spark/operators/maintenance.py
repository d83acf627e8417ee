"""Table-maintenance operators: small-file compaction.

Small files are the canonical silent killer of 100 TB scan performance:
every parquet file costs a task, a footer read, and a seek, so a table
written by many tiny batches (streaming foreachBatch, per-partition
appends) degrades until it is compacted. `compact_parquet` rewrites a
directory to ~target-sized files — the `OPTIMIZE` half that complements
`operators/zorder.py` (which governs ordering WITHIN the rewrite).
"""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # match maxPartitionBytes


def parquet_data_size(path: str) -> int:
    """Total bytes of parquet data files under ``path`` (driver-side
    directory listing — metadata, not data; at scale this comes from the
    table catalog / file index instead)."""
    return sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_col: str | None = None,
) -> int:
    """Rewrite the parquet directory ``src`` into ``dst`` as
    ceil(total/target) files. Returns the output file count.

    ``coalesce`` (not ``repartition``) when only merging — it avoids a
    shuffle entirely: each output task reads several input files
    sequentially. With ``sort_col`` the rewrite pays one range shuffle to
    also restore clustering (a lightweight single-column OPTIMIZE; use
    ``zorder.write_zordered`` for multi-column clustering).
    """
    df = spark.read.parquet(src)
    n_out = max(1, math.ceil(parquet_data_size(src) / target_bytes))
    if sort_col is None:
        out = df.coalesce(n_out)
    else:
        out = df.repartitionByRange(n_out, sort_col).sortWithinPartitions(sort_col)
    out.write.mode("overwrite").parquet(dst)
    return len(glob.glob(os.path.join(dst, "*.parquet")))
