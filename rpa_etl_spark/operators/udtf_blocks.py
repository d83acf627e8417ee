"""Python UDTF + grouped-pandas operators (SURVEY §2.2 UDF/UDAF/UDTF row).

The engine's doctrine is builtin-expressions-first (see functions/), but
three Python escape hatches exist for genuinely imperative shapes, each
Arrow-batched:

- ``BlockSplitUDTF``  — lateral one-row→many-rows table function: the B1
  block segmentation (parser.py:134-208) as a UDTF, emitting one row per
  (block_type, block_text). Useful when downstream wants blocks as rows,
  not struct fields.
- ``percentile_summary`` — grouped applyInPandas aggregation (UDAF shape):
  numpy percentile summary per group (exact percentiles are not a single
  builtin aggregate).
- ``running_user_state`` lives in streaming/stateful.py
  (applyInPandasWithState).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

# single source of truth — a private copy here had drifted from the
# parser's marker table, making the two block paths silently disagree
from rpa_etl_spark.functions.parsing import BLOCK_MARKERS as _MARKERS  # noqa: E402


@udtf(returnType="block_type: string, block_text: string, pos: int")
class BlockSplitUDTF:
    """Emit (block_type, block_text, pos) rows for one document text.

    Same segmentation semantics as functions/parsing.extract_blocks: blocks
    run from their marker to the next marker; the prefix is HEADER.
    """

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        hits = []
        for btype, pat in _MARKERS.items():
            m = re.search(pat, text, re.IGNORECASE)
            if m:
                hits.append((m.start(), btype))
        hits.sort()
        if not hits or hits[0][0] > 0:
            end = hits[0][0] if hits else len(text)
            yield ("HEADER", text[:end], 0)
        for i, (start, btype) in enumerate(hits):
            end = hits[i + 1][0] if i + 1 < len(hits) else len(text)
            yield (btype, text[start:end], start)


def split_blocks(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Lateral-join the UDTF over a corpus: one output row per block."""
    return df.lateralJoin(
        BlockSplitUDTF(F.col(text_col).outer())
    ).select(id_col, "block_type", "block_text", "pos")


def percentile_summary(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped applyInPandas (UDAF shape): exact p25/p50/p75/p95 per group
    via numpy — one Arrow batch per group, vectorized inside."""
    import numpy as np

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].to_numpy()
        p25, p50, p75, p95 = np.percentile(v, [25, 50, 75, 95])
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [len(v)],
                "p25": [p25],
                "p50": [p50],
                "p75": [p75],
                "p95": [p95],
            }
        )

    # group column keeps its actual type — a hardcoded string here broke
    # every non-string grouping key at Arrow serialization time
    group_type = df.schema[group_col].dataType.simpleString()
    schema = (
        f"{group_col} {group_type}, n long, p25 double, p50 double, "
        "p75 double, p95 double"
    )
    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(summarize, schema)
