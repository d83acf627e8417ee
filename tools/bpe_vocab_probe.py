#!/usr/bin/env python
"""Measure the impact of the BPE ``top_words`` training cutoff (round-6
verdict #4): train the merge table on the sf0.1 corpus at the default
top-4096 vocabulary AND at the FULL word-frequency table, and report

- wall time of each training run (counting pass + driver merge loop),
- the full distinct-word count the cutoff drops,
- the merge-table delta (rank of first divergence, # differing rows).

Results are recorded in SCALE.md §11. Usage:

    python tools/bpe_vocab_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpa_etl_spark.operators import bpe  # noqa: E402
from rpa_etl_spark.session import get_spark  # noqa: E402
from rpa_etl_spark.tables import load  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bpe-vocab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents").select("text")

    n_distinct = bpe.word_frequencies(docs).count()
    print(f"corpus distinct words: {n_distinct}")

    results = {}
    for label, top in (("top4096", bpe.DEFAULT_TOP_WORDS), ("full", None)):
        # warm pass absorbs scan/codegen cost so the numbers compare the
        # VOCABULARY SIZE effect, not first-run compilation
        bpe.train_bpe(docs, n_merges=bpe.DEFAULT_N_MERGES, top_words=top)
        t0 = time.perf_counter()
        merges = bpe.train_bpe(docs, n_merges=bpe.DEFAULT_N_MERGES, top_words=top)
        dt = time.perf_counter() - t0
        results[label] = (merges, dt)
        print(f"{label}: {dt:.2f}s, {len(merges)} merges")

    m_top, m_full = results["top4096"][0], results["full"][0]
    first_div = next(
        (k for k, (a, b) in enumerate(zip(m_top, m_full)) if a != b),
        min(len(m_top), len(m_full)),
    )
    n_diff = sum(1 for a, b in zip(m_top, m_full) if a != b) + abs(
        len(m_top) - len(m_full)
    )
    print(f"first divergence at rank: {first_div} / {len(m_top)}")
    print(f"differing merge rows: {n_diff}")
    for k, (a, b) in enumerate(zip(m_top, m_full)):
        if a != b:
            print(f"  rank {k}: top4096={a}  full={b}")

    # -- high-cardinality stress: the synthetic corpus has ~31 distinct
    # words, so the cutoff is inactive there. Derive a corpus where it
    # BITES: append 40 doc-unique tokens per document (~200k distinct at
    # sf0.1) and measure the full-vocab path's collect + driver-loop cost
    # against top-4096. The Zipf head (the real words) still dominates
    # pair counts, so the merge TABLE should agree — the knob's price is
    # time/memory, not output.
    from pyspark.sql import functions as F

    tags = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"tok{k}x"), (F.col("doc_id") * 41 + k).cast("string"))
            for k in range(40)
        ],
    )
    wide = docs2 = load(spark, sf_dir, "documents").select(
        F.concat_ws(" ", F.col("text"), tags).alias("text")
    )
    n2 = bpe.word_frequencies(docs2).count()
    print(f"\nhigh-cardinality corpus distinct words: {n2}")
    for label, top in (("top4096", bpe.DEFAULT_TOP_WORDS), ("full", None)):
        bpe.train_bpe(wide, n_merges=bpe.DEFAULT_N_MERGES, top_words=top)
        t0 = time.perf_counter()
        merges = bpe.train_bpe(wide, n_merges=bpe.DEFAULT_N_MERGES, top_words=top)
        dt = time.perf_counter() - t0
        results[f"hc_{label}"] = (merges, dt)
        print(f"hc_{label}: {dt:.2f}s, {len(merges)} merges")
    same = results["hc_top4096"][0] == results["hc_full"][0]
    print(f"high-cardinality merge tables identical: {same}")
    spark.stop()


if __name__ == "__main__":
    main()
