#!/usr/bin/env python
"""Generate a LARGER scale factor of the synthetic test schema with REAL
(fresh-key, fresh-text) distributions — not key-shifted replication.

Round-10 verdict ask #7: the scaling story rested on 5x replication of
sf0.1, which §10c showed can distort per-operator WORK (replicated
identical texts quintuple dedup cliques). This generator extrapolates
the sf0.1 data instead, with every distribution FITTED to the measured
sf0.1 profile (documented inline): fresh orderkeys/custkeys, fresh
document texts from the same 31-word vocabulary, fresh embeddings —
so cardinalities, skew, and value ranges scale the way a real corpus
does. Dimension tables (region/nation/part/supplier) are copied
unchanged, matching the probe's replication protocol.

Output is written OUTSIDE the read-only /root/testdata tree (default:
<repo>/spark-warehouse/sf1). numpy + pyarrow only — one pass, no Spark.

Usage: python tools/gen_sf.py [--sf 1.0] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
BASE_SF = 0.1

# measured sf0.1 profile (tools/gen_sf.py provenance — see SCALE.md §10d):
# orders 150k, customers 15k, lineitem = Poisson(4) lines/order,
# events 100k over 30 days with 1.5k users, documents 5k x U(10,100)
# words from a 31-word vocab, embeddings 2k unit vectors, labels U(0,9)
VOCAB = (
    "spark window merge table column vector stream value key group query "
    "the scan order sort hash line part batch filter customer small fast "
    "slow agg join a row data index shuffle"
).split()
assert len(set(VOCAB)) == len(VOCAB) == 31  # the measured distinct count

LANGS = ["en", "fr", "es", "de", "zh"]
LANG_P = [0.41, 0.15, 0.15, 0.14, 0.15]

DAY_US = 86_400_000_000


def _ts_array(us: np.ndarray) -> pa.Array:
    return pa.Array.from_pandas(us.astype("datetime64[us]"))


def generate(out: str, sf: float, seed: int = 43) -> None:
    k = sf / BASE_SF
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    n_cust = int(15_000 * k)
    n_orders = int(150_000 * k)
    n_events = int(100_000 * k)
    n_docs = int(5_000 * k)
    n_vecs = int(2_000 * k)
    n_users = int(1_500 * k)

    # customer: acctbal U(-1000, 10000), nationkey U(0,24), 5 segments
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
    pq.write_table(
        pa.table(
            {
                "c_custkey": np.arange(n_cust, dtype=np.int64),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": segs[rng.integers(0, 5, n_cust)],
            }
        ),
        f"{out}/customer.parquet",
    )

    # orders: status/priority uniform, totalprice U(1000, 500000),
    # orderdate uniform 1995-01-01 .. 2001-08-01
    d0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    d1 = np.datetime64("2001-08-01", "us").astype(np.int64)
    statuses = np.array(["O", "P", "F"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    odate_us = (rng.integers(d0 // DAY_US, d1 // DAY_US + 1, n_orders) * DAY_US)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": np.arange(n_orders, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, n_orders, dtype=np.int64),
                "o_orderstatus": statuses[rng.integers(0, 3, n_orders)],
                "o_totalprice": np.round(rng.uniform(1000, 500_000, n_orders), 2),
                "o_orderdate": _ts_array(odate_us),
                "o_orderpriority": prios[rng.integers(0, 5, n_orders)],
            }
        ),
        f"{out}/orders.parquet",
    )

    # lineitem: Poisson(4) lines per order (zeros allowed), linenumber
    # U(1,7), qty U{1..50}, price U(900, 105000) independent of qty,
    # discount 11 steps of 0.01, tax 9 steps of 0.01, shipdate uniform
    # over its own 1995-2001 range, flags uniform
    lines_per = rng.poisson(4.0, n_orders)
    l_orderkey = np.repeat(np.arange(n_orders, dtype=np.int64), lines_per)
    n_li = len(l_orderkey)
    flags = np.array(["A", "N", "R"])
    lstat = np.array(["F", "O"])
    sdate_us = (rng.integers(d0 // DAY_US, d1 // DAY_US + 96, n_li) * DAY_US)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": l_orderkey,
                "l_partkey": rng.integers(0, 20_000, n_li, dtype=np.int64),
                "l_suppkey": rng.integers(0, 1_000, n_li, dtype=np.int64),
                "l_linenumber": rng.integers(1, 8, n_li, dtype=np.int32),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
                "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
                "l_returnflag": flags[rng.integers(0, 3, n_li)],
                "l_linestatus": lstat[rng.integers(0, 2, n_li)],
                "l_shipdate": _ts_array(sdate_us),
            }
        ),
        f"{out}/lineitem.parquet",
    )

    # events: 30 days of 2024-01, value ~ Exp(mean 50), 5 types uniform
    e0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    etypes = np.array(["signup", "click", "purchase", "error", "view"])
    ev_us = rng.integers(e0, e0 + 30 * DAY_US, n_events)
    pq.write_table(
        pa.table(
            {
                "event_id": np.arange(n_events, dtype=np.int64),
                "ts": _ts_array(ev_us),
                "user_id": rng.integers(0, n_users, n_events, dtype=np.int64),
                "event_type": etypes[rng.integers(0, 5, n_events)],
                "value": np.round(rng.exponential(50.0, n_events), 2),
                "props": [f'{{"k": {v}}}' for v in rng.integers(0, 100, n_events)],
            }
        ),
        f"{out}/events.parquet",
    )

    # documents: U(10,100) words from the 31-word vocab (uniform — the
    # measured top-word counts are flat), lang weights ~ measured,
    # sources src0..src19; FRESH texts, so exact-dup cliques don't grow
    # with sf (the property replication destroys, §10c)
    n_words = rng.integers(10, 101, n_docs)
    vocab = np.array(VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), w)]) for w in n_words
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": np.arange(n_docs, dtype=np.int64),
                "text": texts,
                "lang": np.array(LANGS)[rng.choice(5, n_docs, p=LANG_P)],
                "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_docs)],
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
        ),
        f"{out}/documents.parquet",
    )

    # embeddings: unit-normalized 64-dim gaussians, label U(0,9)
    emb = rng.normal(size=(n_vecs, 64))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.arange(n_vecs, dtype=np.int64),
                "embedding": pa.array(
                    list(emb.astype(np.float32)), type=pa.list_(pa.float32())
                ),
                "label": rng.integers(0, 10, n_vecs, dtype=np.int32),
            }
        ),
        f"{out}/embeddings.parquet",
    )

    for dim in ("region", "nation", "part", "supplier"):
        shutil.copyfile(f"{BASE}/{dim}.parquet", f"{out}/{dim}.parquet")

    print(
        json.dumps(
            {
                "out": out,
                "sf": sf,
                "rows": {
                    "customer": n_cust,
                    "orders": n_orders,
                    "lineitem": n_li,
                    "events": n_events,
                    "documents": n_docs,
                    "embeddings": n_vecs,
                },
            }
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = args.out or os.path.join(repo, "spark-warehouse", f"sf{args.sf:g}")
    generate(out, args.sf)
