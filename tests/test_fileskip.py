"""Per-file stats + manifest-level file skipping (operators/fileskip.py).

Round-11 verdict #1. The predicate compiler/evaluator is pure Python —
most cases run without Spark; the footer-stats collection and the
end-to-end pruning gates live in test_tablefmt.py.
"""

from __future__ import annotations

import pytest

from rpa_etl_spark.operators import fileskip as FS


def _e(stats, rows=100):
    return {"path": "x.parquet", "rows": rows, "stats": stats}


ID_0_49 = _e({"id": {"nulls": 0, "min": 0, "max": 49}})
ID_50_99 = _e({"id": {"nulls": 0, "min": 50, "max": 99}})


@pytest.mark.parametrize(
    "pred,keep_first,keep_second",
    [
        ("id < 10", True, False),
        ("id <= 49", True, False),
        ("id > 49", False, True),
        ("id >= 50", False, True),
        ("id = 75", False, True),
        ("id == 75", False, True),
        ("10 > id", True, False),  # literal-first mirrors
        ("75 = id", False, True),
        ("id != 0", True, True),
        ("id BETWEEN 40 AND 60", True, True),
        ("id BETWEEN 60 AND 70", False, True),
        ("id IN (5, 150)", True, False),
        ("id IN (150)", False, False),
        ("id < 10 OR id > 90", True, True),
        ("id < 10 AND id > 90", False, False),
        ("id >= 10 AND id < 20", True, False),
    ],
)
def test_interval_pruning_comparisons(pred, keep_first, keep_second):
    c = FS.compile_predicate(pred)
    assert c is not None, pred
    assert FS.can_match(c, ID_0_49) is keep_first, pred
    assert FS.can_match(c, ID_50_99) is keep_second, pred


def test_equality_on_constant_file_and_not_equal():
    const = _e({"id": {"nulls": 0, "min": 7, "max": 7}})
    assert FS.can_match(FS.compile_predicate("id != 7"), const) is False
    assert FS.can_match(FS.compile_predicate("id <> 7"), const) is False
    assert FS.can_match(FS.compile_predicate("id = 7"), const) is True


def test_null_predicates_use_null_counts():
    some_null = _e({"v": {"nulls": 3, "min": 1, "max": 9}}, rows=10)
    no_null = _e({"v": {"nulls": 0, "min": 1, "max": 9}}, rows=10)
    all_null = _e({"v": {"nulls": 10}}, rows=10)
    isnull = FS.compile_predicate("v IS NULL")
    notnull = FS.compile_predicate("v IS NOT NULL")
    assert FS.can_match(isnull, some_null) is True
    assert FS.can_match(isnull, no_null) is False
    assert FS.can_match(isnull, all_null) is True
    assert FS.can_match(notnull, all_null) is False
    assert FS.can_match(notnull, some_null) is True
    # comparisons can never be TRUE on an all-null column (SQL 3VL)
    assert FS.can_match(FS.compile_predicate("v = 5"), all_null) is False
    assert FS.can_match(FS.compile_predicate("v < 5"), all_null) is False


def test_strings_and_quoted_literals():
    e = _e({"lang": {"nulls": 0, "min": "de", "max": "it"}})
    assert FS.can_match(FS.compile_predicate("lang = 'en'"), e) is True
    assert FS.can_match(FS.compile_predicate("lang = 'pt'"), e) is False
    assert FS.can_match(FS.compile_predicate("lang IN ('pt', 'ru')"), e) is False
    assert FS.can_match(FS.compile_predicate("lang >= 'iu'"), e) is False
    # '' escape inside string literal
    c = FS.compile_predicate("lang = 'it''s'")
    assert c == ("cmp", "lang", "=", "it's")


def test_date_keyword_literal_orders_as_iso_string():
    e = _e({"d": {"nulls": 0, "min": "2020-01-01", "max": "2020-06-30"}})
    assert FS.can_match(FS.compile_predicate("d >= DATE '2020-07-01'"), e) is False
    assert FS.can_match(FS.compile_predicate("d >= '2020-06-01'"), e) is True


def test_unknowns_keep_the_file():
    e = ID_0_49
    # unsupported constructs compile to None -> no pruning at all
    for pred in (
        "abs(id) < 10",          # function call
        "id + 1 < 10",           # arithmetic
        "id < other_col",        # column-to-column
        "id ->> 'k' = 1",        # untokenizable operator
    ):
        assert FS.compile_predicate(pred) is None, pred
        assert FS.prune_entries([e], pred) == [e]
    # NOT pushes into comparisons exactly (De Morgan / operator flip)...
    assert FS.compile_predicate("NOT id < 10") == ("cmp", "id", ">=", 10)
    assert FS.can_match(FS.compile_predicate("NOT id >= 0"), ID_0_49) is False
    assert FS.can_match(
        FS.compile_predicate("NOT (id < 10 OR id > 40)"), ID_50_99
    ) is False
    assert FS.compile_predicate("NOT v IS NULL") == ("notnull", "v")
    # ...but NOT IN stays conservative (bounds can't refute inequality
    # against every element) — kept, never a wrong skip
    c = FS.compile_predicate("NOT id IN (60, 70)")
    assert c == ("not", ("in", "id", [60, 70]))
    assert FS.can_match(c, ID_50_99) is True
    # missing column stats keep the file
    c = FS.compile_predicate("nope < 0")
    assert FS.can_match(c, e) is True
    # type-mismatched literal keeps the file
    c = FS.compile_predicate("id = 'abc'")
    assert FS.can_match(c, e) is True
    # entry without stats at all (legacy manifests) keeps the file
    assert FS.can_match(FS.compile_predicate("id < 0"), {"path": "y"}) is True


def test_prune_entries_is_exact_filter():
    pred = "id >= 10 AND id < 20"
    kept = FS.prune_entries([ID_0_49, ID_50_99], pred)
    assert kept == [ID_0_49]
    assert FS.prune_entries([ID_0_49, ID_50_99], None) == [ID_0_49, ID_50_99]


def test_collect_file_stats_from_footer(spark, tmp_path):
    """Footer-only stats: scalar columns bounded, all-null column keeps
    nulls without bounds, unsupported types (decimal/timestamp/array)
    simply absent — never an error."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "f.parquet")
    df = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 10).cast("double").alias("v"),
        F.concat(F.lit("k"), F.format_string("%03d", F.col("id"))).alias("s"),
        F.lit(None).cast("string").alias("nul"),
        F.col("id").cast("decimal(10,2)").alias("dec"),
        F.array(F.col("id")).alias("arr"),
        F.to_date(F.lit("2021-03-04")).alias("d"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(p)
    import glob

    f = glob.glob(p + "/part-*.parquet")[0]
    rec = FS.collect_file_stats(f)
    assert rec["rows"] == 100
    st = rec["stats"]
    assert st["id"] == {"nulls": 0, "min": 0, "max": 99}
    assert st["v"] == {"nulls": 0, "min": 0.0, "max": 9.0}
    assert st["s"] == {"nulls": 0, "min": "k000", "max": "k099"}
    assert st["nul"] == {"nulls": 100}
    assert st["d"] == {"nulls": 0, "min": "2021-03-04", "max": "2021-03-04"}
    assert "arr" not in st  # nested leaf paths are skipped
    # stats must round-trip JSON exactly (they live in manifests)
    import json

    assert json.loads(json.dumps(rec)) == rec


def test_pruned_read_equals_full_read_predicate_matrix(spark, tmp_path):
    """Soundness sweep: over one clustered table with nulls and three
    stat types, EVERY predicate in a grammar-covering matrix must give
    the pruned read exactly the full-scan-filter rows (a wrong skip
    would drop rows; over-keeping is invisible here and allowed)."""
    from pyspark.sql import functions as F

    from rpa_etl_spark.operators import tablefmt as TF

    p = str(tmp_path / "t")
    df = spark.range(0, 600).select(
        F.col("id"),
        F.when(F.col("id") % 7 != 0, (F.col("id") % 50).cast("double"))
        .alias("v"),  # ~14% nulls
        F.concat(F.lit("s"), F.format_string("%03d", F.col("id") % 40))
        .alias("s"),
    )
    TF.create_table(df.repartitionByRange(6, "id"), p)
    predicates = [
        "id < 100", "id <= 99", "id > 550", "id >= 550", "id = 300",
        "id != 300", "id <> 0", "250 > id", "599 = id",
        "id BETWEEN 90 AND 110", "id BETWEEN 700 AND 800",
        "id IN (5, 305, 9999)", "id IN (9999)",
        "v IS NULL", "v IS NOT NULL", "v < 10", "v >= 49.0", "v = 25.0",
        "s = 's005'", "s >= 's039'", "s < 's001'", "s IN ('s000', 'zz')",
        "id < 50 AND v IS NULL", "id < 50 OR id > 580",
        "id < 100 AND v < 5 AND s < 's010'",
        "(id < 100 OR id > 500) AND v IS NOT NULL",
        "NOT id < 100",              # NOT pushed: id >= 100
        "NOT (id < 100 OR v IS NULL)",
        "NOT id IN (5, 700)",        # conservative unknown
        "id % 7 = 0",                # unparseable: falls back, still exact
        "v + 1 < 10",
        "id < 0", "id >= 600",       # all-pruned
    ]
    for pred in predicates:
        got = sorted(
            (r["id"],)
            for r in TF.snapshot_read(spark, p, where=pred).collect()
        )
        want = sorted(
            (r["id"],)
            for r in TF.snapshot_read(spark, p).where(pred).collect()
        )
        assert got == want, pred


# ---------------------------------------------------------------------------
# soundness fuzz: can_match vs ground truth on generated rows/predicates
# ---------------------------------------------------------------------------


def _stats_of(rows):
    """Footer-faithful stats for generated (a, b) rows: min/max over
    non-null values, null counts — exactly what collect_file_stats
    derives from a parquet footer."""
    out = {}
    for col in ("a", "b"):
        vals = [r[col] for r in rows if r[col] is not None]
        rec = {"nulls": sum(1 for r in rows if r[col] is None)}
        if vals:
            rec["min"] = min(vals)
            rec["max"] = max(vals)
        out[col] = rec
    return {"path": "f", "rows": len(rows), "stats": out}


def _truth(node, row):
    """SQL-3VL evaluation of a prunable AST on one row: True/False/None."""
    kind = node[0]
    if kind in ("and", "or"):
        a, b = _truth(node[1], row), _truth(node[2], row)
        if kind == "and":
            if a is False or b is False:
                return False
            return None if (a is None or b is None) else True
        if a is True or b is True:
            return True
        return None if (a is None or b is None) else False
    if kind == "not":
        t = _truth(node[1], row)
        return None if t is None else (not t)
    col = node[1]
    v = row[col]
    if kind == "isnull":
        return v is None
    if kind == "notnull":
        return v is not None
    if v is None:
        return None  # comparisons/IN over NULL are NULL
    if kind == "in":
        return v in node[2]
    op, lit = node[2], node[3]
    return {
        "<": v < lit, "<=": v <= lit, ">": v > lit, ">=": v >= lit,
        "=": v == lit, "==": v == lit, "!=": v != lit, "<>": v != lit,
    }[op]


def _render(node):
    """AST -> SQL text, so the fuzz exercises the REAL pipeline
    (tokenizer + parser + NOT pushdown), not hand-built trees."""
    kind = node[0]
    if kind in ("and", "or"):
        return f"({_render(node[1])} {kind.upper()} {_render(node[2])})"
    if kind == "not":
        return f"NOT ({_render(node[1])})"
    if kind == "isnull":
        return f"{node[1]} IS NULL"
    if kind == "notnull":
        return f"{node[1]} IS NOT NULL"
    if kind == "in":
        return f"{node[1]} IN ({', '.join(str(v) for v in node[2])})"
    return f"{node[1]} {node[2]} {node[3]}"


def test_can_match_soundness_fuzz():
    """For random row sets and random predicates over the full grammar:
    whenever ANY row satisfies the predicate, the file MUST be kept
    (wrong skips are the only corruption mode; over-keeping is just
    slower). Pure Python — no Spark in the loop."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    val = st.one_of(st.none(), st.integers(-5, 15))
    rows = st.lists(
        st.fixed_dictionaries({"a": val, "b": val}), min_size=0, max_size=12
    )
    lit = st.integers(-6, 16)
    col = st.sampled_from(["a", "b"])
    leaf = st.one_of(
        st.tuples(st.just("cmp"), col,
                  st.sampled_from(["<", "<=", ">", ">=", "=", "!="]), lit),
        st.tuples(st.just("in"), col,
                  st.lists(lit, min_size=1, max_size=3)),
        st.tuples(st.just("isnull"), col),
        st.tuples(st.just("notnull"), col),
    )
    node = st.recursive(
        leaf,
        lambda inner: st.one_of(
            st.tuples(st.sampled_from(["and", "or"]), inner, inner),
            st.tuples(st.just("not"), inner),
        ),
        max_leaves=6,
    )

    @settings(max_examples=400, deadline=None, derandomize=True)
    @given(rows, node)
    def run(rs, nd):
        sql = _render(nd)
        compiled = FS.compile_predicate(sql)
        assert compiled is not None, sql
        entry = _stats_of(rs)
        any_true = any(_truth(nd, r) is True for r in rs)
        keeps = FS.can_match(compiled, entry)
        if any_true:
            assert keeps, (sql, rs, entry)

    run()
