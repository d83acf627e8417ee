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


def test_date_keyword_literal_canonicalizes():
    e = _e({"d": {"nulls": 0, "min": "2020-01-01", "max": "2020-06-30",
                  "t": "date"}})
    assert FS.can_match(FS.compile_predicate("d >= DATE '2020-07-01'"), e) is False
    assert FS.can_match(FS.compile_predicate("d >= '2020-06-01'"), e) is True
    # non-padded literals canonicalize (Spark parses DATE '2020-1-5' as
    # 2020-01-05; raw-text lexicographic compare pruned matching files —
    # round-12 ADVICE #1)
    assert FS.can_match(FS.compile_predicate("d >= DATE '2020-1-5'"), e) is True
    assert FS.can_match(FS.compile_predicate("d < DATE '2020-1-2'"), e) is True
    assert FS.can_match(FS.compile_predicate("d > DATE '2020-7-1'"), e) is False
    # string literals cast like Spark casts string->date
    assert FS.can_match(FS.compile_predicate("d >= '2020-7-1'"), e) is False
    # an unparseable DATE literal disables pruning (kept), never a
    # wrong textual compare
    assert FS.compile_predicate("d >= DATE 'not-a-date'") is None
    # LEGACY manifests stored date bounds as untagged ISO strings; a
    # typed literal against them is conservatively unknown (kept)
    legacy = _e({"d": {"nulls": 0, "min": "2020-01-01", "max": "2020-06-30"}})
    assert FS.can_match(
        FS.compile_predicate("d >= DATE '2020-07-01'"), legacy
    ) is True


def test_timestamp_literal_prunes_epoch_micros_stats():
    # 2024-01-10T00:00Z .. 2024-01-20T00:00Z in epoch micros
    lo, hi = 1704844800000000, 1705708800000000
    e = _e({"ts": {"nulls": 0, "min": lo, "max": hi, "t": "ts"}})
    km = lambda p: FS.can_match(FS.compile_predicate(p), e)  # noqa: E731
    assert km("ts >= TIMESTAMP '2024-01-21 00:00:00'") is False
    assert km("ts >= TIMESTAMP '2024-01-15 00:00:00'") is True
    assert km("ts < TIMESTAMP '2024-01-10 00:00:00'") is False
    assert km("ts < TIMESTAMP '2024-01-10 00:00:00.000001'") is True
    assert km("ts BETWEEN TIMESTAMP '2024-1-2' AND TIMESTAMP '2024-1-9'") is False
    # explicit offsets shift the instant
    assert km("ts < TIMESTAMP '2024-01-10 01:00:00+01:00'") is False
    assert km("ts < TIMESTAMP '2024-01-10 01:00:00+00:59'") is True
    # plain strings cast like Spark casts string->timestamp
    assert km("ts > '2024-01-20'") is False
    assert km("ts > '2024-01-19 23:59:59'") is True
    # DATE literal casts up to timestamp-at-midnight
    assert km("ts >= DATE '2024-01-21'") is False
    assert km("ts >= DATE '2024-01-20'") is True
    # int/double literals carry no sound timestamp constraint
    assert km("ts > 9999999999999999") is True
    # wall-clock (NTZ) stats reject offset-bearing literals
    en = _e({"ts": {"nulls": 0, "min": lo, "max": hi, "t": "tsn"}})
    assert FS.can_match(
        FS.compile_predicate("ts >= TIMESTAMP '2024-01-21 00:00:00'"), en
    ) is False
    assert FS.can_match(
        FS.compile_predicate("ts >= TIMESTAMP '2024-01-21 00:00:00+05:00'"), en
    ) is True  # unknown -> kept


def test_decimal_stats_compare_exactly():
    e = _e({"amt": {"nulls": 0, "min": "-5.00", "max": "120.50", "t": "dec"}})
    km = lambda p: FS.can_match(FS.compile_predicate(p), e)  # noqa: E731
    assert km("amt > 120.50") is False
    assert km("amt >= 120.50") is True
    assert km("amt < -5") is False
    assert km("amt <= -5.0") is True
    assert km("amt = 0.1") is True
    assert km("amt IN (121.00, -6.00)") is False
    # exponent literals are doubles: comparison runs in doubles (Spark's
    # coercion) — still sound on bounds
    assert km("amt > 1.2050e2") is False
    assert km("amt >= 1.2050e2") is True
    # strings don't compare against decimals (unknown -> kept)
    assert km("amt = 'x'") is True


def test_fractional_literal_is_exact_decimal_vs_float_stats():
    # a double column whose max is the DOUBLE nearest 0.1 (slightly
    # above the exact decimal 0.1): Spark compares doubles, so x <= 0.1
    # IS satisfiable — exact-decimal comparison would wrongly prune
    e = _e({"x": {"nulls": 0, "min": 0.1, "max": 0.1}})
    assert FS.can_match(FS.compile_predicate("x <= 0.1"), e) is True
    assert FS.can_match(FS.compile_predicate("x >= 0.1"), e) is True
    # int stats + decimal literal compare exactly
    e2 = _e({"n": {"nulls": 0, "min": 0, "max": 10}})
    assert FS.can_match(FS.compile_predicate("n > 9.5"), e2) is True
    assert FS.can_match(FS.compile_predicate("n > 10.5"), e2) is False


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
        F.col("id").cast("decimal(30,2)").alias("dec_wide"),
        F.array(F.col("id")).alias("arr"),
        F.to_date(F.lit("2021-03-04")).alias("d"),
        F.to_timestamp(
            F.lit("2024-01-10 12:00:00") , "yyyy-MM-dd HH:mm:ss"
        ).alias("ts"),
    )
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(p)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    import glob

    f = glob.glob(p + "/part-*.parquet")[0]
    rec = FS.collect_file_stats(f)
    assert rec["rows"] == 100
    st = rec["stats"]
    assert st["id"] == {"nulls": 0, "min": 0, "max": 99}
    assert st["v"] == {"nulls": 0, "min": 0.0, "max": 9.0}
    assert st["s"] == {"nulls": 0, "min": "k000", "max": "k099"}
    assert st["nul"] == {"nulls": 100}
    assert st["d"] == {"nulls": 0, "min": "2021-03-04", "max": "2021-03-04",
                       "t": "date"}
    # decimals: exact decimal strings (int64-backed AND fixed-len-byte-
    # array physical encodings), round-12 verdict #1
    assert st["dec"] == {"nulls": 0, "min": "0.00", "max": "99.00",
                         "t": "dec"}
    assert st["dec_wide"] == {"nulls": 0, "min": "0.00", "max": "99.00",
                              "t": "dec"}
    # timestamps: epoch micros (written as TIMESTAMP_MICROS; session tz
    # is UTC in tests so the wall time IS the instant)
    assert st["ts"] == {"nulls": 0, "min": 1704888000000000,
                        "max": 1704888000000000, "t": "ts"}
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
        # typed columns (round-12 verdict #1): one hour per id, one day
        # per 30 ids, exact cents
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(hours=F.col("id"))).alias("ts"),
        F.date_add(F.to_date(F.lit("2024-01-01")), (F.col("id") / 30)
                   .cast("int")).alias("d"),
        (F.col("id").cast("decimal(12,2)") / F.lit(4)
         ).cast("decimal(12,2)").alias("amt"),
    )
    TF.create_table(df.repartitionByRange(6, "id"), p)
    predicates = [
        "ts < TIMESTAMP '2024-01-03 00:00:00'",
        "ts >= TIMESTAMP '2024-1-20 11:0:0'",
        "ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-06 12:30:00'",
        "ts > TIMESTAMP '2024-02-01 00:00:00'",
        "ts <= '2024-01-02 05:00:00'",
        "ts >= DATE '2024-01-25'",
        "d = DATE '2024-01-05'",
        "d < DATE '2024-1-3'",
        "d >= '2024-01-18'",
        "d IN (DATE '2024-01-02', DATE '2024-03-01')",
        "amt < 10.00", "amt >= 149.75", "amt = 25.25", "amt > 1.0e6",
        "amt BETWEEN 30 AND 31",
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
    # effectiveness, not just soundness: on the id-clustered table a
    # selective range on EVERY typed column must skip files
    for pred in (
        "ts < TIMESTAMP '2024-01-03 00:00:00'",
        "d = DATE '2024-01-05'",
        "amt < 10.00",
        "id < 100",
    ):
        opened, total = TF.pruned_file_counts(p, where=pred)
        assert total == 6 and opened < total, (pred, opened, total)


# ---------------------------------------------------------------------------
# soundness fuzz: can_match vs ground truth on generated rows/predicates
# ---------------------------------------------------------------------------


import calendar as _cal
import datetime as _dtm


import decimal as _dec


def _enc(v):
    """Stats encoding of one generated value: ints raw, dates ISO,
    datetimes epoch micros, decimals exact strings — exactly what
    collect_file_stats writes."""
    if isinstance(v, _dtm.datetime):
        return _cal.timegm(v.timetuple()) * 10**6 + v.microsecond
    if isinstance(v, _dtm.date):
        return v.isoformat()
    if isinstance(v, _dec.Decimal):
        return str(v)
    return v


def _stats_of(rows, cols=("a", "b")):
    """Footer-faithful stats for generated rows: min/max over non-null
    values (typed encodings + tags), null counts — exactly what
    collect_file_stats derives from a parquet footer."""
    out = {}
    for col in cols:
        vals = [r[col] for r in rows if r[col] is not None]
        rec = {"nulls": sum(1 for r in rows if r[col] is None)}
        if vals:
            rec["min"] = _enc(min(vals))
            rec["max"] = _enc(max(vals))
            if isinstance(vals[0], _dtm.datetime):
                rec["t"] = "ts"
            elif isinstance(vals[0], _dtm.date):
                rec["t"] = "date"
            elif isinstance(vals[0], _dec.Decimal):
                rec["t"] = "dec"
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


def _render_lit(v):
    """SQL text of a generated literal — dates/timestamps render as
    NON-PADDED typed literals (Spark accepts them; the round-12 ADVICE
    bug was exactly a non-padded literal compared as raw text)."""
    if isinstance(v, _dtm.datetime):
        return (f"TIMESTAMP '{v.year}-{v.month}-{v.day} "
                f"{v.hour}:{v.minute:02d}:{v.second:02d}'")
    if isinstance(v, _dtm.date):
        return f"DATE '{v.year}-{v.month}-{v.day}'"
    return str(v)


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
        return f"{node[1]} IN ({', '.join(_render_lit(v) for v in node[2])})"
    return f"{node[1]} {node[2]} {_render_lit(node[3])}"


def test_can_match_soundness_fuzz():
    """For random row sets and random predicates over the full grammar:
    whenever ANY row satisfies the predicate, the file MUST be kept
    (wrong skips are the only corruption mode; over-keeping is just
    slower). Pure Python — no Spark in the loop."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ival = st.one_of(st.none(), st.integers(-5, 15))
    dval = st.one_of(
        st.none(),
        st.integers(0, 40).map(
            lambda n: _dtm.date(2020, 1, 1) + _dtm.timedelta(days=n)
        ),
    )
    tval = st.one_of(
        st.none(),
        st.integers(0, 3000).map(
            lambda n: _dtm.datetime(2020, 1, 1) + _dtm.timedelta(minutes=n)
        ),
    )
    mval = st.one_of(
        st.none(),
        st.integers(-40, 60).map(
            lambda n: _dec.Decimal(n * 25).scaleb(-2)  # exact quarters
        ),
    )
    rows = st.lists(
        st.fixed_dictionaries({"a": ival, "b": ival, "d": dval, "t": tval,
                               "m": mval}),
        min_size=0, max_size=12,
    )
    ilit = st.integers(-6, 16)
    dlit = st.integers(-2, 42).map(
        lambda n: _dtm.date(2020, 1, 1) + _dtm.timedelta(days=n)
    )
    tlit = st.integers(-60, 3060).map(
        lambda n: _dtm.datetime(2020, 1, 1) + _dtm.timedelta(minutes=n)
    )
    mlit = st.one_of(
        st.integers(-44, 64).map(lambda n: _dec.Decimal(n * 25).scaleb(-2)),
        st.integers(-11, 16),  # whole-number literals against decimals
    )
    ops = st.sampled_from(["<", "<=", ">", ">=", "=", "!="])

    def leaves(col, lit):
        return st.one_of(
            st.tuples(st.just("cmp"), st.just(col), ops, lit),
            st.tuples(st.just("in"), st.just(col),
                      st.lists(lit, min_size=1, max_size=3)),
            st.tuples(st.just("isnull"), st.just(col)),
            st.tuples(st.just("notnull"), st.just(col)),
        )

    leaf = st.one_of(
        leaves("a", ilit), leaves("b", ilit),
        leaves("d", dlit), leaves("t", tlit), leaves("m", mlit),
    )
    node = st.recursive(
        leaf,
        lambda inner: st.one_of(
            st.tuples(st.sampled_from(["and", "or"]), inner, inner),
            st.tuples(st.just("not"), inner),
        ),
        max_leaves=6,
    )

    @settings(max_examples=500, deadline=None, derandomize=True)
    @given(rows, node)
    def run(rs, nd):
        sql = _render(nd)
        compiled = FS.compile_predicate(sql)
        assert compiled is not None, sql
        entry = _stats_of(rs, cols=("a", "b", "d", "t", "m"))
        any_true = any(_truth(nd, r) is True for r in rs)
        keeps = FS.can_match(compiled, entry)
        if any_true:
            assert keeps, (sql, rs, entry)

    run()
