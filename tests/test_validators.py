"""Validator unit tests — fixtures from the reference's documented test cases
(tests/unit/test_validators.py semantics) plus independently computed DVs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rpa_etl_spark.functions import validators as V


def _one(spark, col, value):
    return (
        spark.createDataFrame([(value,)], "s string")
        .select(col(F.col("s")).alias("out"))
        .collect()[0]["out"]
    )


def _py_cnpj_dvs(base12: str) -> str:
    """Independent python mod-11 (public CNPJ spec) for fixture generation."""
    def dv(digs, weights):
        r = sum(int(d) * w for d, w in zip(digs, weights)) % 11
        return 0 if r < 2 else 11 - r
    d1 = dv(base12, [5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2])
    d2 = dv(base12 + str(d1), [6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2])
    return f"{base12}{d1}{d2}"


@pytest.mark.parametrize(
    "cnpj,expected",
    [
        ("04.252.011/0001-10", True),   # reference golden fixture
        ("11.222.333/0001-81", True),
        ("11111111111111", False),      # repeated digits
        ("04.252.011/0001-11", False),  # wrong DV
        ("123", False),                 # too short
        ("", False),
    ],
)
def test_cnpj_is_valid(spark, cnpj, expected):
    assert _one(spark, V.cnpj_is_valid, cnpj) is expected


def test_cnpj_generated_dvs_validate(spark):
    for base in ["042520110001", "112223330001", "999888770002"]:
        assert _one(spark, V.cnpj_is_valid, _py_cnpj_dvs(base)) is True


def _py_nfe_dv(key43: str) -> int:
    weights = [2 + ((43 - i - 1) % 8) for i in range(43)]
    r = sum(int(d) * w for d, w in zip(key43, weights)) % 11
    return 0 if r <= 1 else 11 - r


def test_nfe_key_valid_roundtrip(spark):
    key43 = "35" + "2412" + "04252011000110" + "55" + "001" + "000000001" + "1" + "12345678"
    assert len(key43) == 43
    good = key43 + str(_py_nfe_dv(key43))
    bad = key43 + str((_py_nfe_dv(key43) + 1) % 10)
    assert _one(spark, V.nfe_key_is_valid, good) is True
    assert _one(spark, V.nfe_key_is_valid, bad) is False
    # bad UF
    key_baduf = "99" + key43[2:]
    assert _one(spark, V.nfe_key_is_valid, key_baduf + str(_py_nfe_dv(key_baduf))) is False
    # modelo not in {55,65}
    key_badmod = key43[:20] + "99" + key43[22:]
    assert _one(spark, V.nfe_key_is_valid, key_badmod + str(_py_nfe_dv(key_badmod))) is False


@pytest.mark.parametrize(
    "raw,valid,value",
    [
        ("R$ 1.500,00", True, 1500.00),
        ("R$ 4.450,00", True, 4450.00),     # reference golden total
        ("US$ 1,500.00", True, 1500.00),
        ("1500", True, 1500.00),
        ("R$ 1.500,123", False, None),      # 3 dp
        ("R$ -10,00", False, None),         # negative
        ("9999999999999", False, None),     # > 1e9
        ("abc", False, None),
    ],
)
def test_money_parse(spark, raw, valid, value):
    assert _one(spark, V.money_is_valid, raw) is valid
    got = _one(spark, lambda c: V.money_parse(c).cast("double"), raw)
    assert got == value


def test_money_format_br(spark):
    assert _one(spark, lambda c: V.money_format_br(V.money_parse(c)), "US$ 1,234.56") == "1.234,56"


@pytest.mark.parametrize(
    "raw,cur",
    [("R$ 10,00", "BRL"), ("US$ 5.00", "USD"), ("€ 7", "EUR"), ("10,00", "BRL"), ("£3", "GBP")],
)
def test_currency_detect(spark, raw, cur):
    assert _one(spark, V.currency_detect, raw) == cur


def test_numpy_kernels_agree_with_expressions(spark):
    """The vectorized digit-validator kernels must agree with the
    authoritative expression forms on valid keys, corrupted check digits,
    wrong lengths, formatted inputs, and garbage."""
    from pyspark.sql import functions as F

    from rpa_etl_spark.functions import validators as V

    cases = [
        "04.252.011/0001-10",   # valid CNPJ, formatted
        "04252011000110",       # valid CNPJ, bare
        "04252011000111",       # bad DV
        "11111111111111",       # all-same
        "123",                  # short
        "not a cnpj",           # garbage
        "",                     # empty
        None,                   # NULL must propagate as NULL in both forms
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    rows = df.select(
        "s",
        V.cnpj_is_valid(F.col("s")).alias("expr"),
        V.cnpj_is_valid_pd(F.col("s")).alias("np"),
    ).collect()
    for r in rows:
        assert r["expr"] == r["np"], (r["s"], r["expr"], r["np"])

    # NF-e keys: build around an embedded valid CNPJ, vary fields
    import itertools

    keys = []
    for uf, yy, mm, modelo in itertools.product(
        ["35", "99"], ["15", "40"], ["06", "13"], ["55", "12"]
    ):
        base43 = f"{uf}{yy}{mm}04252011000110{modelo}" + "0" * 21
        for dv in "0123456789":
            keys.append(base43 + dv)
    keys += ["1" * 44, "123", "", "garbage", None]
    kdf = spark.createDataFrame([(k,) for k in keys], "k string")
    rows = kdf.select(
        "k",
        V.nfe_key_is_valid(F.col("k")).alias("expr_v"),
        V.nfe_key_is_valid_pd(F.col("k")).alias("np_v"),
        V.nfe_key_dv(F.col("k")).cast("int").alias("expr_dv"),
        V.nfe_key_dv_pd(F.col("k")).alias("np_dv"),
    ).collect()
    for r in rows:
        assert r["expr_v"] == r["np_v"], (r["k"], r["expr_v"], r["np_v"])
        if r["k"] is None or (len(r["k"]) == 44 and r["k"].isdigit()):
            assert r["expr_dv"] == r["np_dv"], (r["k"], r["expr_dv"], r["np_dv"])
