"""M3 — validator + scoring declared queries.

The synthetic tables carry no fiscal identifiers, so each query first
*derives* deterministic test strings from key columns (same construction in
the Spark plan and the oracle SQL), then validates them with the engine's
validator expressions while the oracle re-implements the checksum math
independently in DuckDB SQL — a genuine cross-check of the mod-11 logic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rpa_etl_spark.functions import scoring as S
from rpa_etl_spark.functions import validators as V
from rpa_etl_spark.registry import query
from rpa_etl_spark.tables import load, spread

_UF_LIST_SQL = "['" + "','".join(str(c) for c in V.IBGE_UF_CODES) + "']"
_CNPJ_W1_SQL = "[" + ",".join(str(w) for w in V._CNPJ_W1) + "]"
_CNPJ_W2_SQL = "[" + ",".join(str(w) for w in V._CNPJ_W2) + "]"

# DuckDB fragment: validate a 14-digit string `cnpj` (independent mod-11 impl)
_CNPJ_VALID_SQL = f"""
    (length(cnpj) = 14
     AND cnpj != repeat(substr(cnpj, 1, 1), 14)
     AND CAST(substr(cnpj, 13, 1) AS INT) = (
        CASE WHEN list_sum(list_transform(range(1, 13),
                 i -> CAST(substr(cnpj, CAST(i AS INT), 1) AS INT) * ({_CNPJ_W1_SQL})[i])) % 11 < 2
             THEN 0
             ELSE 11 - list_sum(list_transform(range(1, 13),
                 i -> CAST(substr(cnpj, CAST(i AS INT), 1) AS INT) * ({_CNPJ_W1_SQL})[i])) % 11 END)
     AND CAST(substr(cnpj, 14, 1) AS INT) = (
        CASE WHEN list_sum(list_transform(range(1, 14),
                 i -> CAST(substr(cnpj, CAST(i AS INT), 1) AS INT) * ({_CNPJ_W2_SQL})[i])) % 11 < 2
             THEN 0
             ELSE 11 - list_sum(list_transform(range(1, 14),
                 i -> CAST(substr(cnpj, CAST(i AS INT), 1) AS INT) * ({_CNPJ_W2_SQL})[i])) % 11 END)
    )
"""


def _synthetic_cnpj(key: Column) -> Column:
    """Deterministic pseudo-random 14-digit string from a key column."""
    return F.lpad(((key * 7919) % 100000000000000).cast("string"), 14, "0")


@query(
    "q_cnpj_valid",
    oracle=f"""
    WITH syn AS (
        SELECT c_custkey,
               lpad(CAST((c_custkey * 7919) % 100000000000000 AS VARCHAR), 14, '0') AS cnpj
        FROM customer
    )
    SELECT c_custkey, cnpj,
           {_CNPJ_VALID_SQL} AS is_valid,
           CASE WHEN {_CNPJ_VALID_SQL}
                THEN substr(cnpj,1,2) || '.' || substr(cnpj,3,3) || '.' || substr(cnpj,6,3)
                     || '/' || substr(cnpj,9,4) || '-' || substr(cnpj,13,2) END AS formatted,
           substr(cnpj, 9, 4) = '0001' AS is_matriz
    FROM syn
    """,
)
def q_cnpj_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2 CNPJ mod-11 validation as a pure column expression; the oracle
    re-implements the checksum independently in DuckDB SQL."""
    # rebalance before the checksum/regex column work (single-row-group
    # scan = one task; parallelism sized to CPU)
    cust = spread(load(spark, sf_dir, "customer"))
    cnpj = _synthetic_cnpj(F.col("c_custkey"))
    valid = V.cnpj_is_valid(cnpj)
    return cust.select(
        "c_custkey",
        cnpj.alias("cnpj"),
        valid.alias("is_valid"),
        F.when(valid, V.cnpj_format(cnpj)).alias("formatted"),
        V.cnpj_is_matriz(cnpj).alias("is_matriz"),
    )


# NF-e key: uf(2)+aamm(4)+cnpj(14)+modelo(2)+serie(3)+numero(9)+tpemis(1)+cnf(8)+dv(1)
_VALID_EMBED_CNPJ = "04252011000110"   # checksum-valid (reference test fixture)
_INVALID_EMBED_CNPJ = "04252011000199"  # wrong check digits


def _synthetic_nfe_key(okey: Column, with_dv: bool = True) -> Column:
    uf = F.element_at(
        F.array([F.lit(str(c)) for c in V.IBGE_UF_CODES]),
        (okey % 27).cast("int") + 1,
    )
    aamm = F.concat(F.lit("24"), F.lpad(((okey % 12) + 1).cast("string"), 2, "0"))
    cnpj = F.when(okey % 2 == 0, F.lit(_VALID_EMBED_CNPJ)).otherwise(
        F.lit(_INVALID_EMBED_CNPJ)
    )
    modelo = F.when(okey % 3 == 0, F.lit("55")).when(okey % 3 == 1, F.lit("65")).otherwise(F.lit("99"))
    serie = F.lpad((okey % 1000).cast("string"), 3, "0")
    numero = F.lpad((okey % 1000000000).cast("string"), 9, "0")
    cnf = F.lpad(((okey * 2654435761) % 100000000).cast("string"), 8, "0")
    key43 = F.concat(uf, aamm, cnpj, modelo, serie, numero, F.lit("1"), cnf)
    if not with_dv:
        return key43
    return F.concat(key43, (okey % 10).cast("string"))


_NFE_KEY43_SQL = """
    ({uf})[CAST(o_orderkey % 27 AS INT) + 1]
    || '24' || lpad(CAST((o_orderkey % 12) + 1 AS VARCHAR), 2, '0')
    || CASE WHEN o_orderkey % 2 = 0 THEN '04252011000110' ELSE '04252011000199' END
    || CASE WHEN o_orderkey % 3 = 0 THEN '55' WHEN o_orderkey % 3 = 1 THEN '65' ELSE '99' END
    || lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0')
    || lpad(CAST(o_orderkey % 1000000000 AS VARCHAR), 9, '0')
    || '1'
    || lpad(CAST((o_orderkey * 2654435761) % 100000000 AS VARCHAR), 8, '0')
""".format(uf=_UF_LIST_SQL)


@query(
    "q_nfe_key_valid",
    oracle=f"""
    WITH syn AS (
        SELECT o_orderkey,
               {_NFE_KEY43_SQL} || CAST(o_orderkey % 10 AS VARCHAR) AS nfe_key
        FROM orders
    ),
    parts AS (
        SELECT o_orderkey, nfe_key,
               substr(nfe_key, 7, 14) AS cnpj,
               list_sum(list_transform(range(1, 44),
                   i -> CAST(substr(nfe_key, CAST(i AS INT), 1) AS INT)
                        * (2 + ((43 - i) % 8)))) % 11 AS r
        FROM syn
    )
    SELECT o_orderkey, nfe_key,
           (CASE WHEN r <= 1 THEN 0 ELSE 11 - r END) = CAST(substr(nfe_key, 44, 1) AS INT)
           AND CAST(substr(nfe_key, 1, 2) AS INT) IN (SELECT UNNEST({_UF_LIST_SQL}::INT[]))
           AND CAST(substr(nfe_key, 3, 2) AS INT) BETWEEN 8 AND 30
           AND CAST(substr(nfe_key, 5, 2) AS INT) BETWEEN 1 AND 12
           AND CAST(substr(nfe_key, 21, 2) AS INT) IN (55, 65)
           AND {_CNPJ_VALID_SQL}
               AS is_valid,
           CAST((CASE WHEN r <= 1 THEN 0 ELSE 11 - r END) AS INT) AS expected_dv
    FROM parts
    """,
)
def q_nfe_key_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3 NF-e 44-digit access-key validation; DV math cross-checked against
    an independent DuckDB implementation."""
    # rebalance before the CPU-bound key construction (single-row-group
    # scan = one task), then barrier after it: the constructed key feeds
    # 3 consumers (echo, full validation, DV recompute) — materialize
    # once instead of letting Catalyst inline the construction into each
    orders = spread(load(spark, sf_dir, "orders"))
    key = _synthetic_nfe_key(F.col("o_orderkey"))
    base = spread(orders.select("o_orderkey", key.alias("nfe_key")))
    return base.select(
        "o_orderkey",
        "nfe_key",
        # flat per-row validation → the vectorized numpy kernels (the
        # expression forms serve the in-lambda parser path; agreement is
        # test-gated in tests/test_validators.py)
        V.nfe_key_is_valid_pd(F.col("nfe_key")).alias("is_valid"),
        V.nfe_key_dv_pd(F.col("nfe_key")).alias("expected_dv"),
    )


@query(
    "q_monetary_br",
    oracle="""
    WITH syn AS (
        SELECT o_orderkey,
               CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0) AS BIGINT) AS cents
        FROM orders
    ),
    built AS (
        SELECT o_orderkey, cents,
               CAST(cents // 100 AS VARCHAR) AS int_str,
               lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS frac
        FROM syn
    ),
    fmt AS (
        SELECT *,
               CASE WHEN length(int_str) > 3
                    THEN substr(int_str, 1, length(int_str) - 3) || '.' || substr(int_str, length(int_str) - 2)
                    ELSE int_str END AS dotted,
               CASE WHEN length(int_str) > 3
                    THEN substr(int_str, 1, length(int_str) - 3) || ',' || substr(int_str, length(int_str) - 2)
                    ELSE int_str END AS commaed
        FROM built
    ),
    raws AS (
        SELECT o_orderkey, cents, dotted, frac,
               CASE CAST(o_orderkey % 4 AS INT)
                    WHEN 0 THEN 'R$ ' || dotted || ',' || frac
                    WHEN 1 THEN 'US$ ' || commaed || '.' || frac
                    WHEN 2 THEN 'R$ ' || dotted || ',' || frac || '9'
                    ELSE 'R$ -' || dotted || ',' || frac END AS raw
        FROM fmt
    ),
    parsed AS (
        SELECT *,
               regexp_replace(raw, '[^0-9,.\\-]', '', 'g') AS s
        FROM raws
    ),
    norm AS (
        SELECT *,
               CASE WHEN contains(s, ',')
                         AND (NOT contains(s, '.')
                              OR (length(s) - strpos(reverse(s), ',') + 1)
                                 > (length(s) - strpos(reverse(s), '.') + 1))
                    THEN replace(replace(s, '.', ''), ',', '.')
                    ELSE replace(s, ',', '') END AS ns
        FROM parsed
    ),
    final AS (
        SELECT *, TRY_CAST(ns AS DECIMAL(18,6)) AS exact FROM norm
    )
    SELECT o_orderkey, raw,
           exact IS NOT NULL AND exact >= 0 AND exact <= 1000000000
               AND exact = ROUND(exact, 2) AS is_valid,
           CASE WHEN exact IS NOT NULL AND exact >= 0 AND exact <= 1000000000
                     AND exact = ROUND(exact, 2)
                THEN CAST(CAST(exact AS DECIMAL(18,2)) AS DOUBLE) END AS parsed_value,
           CASE WHEN exact IS NOT NULL AND exact >= 0 AND exact <= 1000000000
                     AND exact = ROUND(exact, 2)
                THEN dotted || ',' || frac END AS formatted_br,
           CASE WHEN CAST(o_orderkey % 4 AS INT) = 1 THEN 'USD' ELSE 'BRL' END AS currency
    FROM final
    """,
)
def q_monetary_br(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4 monetary validation: BR/US separator normalization, guarded decimal
    parse, range + 2-dp gates, BR reformat (validators.py:239-357)."""
    # rebalance before the regex/decimal column chain (single-row-group
    # scan = one task; parallelism sized to CPU)
    orders = spread(load(spark, sf_dir, "orders"))
    cents = F.round(F.col("o_totalprice").cast("decimal(18,2)") * 100, 0).cast("long")
    int_str = F.expr(
        "CAST(CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0) AS BIGINT) div 100 AS STRING)"
    )
    frac = F.lpad((cents % 100).cast("string"), 2, "0")
    dotted = F.when(
        F.length(int_str) > 3,
        F.concat(
            F.substring(int_str, 1, F.length(int_str) - 3).cast("string"),
            F.lit("."),
            int_str.substr(F.length(int_str) - 2, F.lit(3)),
        ),
    ).otherwise(int_str)
    commaed = F.when(
        F.length(int_str) > 3,
        F.concat(
            F.substring(int_str, 1, F.length(int_str) - 3).cast("string"),
            F.lit(","),
            int_str.substr(F.length(int_str) - 2, F.lit(3)),
        ),
    ).otherwise(int_str)
    okey4 = (F.col("o_orderkey") % 4).cast("int")
    raw = (
        F.when(okey4 == 0, F.concat(F.lit("R$ "), dotted, F.lit(","), frac))
        .when(okey4 == 1, F.concat(F.lit("US$ "), commaed, F.lit("."), frac))
        .when(okey4 == 2, F.concat(F.lit("R$ "), dotted, F.lit(","), frac, F.lit("9")))
        .otherwise(F.concat(F.lit("R$ -"), dotted, F.lit(","), frac))
    )
    # NOTE: no exchange barrier needed here — CollapseProject refuses to
    # inline a non-cheap alias referenced more than once, so `raw` is
    # computed exactly once even as two stacked Projects (verified: the
    # CASE/concat tree appears once in the executed plan either way, and
    # dropping the former spread() barrier cut sf0.1 runtime 1.2s -> 0.75s
    # by removing a full exchange of the constructed strings)
    base = orders.select(
        "o_orderkey",
        raw.alias("raw"),
        F.when(okey4 == 1, F.lit("USD")).otherwise(F.lit("BRL")).alias("currency"),
    )
    parsed = V.money_parse(F.col("raw"))
    return base.select(
        "o_orderkey",
        "raw",
        V.money_is_valid(F.col("raw")).alias("is_valid"),
        parsed.cast("double").alias("parsed_value"),
        F.when(parsed.isNotNull(), V.money_format_br(parsed)).alias("formatted_br"),
        "currency",
    )


@query(
    "q_trust_score",
    oracle=f"""
    WITH syn AS (
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
               lpad(CAST((o.o_custkey * 7919) % 100000000000000 AS VARCHAR), 14, '0') AS cnpj
        FROM orders o
    ),
    flags AS (
        SELECT o_orderkey,
               NOT {_CNPJ_VALID_SQL}        AS issuer_invalid,
               o_totalprice IS NULL         AS total_missing,
               o_totalprice < 2000          AS total_bad_format,
               o_custkey % 10 = 0           AS recipient_missing,
               o_orderkey % 7 = 0           AS key_invalid
        FROM syn
    ),
    scored AS (
        SELECT o_orderkey, issuer_invalid,
               (CASE WHEN issuer_invalid THEN 1 ELSE 0 END
                + CASE WHEN total_missing THEN 1 ELSE 0 END
                + CASE WHEN total_bad_format THEN 1 ELSE 0 END
                + CASE WHEN recipient_missing THEN 1 ELSE 0 END
                + CASE WHEN key_invalid THEN 1 ELSE 0 END) AS n_issues,
               CAST(GREATEST(CAST(0 AS DECIMAL(4,2)),
                        CAST(1 AS DECIMAL(4,2))
                        - (CASE WHEN issuer_invalid THEN CAST(1.00 AS DECIMAL(4,2)) ELSE CAST(0 AS DECIMAL(4,2)) END
                           + CASE WHEN total_missing THEN CAST(0.50 AS DECIMAL(4,2)) ELSE CAST(0 AS DECIMAL(4,2)) END
                           + CASE WHEN total_bad_format THEN CAST(0.30 AS DECIMAL(4,2)) ELSE CAST(0 AS DECIMAL(4,2)) END
                           + CASE WHEN recipient_missing THEN CAST(0.10 AS DECIMAL(4,2)) ELSE CAST(0 AS DECIMAL(4,2)) END
                           + CASE WHEN key_invalid THEN CAST(0.20 AS DECIMAL(4,2)) ELSE CAST(0 AS DECIMAL(4,2)) END))
                   AS DECIMAL(4,2)) AS score
        FROM flags
    )
    SELECT CASE WHEN issuer_invalid THEN 'error'
                WHEN n_issues > 0 OR score < 1 THEN 'partial'
                ELSE 'success' END AS status,
           COUNT(*) AS n_docs,
           CAST(SUM(score) AS DOUBLE) / COUNT(*) AS avg_trust,
           CAST(MIN(score) AS DOUBLE) AS min_trust,
           CAST(MAX(score) AS DOUBLE) AS max_trust
    FROM scored
    GROUP BY 1
    """,
)
def q_trust_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 trust score + O3 status decision over proxy document-completeness
    flags (penalty table from orchestrator.py:33-41)."""
    orders = load(spark, sf_dir, "orders")
    # stage 1: evaluate each completeness flag once
    flags = orders.select(
        (~V.cnpj_is_valid_pd(_synthetic_cnpj(F.col("o_custkey")))).alias("issuer_invalid"),
        F.col("o_totalprice").isNull().alias("total_missing"),
        (F.col("o_totalprice") < 2000).alias("total_bad"),
        (F.col("o_custkey") % 10 == 0).alias("recipient_missing"),
        (F.col("o_orderkey") % 7 == 0).alias("key_invalid"),
    )
    c = F.col
    n_issues = (
        c("issuer_invalid").cast("int") + c("total_missing").cast("int")
        + c("total_bad").cast("int") + c("recipient_missing").cast("int")
        + c("key_invalid").cast("int")
    )
    score = S.trust_score(
        S.penalty(c("issuer_invalid"), S.PENALTY_ISSUER_CNPJ),
        S.penalty(c("total_missing"), S.PENALTY_TOTAL_MISSING),
        S.penalty(c("total_bad"), S.PENALTY_TOTAL_FORMAT),
        S.penalty(c("recipient_missing"), S.PENALTY_RECIPIENT_MISSING),
        S.penalty(c("key_invalid"), S.PENALTY_KEY_INVALID),
    ).cast("decimal(4,2)")
    status = S.status_decision(c("issuer_invalid"), n_issues, score)
    return (
        flags.select(status.alias("status"), score.alias("score"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("score").cast("double") / F.count(F.lit(1))).alias("avg_trust"),
            F.min("score").cast("double").alias("min_trust"),
            F.max("score").cast("double").alias("max_trust"),
        )
    )
