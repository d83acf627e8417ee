"""Trust scoring + status decision (reference parity: O2/O3).

Re-expresses `/root/reference/robot/orchestrator.py:33-116` (penalty table
and score clamp) and :257-263 (status decision) as column expressions.
Scores are exact DECIMAL so they hash-compare deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# penalty weights — orchestrator.py:33-41
PENALTY_ISSUER_CNPJ = "1.00"
PENALTY_TOTAL_MISSING = "0.50"
PENALTY_TOTAL_FORMAT = "0.30"
PENALTY_RECIPIENT_MISSING = "0.10"
PENALTY_KEY_INVALID = "0.20"

_D = "decimal(4,2)"


def penalty(cond: Column, weight: str) -> Column:
    """One penalty term: ``weight`` when ``cond`` else 0 (exact decimal)."""
    return F.when(cond, F.lit(weight).cast(_D)).otherwise(F.lit("0.00").cast(_D))


def trust_score(*penalties: Column) -> Column:
    """score = max(0, 1.0 − Σ penalties) — orchestrator.py:43-116."""
    total = penalties[0]
    for p in penalties[1:]:
        total = total + p
    return F.greatest(F.lit("0.00").cast(_D), F.lit("1.00").cast(_D) - total)


def status_decision(has_error: Column, n_issues: Column, score: Column) -> Column:
    """O3 — any error-severity issue → 'error'; else any issue or score < 1
    → 'partial'; else 'success' (orchestrator.py:257-263)."""
    return (
        F.when(has_error, F.lit("error"))
        .when((n_issues > 0) | (score < F.lit("1.00").cast(_D)), F.lit("partial"))
        .otherwise(F.lit("success"))
    )
