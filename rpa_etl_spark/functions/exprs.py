"""Expression-level let-binding.

Catalyst has no common-subexpression elimination across the *arguments* of
an expression tree built in Python: every place a Column object is spliced
in, its whole subtree is duplicated and re-evaluated per row (interpreted
projections evaluate each copy; codegen may or may not dedupe, and huge
trees fall out of codegen entirely). For regex-heavy expressions this
multiplies the dominant cost 4-10x — measured 15x on word-shingle
construction and ~3x on the fiscal validators.

``let`` evaluates each binding exactly once per row by packing the
bindings into a one-element array of struct and building the body under a
``transform`` lambda: lambda variables are materialized values, so every
reference inside the body is a cheap attribute read.

Works nested inside other higher-order-function lambdas (PySpark
generates fresh lambda-variable names per level).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(bindings: dict[str, Column], body: Callable[[dict[str, Column]], Column]) -> Column:
    """Evaluate each binding ONCE, then build the result from bound refs.

    >>> let({"d": expensive_digits(col)},
    ...     lambda b: (F.length(b["d"]) == 14) & checksum(b["d"]))
    """
    packed = F.array(F.struct(*[c.alias(k) for k, c in bindings.items()]))
    return F.element_at(
        F.transform(packed, lambda p: body({k: p[k] for k in bindings})), 1
    )


def let1(binding: Column, body: Callable[[Column], Column]) -> Column:
    """Single-binding sugar: ``let1(expensive, lambda x: f(x, x))``."""
    return let({"v": binding}, lambda b: body(b["v"]))


def col_memo(fn):
    """Memoize a Column-returning builder on its input expressions'
    canonical strings (plus scalar args).

    Large builders assemble hundreds of Column nodes — each a py4j round
    trip — so CONSTRUCTION costs up to ~0.9 s per call (measured on the
    mod-11 validators), re-paid identically on every query build. An
    unresolved Column is an immutable expression tree: splicing the same
    tree into many plans is exactly what reusing an `F.col(...)`-derived
    expression already means (analysis resolves fresh copies per plan).
    The built tree is therefore this library's `re.compile()` — construct
    once per distinct input expression, reuse for the process lifetime.
    Keys use the Catalyst toString of Column args (structurally identical
    inputs hit regardless of which DataFrame they later bind to); any
    unhashable/unstringable argument silently disables the memo for that
    call.

    The cache is scoped to the active py4j GATEWAY (WeakKeyDictionary, the
    same discipline as tables.py's per-session schema memo): a cached
    Column holds a JVM object reference, so after a gateway restart
    (spark.stop() + fresh JVM in a long-lived harness) the old entries are
    dead — a fresh gateway gets a fresh cache, and the dead one is
    collected with the dead gateway."""
    import functools
    import weakref

    caches: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        from pyspark import SparkContext

        gw = SparkContext._gateway
        if gw is None:
            return fn(*args, **kwargs)
        cache = caches.get(gw)
        if cache is None:
            cache = caches[gw] = {}
        try:
            key = (
                tuple(str(a) if isinstance(a, Column) else a for a in args),
                tuple(
                    (k, str(v) if isinstance(v, Column) else v)
                    for k, v in sorted(kwargs.items())
                ),
            )
            hash(key)
        except Exception:
            return fn(*args, **kwargs)
        hit = cache.get(key)
        if hit is None:
            hit = cache[key] = fn(*args, **kwargs)
        return hit

    return wrapped
