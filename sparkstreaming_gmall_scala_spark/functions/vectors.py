"""Vector math over ``array<float>`` embedding columns.

Pure Column expressions via F.zip_with / F.aggregate — element-wise work
stays JVM-side; no Python crossing for the brute-force similarity path.
Sums fold left-to-right over the array, which is deterministic and matches
DuckDB's list functions for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    sq = F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Dot product for a KNOWN dimension as an explicit left-to-right
    addition chain of ``a[i]*b[i]``.

    Numerically identical to the ``F.aggregate`` fold (same IEEE-double
    operation order, so DuckDB ``list_reduce`` oracles still hash-match),
    but ~an order of magnitude faster: higher-order functions with
    lambdas are interpreted per element, while getItem/multiply/add chains
    go through whole-stage codegen. Use on hot pairwise paths (O(n²)
    similarity); the HOF forms stay for unknown-dim columns."""
    expr = a.getItem(0).cast("double") * b.getItem(0).cast("double")
    for i in range(1, dim):
        expr = expr + a.getItem(i).cast("double") * b.getItem(i).cast("double")
    return expr


def norm_fixed(a: Column, dim: int) -> Column:
    """sqrt(dot_fixed(a, a)) — same fold order as ``norm``."""
    return F.sqrt(dot_fixed(a, a, dim))


def cosine_fixed(a: Column, b: Column, dim: int) -> Column:
    """Codegen-friendly cosine for a known dimension; arithmetic-order
    identical to ``cosine`` (and the DuckDB oracle's list_reduce)."""
    return dot_fixed(a, b, dim) / (norm_fixed(a, dim) * norm_fixed(b, dim))
