"""Shared vector arithmetic as JVM-side higher-order functions.

Single source of truth for the dot/norm/squared-distance expressions used by
BOTH the similarity queries (queries/vector.py — audited bit-comparable to
the DuckDB oracle before rounding) and the IVF operator (operators/ivf.py —
audited exactly equal to its NumPy dual implementation). Keeping one copy
means a tweak cannot silently diverge the Spark-vs-oracle arithmetic of one
consumer.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def dot_expr(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a):
    return F.sqrt(dot_expr(a, a))


def sqdist_expr(a, b):
    d = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x)
