"""One-JVM-call construction of double-array plan literals.

The "_cell_scores lesson" (similarity.py) moved K×DIM model literals
from K×DIM Literal NODES to one array Literal so the JVM's
analysis/codegen passes stop walking ~1000 nodes per plan.  r14
optimization round finding: the PYTHON-side construction cost was
still per-element — ``F.lit(<list>)`` (and ``F.array(*[F.lit(v)…])``)
round-trips every element through py4j, measured at ~0.25–3 s per
K×DIM matrix / B-bucket weight vector on this box (tens of thousands
of socket round trips; cProfile showed 15 s of a 31 s GD training loop
inside ``F.lit``).  Building the same literal as ONE ``F.expr`` string
is a single py4j call and a single (cheap) SQL parse: ~1.6 ms for 257
doubles, ~6 ms for a 16×64 matrix — with BIT-IDENTICAL values, because
``repr`` of a Python float is its shortest round-trip decimal and
Spark's ``…D`` double literal parses via ``Double.parseDouble``
(correctly rounded), so value → string → value is exact.

Use these helpers for every model-sized double literal that enters a
plan (weights, centroids, codebook rows, hyperplanes); tiny constant
arrays can stay on the ordinary API.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

_EMPTY_D = "CAST(array() AS ARRAY<DOUBLE>)"


def _d(v: float) -> str:
    """Exact SQL double literal for a finite/non-finite Python float."""
    v = float(v)
    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(v):
        return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
    return f"{v!r}D"


def double_array_sql(values: Iterable[float]) -> str:
    """The SQL text of an array<double> literal — for callers that
    build a whole projection as ONE ``selectExpr``/``F.expr`` string
    (the same per-element-py4j argument as below, applied to the full
    expression tree: a 15-step GD loop spent ~15 s/step-loop just
    constructing DSL Column objects over the socket)."""
    body = ",".join(_d(v) for v in values)
    return f"array({body})" if body else _EMPTY_D


def lit_double_array(values: Iterable[float]) -> Column:
    """array<double> literal in one py4j call (see module docstring)."""
    return F.expr(double_array_sql(values))


def lit_double_matrix(rows: Iterable[Iterable[float]]) -> Column:
    """array<array<double>> literal in one py4j call."""
    parts = []
    for row in rows:
        body = ",".join(_d(v) for v in row)
        parts.append(f"array({body})" if body else _EMPTY_D)
    return F.expr(
        "array(" + ",".join(parts) + ")"
        if parts
        else "CAST(array() AS ARRAY<ARRAY<DOUBLE>>)"
    )
