"""Vector column expressions — JVM-side, no Python UDFs.

The reference computes point/segment distances in Scala object code
(SURVEY.md §2.1 R12-R14 lineage: edu.utah.cs.spatial geometry kernels);
here every vector kernel that is a pure fold is expressed with Spark's
higher-order functions (``zip_with`` / ``aggregate`` / ``transform``) so it
runs inside whole-stage codegen — no serialization hop, scales linearly
with executors.

All arithmetic is promoted to double before folding: the stored embeddings
are float32 and folding in float32 would cost ~7 significant digits, which
is not enough for 6-decimal cross-engine hash matching.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(v: Column | str) -> Column:
    """array<float> -> array<double> (promote before any arithmetic)."""
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (deterministic left fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm2(a: Column) -> Column:
    """Euclidean (L2) norm."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (norm2(a) * norm2(b))


def euclidean(a: Column, b: Column) -> Column:
    """Euclidean distance of two double arrays."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
