"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def let_(expr: Column, fn) -> Column:
    """Bind ``expr`` to a lambda variable so ``fn`` can reference it many
    times with ONE evaluation (transform over a 1-element array; lambda
    variables are evaluated once per element, and unlike a projected alias
    the binding cannot be inlined-per-reference by CollapseProject)."""
    return F.get(F.transform(F.array(expr), fn), 0)


def ensure_min_parallelism(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions
    than ``min_factor * defaultParallelism``.

    Compute-heavy per-document operators (hashing, winnowing, signatures)
    are scan-parallel at corpus scale — a 100 TB table has millions of
    splits and this is a no-op. On a small table (one parquet row-group =
    one task) the same operator would run serially on one core; spreading
    a few megabytes is free and restores the parallelism the operator
    would have on a real input. The condition keeps the big-input path
    shuffle-free."""
    if df.isStreaming:  # partitioning is per-micro-batch; no-op
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_factor)):
        return df.repartition(target)
    return df
