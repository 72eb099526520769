"""Deterministic sampling and dataset splitting for training pipelines.

``df.sample()`` is seed-dependent BUT partition-layout-dependent (the seed
feeds a per-partition RNG), so the same corpus sampled on two cluster
layouts yields different rows — useless for reproducible dataset releases.
These operators key every decision on a CONTENT-DERIVED portable hash
(md5 of the id, 52-bit — the repo's standard cross-engine family), so:

* the sample/split is identical on any cluster, any partitioning, any
  engine (the driver's DuckDB oracle recomputes membership exactly);
* membership is a pure narrow filter/projection — no shuffle, no RNG
  state, pushdown-friendly;
* splits are mutually exclusive and exhaustive by construction (disjoint
  hash ranges over one uniform value).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = 1 << 52  # md5-52 domain, exact in BIGINT everywhere


def _unit_hash_col(id_col: Column, seed: int) -> Column:
    """Uniform value in [0, 1) from the 52-bit md5 of ``seed:id`` —
    reproducible in any engine with md5 + hex parsing. Reuses the repo's
    single md5-52 definition (operators.dedup) so the whole portable-hash
    stack changes together or not at all."""
    from llm_aided_ocr_spark.operators.dedup import _word_hash_col

    h = _word_hash_col(
        F.concat(F.lit(f"{seed}:"), id_col.cast("string")), "md5_52"
    )
    return h.cast("double") / F.lit(float(HASH_SPACE))


def deterministic_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", seed: int = 1
) -> DataFrame:
    """Keep each row iff ``unit_hash(seed, id) < rate`` — a fixed,
    layout-independent ``rate`` sample. Different seeds give independent
    samples; the same seed always returns the same rows."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_unit_hash_col(F.col(id_col), seed) < F.lit(rate))


def hash_split(
    df: DataFrame,
    weights: Dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 1,
    split_col: str = "split",
) -> DataFrame:
    """Append a ``split`` column assigning every row to exactly one named
    split by disjoint hash ranges (e.g. train/val/test 0.9/0.05/0.05).
    Weights must sum to 1 (±1e-9); assignment order follows the dict
    order. RENAMING a split (same position, same weight, same seed)
    preserves every row's assignment; REORDERING entries changes the
    cumulative thresholds and reassigns rows unless the swapped weights
    are equal — keep the dict order stable across runs."""
    if weights is None:  # `or` would silently replace an empty dict
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = _unit_hash_col(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)
