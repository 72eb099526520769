"""Deterministic sampling / split tests."""

from __future__ import annotations

import pytest


def test_sample_is_layout_independent(spark):
    from llm_aided_ocr_spark.operators.sampling import deterministic_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in deterministic_sample(df, 0.2, seed=7).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(df.repartition(13), 0.2, seed=7).collect()
    }
    assert a == b, "sample must not depend on physical layout"
    assert 0.15 < len(a) / 2000 < 0.25
    c = {r["doc_id"] for r in deterministic_sample(df, 0.2, seed=8).collect()}
    assert c != a, "different seeds must give different samples"
    with pytest.raises(ValueError):
        deterministic_sample(df, 1.5)


def test_hash_split_disjoint_exhaustive(spark):
    from llm_aided_ocr_spark.operators.sampling import hash_split

    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    rows = out.collect()
    assert len(rows) == 3000  # exhaustive: every row assigned
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "val", "test"}
    assert sum(len(v) for v in by.values()) == 3000  # disjoint
    assert 0.75 < len(by["train"]) / 3000 < 0.85

    # same seed, different partitioning -> identical assignment
    again = {
        (r["doc_id"], r["split"])
        for r in hash_split(
            df.repartition(9), {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3
        ).collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in rows}

    with pytest.raises(ValueError):
        hash_split(df, {"a": 0.5, "b": 0.2})
