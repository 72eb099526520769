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


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dsir_corpus(spark):
    """Two 'dialects': docs 0-9 speak medical, 10-19 legal; the target
    corpus is pure medical."""
    med = "patient dose clinical trial symptom therapy"
    leg = "court plaintiff statute contract verdict appeal"
    rows = [(i, f"{med} case {i}") for i in range(10)]
    rows += [(i, f"{leg} case {i}") for i in range(10, 20)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    target = spark.createDataFrame(
        [(100, med), (101, f"{med} outcome")], "doc_id bigint, text string"
    )
    return df, target


def test_dsir_weights_rank_target_like_docs_higher(spark, dsir_corpus):
    from llm_aided_ocr_spark.operators.sampling import dsir_log_weights

    df, target = dsir_corpus
    w = {r.id: r.log_weight for r in dsir_log_weights(df, target).collect()}
    assert len(w) == 20
    assert min(w[i] for i in range(10)) > max(w[i] for i in range(10, 20))


def test_dsir_select_prefers_target_dialect_and_is_layout_invariant(
    spark, dsir_corpus
):
    from llm_aided_ocr_spark.operators.sampling import dsir_select

    df, target = dsir_corpus
    sel = dsir_select(df, target, k=8, seed=7)
    ids = sorted(r.id for r in sel.collect())
    assert len(ids) == 8
    # the medical docs' weight edge dominates the Gumbel noise scale for
    # this corpus: most of the sample comes from the target dialect
    assert sum(1 for i in ids if i < 10) >= 6
    ids2 = sorted(
        r.id for r in dsir_select(df.repartition(7), target, k=8, seed=7).collect()
    )
    assert ids == ids2
    # a different seed resamples (neither a superset nor fixed)
    ids3 = sorted(r.id for r in dsir_select(df, target, k=8, seed=8).collect())
    assert len(ids3) == 8


def test_dsir_weights_hash_families_agree(spark, dsir_corpus):
    from llm_aided_ocr_spark.operators.sampling import dsir_log_weights

    df, target = dsir_corpus
    a = {r.id: round(r.log_weight, 9)
         for r in dsir_log_weights(df, target, hash_family="md5_52").collect()}
    b = {r.id: round(r.log_weight, 9)
         for r in dsir_log_weights(df, target, hash_family="xxhash64").collect()}
    assert a == b


def test_dsir_scoring_join_broadcasts_the_ratio_table(spark, dsir_corpus):
    """The corpus-side scoring join must be broadcast (the log-ratio
    table is vocabulary-sized) — a sort-merge join there would shuffle
    the per-doc feature relation a second time."""
    from llm_aided_ocr_spark.operators.sampling import dsir_log_weights

    df, target = dsir_corpus
    plan = (
        dsir_log_weights(df, target)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_mixture_resample_semantics(spark):
    """Rate 0 drops the domain, integer rate 2 copies every doc exactly
    twice (no hash gate), fractional rates land between floor and ceil
    with deterministic membership, and copy_ix enumerates copies."""
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.operators.sampling import mixture_resample

    rows = [
        (f"https://{d}/p{i}",) for d in ("a.com", "b.com", "c.com", "d.com")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "url string")
    out = mixture_resample(
        df, {"a.com": 0.0, "b.com": 2.0, "c.com": 0.4}, default_rate=1.0,
        seed=3,
    )
    per = {
        r["d"]: (r["n"], r["max_ix"])
        for r in out.groupBy(
            F.regexp_extract("url", r"https://([^/]+)/", 1).alias("d")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.max("copy_ix").alias("max_ix"))
        .collect()
    }
    assert "a.com" not in per
    assert per["b.com"] == (100, 1)
    assert per["d.com"] == (50, 0)
    n_c, max_c = per["c.com"]
    assert 0 < n_c < 50 and max_c == 0
    # deterministic: same seed reproduces exactly; different seed redraws
    again = mixture_resample(
        df, {"a.com": 0.0, "b.com": 2.0, "c.com": 0.4}, default_rate=1.0,
        seed=3,
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    other = mixture_resample(df, {"c.com": 0.4}, default_rate=1.0, seed=4)
    kept3 = {r.url for r in out.filter(F.col("url").contains("c.com")).collect()}
    kept4 = {r.url for r in other.filter(F.col("url").contains("c.com")).collect()}
    assert kept3 != kept4


def test_mixture_resample_fractional_upsample_and_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.operators.sampling import mixture_resample

    rows = [(f"https://up.com/p{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "url string")
    out = mixture_resample(df, {"up.com": 2.3}, seed=1)
    n = out.count()
    # every doc appears 2 or 3 times; expected share of 3s ~ 0.3
    assert 400 < n < 600
    per_url = out.groupBy("url").count().select("count").distinct().collect()
    assert {r["count"] for r in per_url} <= {2, 3}
    with pytest.raises(ValueError):
        mixture_resample(df, {"up.com": -0.1})


# ---------------------------------------------------------------------------
# temperature_rates — sqrt temperature mixing rates
# ---------------------------------------------------------------------------

def test_temperature_rates_flattens_toward_uniform(spark):
    """A 90/9/1 domain split: rates order inversely with counts, and the
    implied post-resample shares (rate*count, normalized) sit strictly
    between the raw shares and uniform."""
    from llm_aided_ocr_spark.operators.sampling import temperature_rates

    docs = (
        [(i, "https://big.example.org/a") for i in range(90)]
        + [(i + 90, "https://mid.example.org/a") for i in range(9)]
        + [(99, "https://tiny.example.org/a")]
    )
    df = spark.createDataFrame(docs, "doc_id bigint, url string")
    rows = {r["domain"]: r for r in temperature_rates(df).collect()}
    assert rows["big.example.org"]["n_docs"] == 90
    r_big = rows["big.example.org"]["rate_r"]
    r_mid = rows["mid.example.org"]["rate_r"]
    r_tiny = rows["tiny.example.org"]["rate_r"]
    assert r_big < r_mid < r_tiny
    assert r_big < 1.0 < r_tiny  # head down-samples, tail up-samples
    # implied shares: rate*count / sum -> between raw share and 1/3
    tot = r_big * 90 + r_mid * 9 + r_tiny * 1
    share_big = r_big * 90 / tot
    assert 1 / 3 < share_big < 0.9
    share_tiny = r_tiny * 1 / tot
    assert 0.01 < share_tiny < 1 / 3


def test_temperature_rates_exact_integer_derivation(spark):
    """Hand-check: counts 9 and 4 -> isqrt 3 and 2, S=5, N=13;
    rate = N/(s*S)."""
    from llm_aided_ocr_spark.operators.sampling import temperature_rates

    docs = [(i, "https://a.example.org/x") for i in range(9)] + [
        (i + 9, "https://b.example.org/x") for i in range(4)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, url string")
    rows = {r["domain"]: r["rate_r"] for r in temperature_rates(df).collect()}
    assert rows["a.example.org"] == round(13 / (3 * 5), 9)
    assert rows["b.example.org"] == round(13 / (2 * 5), 9)
