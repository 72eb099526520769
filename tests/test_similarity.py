"""ANN similarity-search tests over the driver embeddings table and
synthetic vectors."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

EMB_PATH = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def vectors(spark):
    if os.path.exists(EMB_PATH):
        return spark.read.parquet(EMB_PATH).cache()
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.normal(size=16)], i % 3) for i in range(200)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).cache()


@pytest.fixture(scope="module")
def queries_df(spark, vectors):
    rows = vectors.limit(3).collect()
    return spark.createDataFrame(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in rows],
        "query_id bigint, query_vec array<double>",
    )


def _numpy_topk(vectors_rows, q_rows, k):
    out = {}
    for q in q_rows:
        qv = np.array(q["query_vec"])
        scores = []
        for r in vectors_rows:
            v = np.array(r["embedding"], dtype=np.float64)
            denom = np.linalg.norm(v) * np.linalg.norm(qv)
            c = float(v @ qv / denom) if denom > 0 else 0.0
            scores.append((c, r["vec_id"]))
        scores.sort(key=lambda t: (-t[0], t[1]))
        out[q["query_id"]] = scores[:k]
    return out


def test_brute_force_topk_exact(spark, vectors, queries_df):
    from llm_aided_ocr_spark.operators.similarity import brute_force_topk

    got = brute_force_topk(vectors, queries_df, k=5).collect()
    want = _numpy_topk(vectors.collect(), queries_df.collect(), 5)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    for qid, rows in by_q.items():
        rows.sort()
        for (rank, vid, cos), (wcos, wvid) in zip(rows, want[qid]):
            assert vid == wvid
            assert math.isclose(cos, wcos, rel_tol=1e-6, abs_tol=1e-6)
    # self-match is always rank 1 with cosine ~1
    for qid, rows in by_q.items():
        rows.sort()
        assert rows[0][1] == qid
        assert math.isclose(rows[0][2], 1.0, abs_tol=1e-6)


def test_lsh_topk_recall(spark, vectors, queries_df):
    from llm_aided_ocr_spark.operators.similarity import lsh_topk

    dim = len(vectors.first()["embedding"])
    got = lsh_topk(vectors, queries_df, dim=dim, k=5, num_planes=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    # the query vector itself lands in its own bucket → rank-1 self match
    for qid, rows in by_q.items():
        rows.sort()
        assert rows[0][1] == qid


def test_ivf_topk(spark, vectors, queries_df):
    from llm_aided_ocr_spark.operators.similarity import (
        ivf_topk,
        train_centroids_sample,
    )

    cents = train_centroids_sample(
        vectors, n_centroids=4, sample_fraction=1.0, iters=3
    )
    got = ivf_topk(vectors, queries_df, cents, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for qid, rows in by_q.items():
        rows.sort()
        assert rows[0][1] == qid  # query's own cell contains it


def test_train_sample_is_row_capped(spark, vectors):
    # The driver collect must be bounded by max_rows even at fraction=1.0
    # (at 10^12 rows a fraction-only sample OOMs the driver); the trainer
    # must still produce n_centroids valid centroids from the capped set.
    from llm_aided_ocr_spark.operators.similarity import (
        _collect_bounded_sample,
        train_centroids_sample,
    )

    n_total = vectors.count()
    cap = max(4, n_total // 4)
    X = _collect_bounded_sample(vectors, "embedding", 1.0, 11, cap)
    assert len(X) == cap < n_total
    cents = train_centroids_sample(
        vectors, n_centroids=4, sample_fraction=1.0, iters=2, max_rows=cap
    )
    assert len(cents) == 4 and all(len(c) == len(cents[0]) for c in cents)


def test_embedding_near_dup_pairs(spark):
    from llm_aided_ocr_spark.operators.similarity import embedding_near_dup_pairs

    rng = np.random.RandomState(5)
    base = rng.normal(size=12)
    near = base + rng.normal(scale=0.01, size=12)   # cosine ~1
    other = rng.normal(size=12)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base]),    # exact dup
        (2, [float(x) for x in near]),    # near dup
        (3, [float(x) for x in other]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(df, dim=12, threshold=0.95).collect()
    }
    assert math.isclose(pairs[(0, 1)], 1.0, abs_tol=1e-9)
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.99
    assert not any(3 in p for p in pairs)


def test_quantized_sketch_forms_agree(spark):
    """The Arrow (int64 matmul) and column-expression forms of the
    quantized Rademacher sketch must produce identical buckets — that
    equality is what the DuckDB oracle's portability rests on."""
    import os

    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.operators.similarity import (
        quantized_sketch,
        quantized_sketch_col,
        rademacher_planes,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):
        import pytest

        pytest.skip("driver testdata absent")
    emb = spark.read.parquet(path).select("vec_id", "embedding")
    planes = rademacher_planes(64, 6, seed=7)
    fast = {
        r["vec_id"]: r["bucket"]
        for r in quantized_sketch(emb, planes).collect()
    }
    native = {
        r["vec_id"]: r["bucket"]
        for r in emb.withColumn(
            "bucket", quantized_sketch_col(F.col("embedding"), planes)
        ).collect()
    }
    assert fast == native and len(fast) == 500


def test_cosine_col_zero_norm(spark):
    from llm_aided_ocr_spark.operators.similarity import cosine_col

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    vals = [r["c"] for r in df.select(cosine_col(F.col("a"), F.col("b")).alias("c")).collect()]
    assert vals[0] == 0.0
    assert math.isclose(vals[1], 1.0, abs_tol=1e-12)


def test_ivf_multi_probe_recall(spark, vectors, queries_df):
    """nprobe is the IVF recall knob: probing the 2 nearest cells must
    (a) return a superset-or-equal candidate quality — recall@k vs brute
    force never drops — and (b) measurably improve recall on this corpus
    (queries near cell boundaries pick up neighbors from adjacent cells).
    Also pins nprobe=len(centroids) == brute force exactly."""
    from llm_aided_ocr_spark.operators.similarity import (
        ivf_topk,
        train_centroids_sample,
    )

    k = 10
    cents = train_centroids_sample(
        vectors, n_centroids=8, sample_fraction=1.0, iters=3
    )
    v_rows = vectors.collect()
    q_rows = queries_df.collect()
    truth = {
        qid: {vid for _, vid in pairs}
        for qid, pairs in _numpy_topk(v_rows, q_rows, k).items()
    }

    def recall(nprobe: int) -> float:
        got = ivf_topk(vectors, queries_df, cents, k=k, nprobe=nprobe).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(len(by_q.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    r1, r2, rall = recall(1), recall(2), recall(len(cents))
    assert r2 >= r1
    assert r2 > r1 or r1 == 1.0, (r1, r2)
    assert rall == 1.0, "probing every cell must equal brute force"


# ---------------------------------------------------------------------------
# SemDeDup semantic dedup
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def semdedup_corpus(spark):
    """Two well-separated clusters around axis-aligned centroids, with a
    triple of near-identical vectors in cluster A, a pair in cluster B,
    and a cross-cluster near-identical pair (the algorithm's documented
    blind spot)."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []

    def noisy(base, vid, eps):
        v = np.asarray(base, dtype=np.float64)
        v = v + rng.normal(0, eps, size=v.shape)
        rows.append((vid, [float(x) for x in v]))

    a = [10.0, 0.0, 0.0, 0.0]
    b = [0.0, 10.0, 0.0, 0.0]
    for vid in (1, 2, 3):          # triple of semantic dups in cell A
        noisy(a, vid, 0.01)
    for vid in (4, 5):             # pair in cell B
        noisy(b, vid, 0.01)
    noisy([7.0, 7.1, 0.0, 0.0], 6, 0.005)   # cross-cluster near-identical
    noisy([7.1, 7.0, 0.0, 0.0], 7, 0.005)   # ...lands in the other cell
    noisy([5.0, 0.0, 8.0, 0.0], 8, 0.0)     # unique in cell A
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


SEM_CENTS = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0]]


def test_semantic_dedup_pairs_within_cell_only(spark, semdedup_corpus):
    from llm_aided_ocr_spark.operators.similarity import semantic_dedup_pairs

    pairs = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(
            semdedup_corpus, SEM_CENTS, tau=0.999
        ).collect()
    }
    assert pairs == {(1, 2), (1, 3), (2, 3), (4, 5)}
    # 6 and 7 are near-identical but in different cells: SemDeDup's
    # documented cross-cluster blind spot, asserted so it stays a
    # deliberate trade, not an accident
    assert (6, 7) not in pairs


def test_semantic_dedup_keeps_min_id_per_component(spark, semdedup_corpus):
    from llm_aided_ocr_spark.operators.similarity import semantic_dedup

    kept = sorted(
        r.vec_id for r in semantic_dedup(semdedup_corpus, SEM_CENTS, tau=0.999).collect()
    )
    assert kept == [1, 4, 6, 7, 8]


def test_semantic_dedup_max_cell_size_drops_oversized_cells(spark, semdedup_corpus):
    from llm_aided_ocr_spark.operators.similarity import semantic_dedup_pairs

    # cell A holds 5 vectors (1,2,3,6,8), cell B 4 (4,5,7): capping at 4
    # removes every cell-A candidate but keeps (4,5)
    pairs = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(
            semdedup_corpus, SEM_CENTS, tau=0.999, max_cell_size=4
        ).collect()
    }
    assert pairs == {(4, 5)}


def test_semantic_dedup_keep_farthest_matches_paper_policy(spark, semdedup_corpus):
    """keep='farthest' keeps the component member with the LOWEST cosine
    to its cell centroid (the SemDeDup paper's representative): vid 3 in
    the {1,2,3} component, vid 4 in {4,5} (computed offline from the
    fixture's rng); min_id stays the default and unchanged."""
    from llm_aided_ocr_spark.operators.similarity import semantic_dedup

    kept = sorted(
        r.vec_id
        for r in semantic_dedup(
            semdedup_corpus, SEM_CENTS, tau=0.999, keep="farthest"
        ).collect()
    )
    assert kept == [3, 4, 6, 7, 8]
    # unknown policy raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        semantic_dedup(semdedup_corpus, SEM_CENTS, keep="nope")


def test_semantic_dedup_tau_one_keeps_everything(spark, semdedup_corpus):
    from llm_aided_ocr_spark.operators.similarity import semantic_dedup

    assert semantic_dedup(semdedup_corpus, SEM_CENTS, tau=1.000001).count() == 8


def test_mean_pool_embeddings_exact_and_layout_independent(spark):
    """Element-wise means via quantized integer sums: hand-checked
    values, layout independence, ragged-dimension behavior."""
    from llm_aided_ocr_spark.operators.similarity import mean_pool_embeddings

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (1, [3.0, 4.0]),
            (2, [10.0]),            # singleton group
            (3, [1.0, 1.0, 9.0]),   # ragged: pos 2 pooled over 1 vector
            (3, [3.0, 3.0]),
        ],
        "doc_id bigint, embedding array<float>",
    )
    out = {r["doc_id"]: r["pooled"] for r in mean_pool_embeddings(df).collect()}
    assert out[1] == [2.0, 3.0]
    assert out[2] == [10.0]
    assert out[3] == [2.0, 2.0, 9.0]
    out2 = {
        r["doc_id"]: r["pooled"]
        for r in mean_pool_embeddings(df.repartition(5)).collect()
    }
    assert out == out2


def test_quantize_embeddings_pinned_rounding(spark):
    """q_i = floor(v_i / (max|v|/127) + 0.5): exact expected integers,
    half-up at the negative boundary, zero vector -> zeros, values
    bounded in [-127, 127]."""
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [1.0, -1.0, 0.5, 0.0]),   # s=1/127: 127, -127, floor(64)=64, 0
        (2, [0.0, 0.0]),               # zero vector
        (3, [-2.0, 1.0]),              # s=2/127: -127, floor(64.0)=64
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["q"] for r in quantize_embeddings(
        df, out_col="q").select("vec_id", "q").collect()}
    assert got[1] == [127, -127, 64, 0]
    assert got[2] == [0, 0]
    assert got[3] == [-127, 64]  # floor(63.5 + 0.5) = 64 (half-up)
    assert all(-127 <= x <= 127 for v in got.values() for x in v)


def test_quantized_topk_ranks_like_cosine(spark):
    """Quantized cosine preserves the exact ranking on well-separated
    vectors and returns integer-exact scores (1.0 for an identical
    direction)."""
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.operators.similarity import quantized_topk

    vecs = [
        (0, [1.0, 0.0]),
        (1, [2.0, 0.0]),     # same direction as 0: cosine exactly 1.0
        (2, [0.0, 1.0]),     # orthogonal
        (3, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = [(r["vec_id"], r["cosine"]) for r in quantized_topk(
        df, q, k=4).orderBy("rank").collect()]
    assert [v for v, _ in got] == [0, 1, 3, 2]
    assert got[0][1] == 1.0 and got[1][1] == 1.0  # integer-exact
    assert got[3][1] == 0.0


def test_mine_bitext_mutual_pairs_and_hub_demotion(spark):
    """True translation pairs (near-identical vectors across sides) are
    mined; a hub vector that is moderately close to EVERYTHING gets a
    margin ~1 and is excluded, even though its raw cosines beat some
    true pairs' — the thing a plain cosine threshold cannot do."""
    from llm_aided_ocr_spark.operators.similarity import mine_bitext

    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.normal(size=(4, 16))
    rows_x, rows_y = [], []
    for i, v in enumerate(base):
        rows_x.append((2 * i, (v + rng.normal(scale=0.01, size=16)).tolist()))
        rows_y.append((2 * i + 1, (v + rng.normal(scale=0.01, size=16)).tolist()))
    # hub on the Y side: the normalized mean of everything
    hub = base.mean(axis=0)
    rows_y.append((99, hub.tolist()))
    x = spark.createDataFrame(rows_x, "vec_id bigint, embedding array<double>")
    y = spark.createDataFrame(rows_y, "vec_id bigint, embedding array<double>")
    got = {(r["x_id"], r["y_id"]): r["margin"]
           for r in mine_bitext(x, y, k=3, threshold=1.02).collect()}
    assert set(got) == {(0, 1), (2, 3), (4, 5), (6, 7)}
    assert all(m > 1.02 for m in got.values())
    assert not any(yid == 99 for _, yid in got)


def test_mine_bitext_mutuality_required(spark):
    """A one-directional best (x's best y whose own best is a different
    x) is not emitted."""
    from llm_aided_ocr_spark.operators.similarity import mine_bitext

    # y0 is closest to BOTH x0 and x1, but y0's best is x0; x1 has no
    # mutual partner (y1 is far from everything)
    x = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    y = spark.createDataFrame(
        [(1, [1.0, 0.05, 0.0]), (3, [0.0, 0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    got = [(r["x_id"], r["y_id"])
           for r in mine_bitext(x, y, k=2, threshold=1.0).collect()]
    assert (0, 1) in got
    assert not any(xid == 2 for xid, _ in got)


def test_hamming_topk_exact_codes(spark):
    """Known sign patterns give known packed words and distances; the
    self-match ranks first at distance 0."""
    from llm_aided_ocr_spark.operators.similarity import (
        hamming_topk,
        sign_codes_col,
    )
    from pyspark.sql import functions as F

    # dim 40 -> words of 32 and 8 bits
    v_pos = [1.0] * 40                  # all bits set
    v_neg = [-1.0] * 40                 # no bits
    v_alt = [1.0 if i % 2 == 0 else -1.0 for i in range(40)]  # 20 bits
    df = spark.createDataFrame(
        [(0, v_pos), (1, v_neg), (2, v_alt)],
        "vec_id bigint, embedding array<double>",
    )
    codes = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id", sign_codes_col(F.col("embedding"), 40).alias("c")
    ).collect()}
    assert codes[0] == [(1 << 32) - 1, 255]
    assert codes[1] == [0, 0]
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = {(r["query_id"], r["vec_id"]): (r["hamming"], r["rank"])
           for r in hamming_topk(df, q, dim=40, k=3).collect()}
    assert got[(0, 0)] == (0, 1)
    assert got[(0, 2)] == (20, 2)
    assert got[(0, 1)] == (40, 3)


def test_rrf_fuse_integer_quantized(spark):
    from llm_aided_ocr_spark.operators.search import rrf_fuse

    rankings = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 2), (3, "a", 3),
         (2, "b", 1), (1, "b", 2)],
        "id bigint, source string, rank long",
    )
    got = {r["id"]: (r["rrf_q"], r["n_sources"])
           for r in rrf_fuse(rankings, k=60, scale=10**6).collect()}
    # id 1: 1e6//61 + 1e6//62 ; id 2: 1e6//62 + 1e6//61 (tie!) ; id 3: 1e6//63
    assert got[1] == (10**6 // 61 + 10**6 // 62, 2)
    assert got[2] == got[1]
    assert got[3] == (10**6 // 63, 1)
