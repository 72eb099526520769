"""Token-budget sequence packing tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pack(spark, rows, budget, streams=1):
    from llm_aided_ocr_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(rows, "doc_id bigint, n_tok int")
    return {
        r["doc_id"]: r["bin_ix"]
        for r in pack_sequences(
            df, budget=budget, token_col=F.col("n_tok"), num_streams=streams
        ).collect()
    }


def test_greedy_fill_semantics(spark):
    # budget 10: [4,4,4] -> bins 0,0,1; oversized 25 -> own bin; next opens new
    rows = [(0, 4), (1, 4), (2, 4), (3, 25), (4, 1), (5, 9), (6, 1)]
    got = _pack(spark, rows, budget=10)
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 3, 6: 4}


def test_streams_pack_independently_and_deterministically(spark):
    from llm_aided_ocr_spark.operators.packing import pack_sequences

    rows = [(i, 3 + (i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tok int")
    a = pack_sequences(df, budget=12, token_col=F.col("n_tok"), num_streams=4)
    b = pack_sequences(
        df.repartition(7), budget=12, token_col=F.col("n_tok"), num_streams=4
    )
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb, "packing must not depend on physical partitioning"
    # every doc in its id%4 stream
    assert all(r[1] == r[0] % 4 for r in ra)


def test_string_ids_pack_via_hash_routing(spark):
    # url-keyed corpora (the pipeline's native id) must pack: streams come
    # from pmod(xxhash64(url), n) — a numeric % on strings throws under
    # ANSI — and the output doc_id keeps the string type. In-stream visit
    # order is lexicographic ascending.
    from llm_aided_ocr_spark.operators.packing import pack_sequences

    rows = [(f"u{i:03d}", 4) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    out = pack_sequences(df, budget=10, token_col=F.col("n_tok"), num_streams=3)
    assert dict(out.dtypes)["doc_id"] == "string"
    got = sorted((r["stream"], r["doc_id"], r["bin_ix"]) for r in out.collect())
    assert len(got) == 40
    # greedy in lexicographic order: within a stream, bin_ix is
    # nondecreasing and each bin holds exactly 2 docs of 4 tokens
    from itertools import groupby

    for stream, grp in groupby(got, key=lambda r: r[0]):
        grp = list(grp)
        bins = [b for _, _, b in grp]
        assert bins == sorted(bins)
        for _, members in groupby(grp, key=lambda r: r[2]):
            assert len(list(members)) <= 2


def test_packing_stats_fill_bound(spark):
    from llm_aided_ocr_spark.operators.packing import pack_sequences, packing_stats

    rows = [(i, 5) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tok int")
    packed = pack_sequences(df, budget=10, token_col=F.col("n_tok"), num_streams=2)
    stats = {r["stream"]: r for r in packing_stats(packed, budget=10).collect()}
    for s in (0, 1):
        assert stats[s]["n_docs"] == 20
        assert stats[s]["n_bins"] == 10          # 2 docs of 5 per bin
        assert stats[s]["mean_fill_ratio"] == 1.0
        assert stats[s]["total_tokens"] == 100
