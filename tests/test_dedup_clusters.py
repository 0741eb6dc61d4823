"""Transitive near-dup clustering (VERDICT r4 'Next round' #1): alternating
large-star/small-star connected components over the verified-pairs graph,
checked against a pure-Python union-find on randomized graphs, plus the
partition-refinement fixpoint and keep-list-consistency properties."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from cdc_tools_spark.ops.dedup import (
    cluster_stats,
    connected_components,
    dedup_clusters,
    keep_list_transitive,
)


def _uf_components(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def _pairs_df(spark, edges):
    return spark.createDataFrame(edges, schema="doc_a long, doc_b long")


def test_three_long_chain_collapses_to_one_cluster(spark):
    # A~B, B~C, C~D: pairwise keep_list would keep A and C; transitive
    # clustering must put all four in cluster min=1
    pairs = _pairs_df(spark, [(1, 2), (2, 3), (3, 4)])
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_path_graph_beyond_label_propagation_depth(spark):
    # a 64-long path converges within the round cap (log² n, not diameter)
    edges = [(i, i + 1) for i in range(1, 64)]
    random.Random(7).shuffle(edges)
    comp = connected_components(_pairs_df(spark, edges))
    rows = comp.collect()
    assert len(rows) == 64
    assert {r["cluster_id"] for r in rows} == {1}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(0xDED)
    for trial in range(4):
        n = rng.randrange(20, 120)
        ids = list(range(1, n + 1))
        m = rng.randrange(5, n * 2)
        edges = [tuple(rng.sample(ids, 2)) for _ in range(m)]
        expect = _uf_components(ids, edges)
        docs = spark.createDataFrame([(i,) for i in ids], schema="doc_id long")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup_clusters(docs, _pairs_df(spark, edges)).collect()
        }
        assert got == expect, f"trial {trial}"


def test_clusters_are_a_partition_refinement_fixpoint(spark):
    """Re-running the algorithm on the derived (doc, cluster) assignment
    as its own pair graph must reproduce the assignment exactly — the
    fixpoint property the verdict asks to pin."""
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 20, 21, 22, 99]], schema="doc_id long"
    )
    pairs = _pairs_df(spark, edges)
    first = dedup_clusters(docs, pairs)
    again = dedup_clusters(
        docs,
        first.where(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("cluster_id").alias("doc_a"), F.col("doc_id").alias("doc_b")
        ),
    )
    assert sorted(map(tuple, first.collect())) == sorted(map(tuple, again.collect()))


def test_keep_list_and_stats_consistency(spark):
    edges = [(1, 2), (2, 3), (5, 6)]
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 6]], schema="doc_id long")
    pairs = _pairs_df(spark, edges)
    kept = {r["doc_id"]: r["kept"] for r in keep_list_transitive(docs, pairs).collect()}
    # exactly one survivor per cluster, and it is the minimum; singletons kept
    assert kept == {1: True, 2: False, 3: False, 4: True, 5: True, 6: False}
    stats = {
        r["cluster_id"]: (r["representative"], r["cluster_size"])
        for r in cluster_stats(docs, pairs).collect()
    }
    assert stats == {1: (1, 3), 4: (4, 1), 5: (5, 2)}


def test_empty_and_self_pairs(spark):
    docs = spark.createDataFrame([(1,), (2,)], schema="doc_id long")
    empty = spark.createDataFrame([], schema="doc_a long, doc_b long")
    got = {tuple(r) for r in dedup_clusters(docs, empty).collect()}
    assert got == {(1, 1), (2, 2)}
    selfp = _pairs_df(spark, [(1, 1)])
    got = {tuple(r) for r in dedup_clusters(docs, selfp).collect()}
    assert got == {(1, 1), (2, 2)}


def test_quality_ranked_representatives(spark):
    edges = [(1, 2), (2, 3), (5, 6)]
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 6]], schema="doc_id long")
    pairs = _pairs_df(spark, edges)
    # quality: 2 beats 1 and 3; 5 and 6 tie -> lower id (5) wins; 4 unscored
    quality = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 50.0), (5, 7.0), (6, 7.0)],
        schema="doc_id long, score double",
    )
    from cdc_tools_spark.ops.dedup import cluster_representatives, keep_list_quality

    reps = {r["cluster_id"]: r["representative"]
            for r in cluster_representatives(docs, pairs, quality).collect()}
    assert reps == {1: 2, 4: 4, 5: 5}
    kept = {r["doc_id"]: r["kept"] for r in keep_list_quality(docs, pairs, quality).collect()}
    assert kept == {1: False, 2: True, 3: False, 4: True, 5: True, 6: False}
    # default (no quality): min-id representative
    reps_min = {r["cluster_id"]: r["representative"]
                for r in cluster_representatives(docs, pairs).collect()}
    assert reps_min == {1: 1, 4: 4, 5: 5}


def test_kmeans_train_properties(spark):
    from cdc_tools_spark.ops.similarity import ivf_assignments, kmeans_train

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c0 = kmeans_train(emb, k=8, n_iter=0)  # init only = the 8 lowest-id vecs
    got0 = {r["list_id"]: [round(x, 6) for x in r["centroid"]] for r in c0.collect()}
    raw = {int(r["vec_id"]): [round(float(x), 6) for x in r["embedding"]]
           for r in emb.where("vec_id < 8").collect()}
    assert got0 == raw

    c2a = kmeans_train(emb, k=8, n_iter=2)
    c2b = kmeans_train(emb, k=8, n_iter=2)
    key = lambda df: sorted(
        (r["list_id"], tuple(round(x, 9) for x in r["centroid"])) for r in df.collect()
    )
    assert key(c2a) == key(c2b)  # deterministic run-to-run

    # training reduces mean within-cluster distance vs the untrained init
    def mean_cos(cents):
        a = ivf_assignments(
            emb, n_probe=1,
            centroids=cents.selectExpr("list_id as vec_id", "centroid as embedding"),
        )
        from cdc_tools_spark.ops.similarity import _as_double, cosine
        import pyspark.sql.functions as F
        joined = (
            a.join(emb, "vec_id")
            .join(
                cents.withColumnRenamed("list_id", "list_id2"),
                F.col("list_id") == F.col("list_id2"),
            )
        )
        return joined.agg(
            F.avg(cosine(F.col("embedding"), F.col("centroid")))
        ).first()[0]

    assert mean_cos(c2a) > mean_cos(c0)


def test_incremental_neardup_equals_batch_at_once(spark, tmp_path):
    """Incremental discovery+verify over (batch, corpus) must reproduce
    exactly the full-corpus pipeline's pairs that touch the batch — and
    the corpus index must survive a parquet round trip (the persisted
    form a production pipeline would probe)."""
    from cdc_tools_spark.ops.dedup import (
        lsh_band_index,
        neardup_pairs,
        neardup_pairs_incremental,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.where((F.col("doc_id") % 7) == 0)
    corpus = docs.where((F.col("doc_id") % 7) != 0)

    full = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in neardup_pairs(docs, threshold=0.3).collect()
        if r["doc_a"] % 7 == 0 or r["doc_b"] % 7 == 0
    }
    inc = {
        tuple(r)
        for r in neardup_pairs_incremental(new, corpus, threshold=0.3).collect()
    }
    assert inc == full and len(inc) > 0

    # persisted-index path: write/read the band index, probe against it
    idx_path = str(tmp_path / "band_index")
    lsh_band_index(corpus).write.parquet(idx_path)
    inc2 = {
        tuple(r)
        for r in neardup_pairs_incremental(
            new, corpus, threshold=0.3,
            corpus_index=spark.read.parquet(idx_path),
        ).collect()
    }
    assert inc2 == full


def test_cluster_plans_have_no_cartesian_or_bnlj(spark):
    """Scale gate: every join in the clustering path is an equi-join —
    no CartesianProduct / BroadcastNestedLoopJoin anywhere in the final
    assignment plan (the same plan-inspection contract the registered
    ANN queries carry)."""
    edges = [(i, i + 1) for i in range(1, 30)]
    docs = spark.createDataFrame([(i,) for i in range(1, 40)], schema="doc_id long")
    out = dedup_clusters(docs, _pairs_df(spark, edges))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_block_discovery_has_perfect_recall_at_hamming_3(spark):
    """Pigeonhole gate: every pair within hamming <= 3 of 4-block SimHash
    discovery MUST be a candidate (perfect recall), verified against a
    brute-force driver-side hamming over the full corpus signature set."""
    from cdc_tools_spark.ops.dedup import simhash, simhash_neardup_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(sigs)
    brute = {
        (a, b, sum(x != y for x, y in zip(sigs[a], sigs[b])))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if sum(x != y for x, y in zip(sigs[a], sigs[b])) <= 3
    }
    got = {
        tuple(r)
        for r in simhash_neardup_pairs(
            docs, max_hamming=3, n_blocks=4, max_block_freq=10**9
        ).collect()
    }
    assert got == brute and len(brute) > 0

    # parameter guard: recall promise requires max_hamming < n_blocks
    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_neardup_pairs(docs, max_hamming=4, n_blocks=4)


def test_winnowing_guarantee_and_density(spark):
    """Winnowing law (Schleimer et al.): any shared substring of length
    >= k + window - 1 yields at least one identical selected fingerprint
    in both docs; and the selected set is much sparser than all k-grams."""
    from cdc_tools_spark.ops.dedup import winnow_candidates, winnow_fingerprints

    lifted = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "AAAA " + lifted + " BBBB entirely different tail content here"),
        (2, "XXXX prefix unrelated words " + lifted + " YYYY other ending"),
        (3, "no overlap with anything else at all in this one document z"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    fps = winnow_fingerprints(df, k=8, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # guarantee: docs 1 and 2 share the lifted sentence -> shared fps
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3] and by_doc[2] & by_doc[3])
    # density: winnowed set ~ 2/(w+1) of the full k-gram count
    n_grams_1 = len(rows[0][1].strip()) - 7
    assert len(by_doc[1]) < 0.6 * n_grams_1

    cand = {(r["doc_a"], r["doc_b"]) for r in
            winnow_candidates(df, min_shared=3, k=8, window=4).collect()}
    assert cand == {(1, 2)}
