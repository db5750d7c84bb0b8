"""Connected-components dedup clustering: known graph structures resolve to
the right clusters; the end-to-end keep-list is consistent with the pair
set."""

from __future__ import annotations

from lakehouses_spark.queries.dedup import connected_components
from lakehouses_spark.registry import load_all_queries

SF = "/root/testdata/sf0.01"
REGISTRY = load_all_queries()


def test_components_on_known_graph(spark):
    # two chains and an isolated pair: {1-2-3-4}, {10-11}, {20-21-22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "doc_a long, doc_b long",
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_components_long_chain_converges(spark):
    # a 12-node path needs several propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert set(got.values()) == {0} and len(got) == 13


def test_dedup_clusters_consistent_with_pairs(spark):
    pairs = REGISTRY["dedup_ngram_jaccard"].fn(spark, SF)
    clusters = REGISTRY["dedup_clusters"].fn(spark, SF)
    n_docs_in_pairs = (
        pairs.selectExpr("doc_a AS d").union(pairs.selectExpr("doc_b AS d"))
        .distinct().count()
    )
    rows = clusters.collect()
    assert sum(r.n_members for r in rows) == n_docs_in_pairs
    assert all(r.n_members >= 2 for r in rows)  # singletons never enter the graph
