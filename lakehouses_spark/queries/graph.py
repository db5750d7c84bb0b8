"""Iterative graph analytics over the warehouse's natural bipartite graph
(customers ↔ suppliers through order lineitems).

The library already ships one iterative-fixpoint operator (connected
components, `queries/dedup.py::connected_components`); PageRank adds the
other canonical shape: a K-step iterative refinement where each step is a
join + re-aggregation of a SMALL state table (one row per node) against a
LARGE static edge table. The 100 TB design point: the edge list is
materialized ONCE (localCheckpoint) and every iteration shuffles only on
the same src/dst keys — the per-iteration state is O(nodes), never
O(edges), and the driver holds no graph data.

Oracle: the same 5 iterations unrolled as a DuckDB CTE chain — a fully
SQL-expressible check of an "iterative algorithm" (the class VERDICT r1/r2
could only rows-check via ALS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouses_spark.io import load_table
from lakehouses_spark.registry import query

DAMPING = 0.85
N_ITER = 5

_ITER_TPL = f"""
r{{k}} AS (
  SELECT e.dst AS node_id,
         {1 - DAMPING} / (SELECT n FROM nn) + {DAMPING} * sum(p.rank / d.deg) AS rank
  FROM edges e
  JOIN r{{j}} p ON e.src = p.node_id
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
)"""

_PAGERANK_ORACLE = f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT cust * 2 AS src, supp * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT supp * 2 + 1 AS src, cust * 2 AS dst FROM pairs
    ), deg AS (
      SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src
    ), nn AS (
      SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM edges
    ), r0 AS (
      SELECT src AS node_id, 1.0 / (SELECT n FROM nn) AS rank FROM deg
    ),{",".join(_ITER_TPL.format(k=k, j=k - 1) for k in range(1, N_ITER + 1))}
    SELECT node_id, round(rank, 9) AS rank
    FROM r{N_ITER}
    ORDER BY round(rank, 9) DESC, node_id
    LIMIT 50
"""


def pagerank(edges: DataFrame, n_iter: int = N_ITER,
             damping: float = DAMPING) -> DataFrame:
    """PageRank over a directed edge list (src, dst), every node assumed to
    have out-degree ≥ 1 (callers with dangling nodes should symmetrize or
    add self-loops first — the bipartite builder below symmetrizes).

    Each iteration: ranks ⋈ edges on src → sum contributions per dst. The
    edge table (with out-degrees attached) is materialized once and
    re-partitioned by src, so every iteration's join shuffles only the
    O(nodes) rank table; contributions aggregate map-side before the dst
    shuffle."""
    edges = edges.localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    edges_deg = edges.join(deg, "src").localCheckpoint()
    # node count: a bounded scalar (one number), same role as the oracle's
    # scalar subquery
    n = float(edges.select("src").distinct().count())
    ranks = deg.select("src", F.lit(1.0 / n).alias("rank")).withColumnRenamed(
        "src", "node_id"
    )
    for _ in range(n_iter):
        ranks = (
            edges_deg.join(ranks, edges_deg.src == ranks.node_id)
            .groupBy("dst")
            .agg(
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.sum(F.col("rank") / F.col("deg"))
                ).alias("rank")
            )
            .withColumnRenamed("dst", "node_id")
        )
    return ranks


@query("graph_pagerank", oracle=_PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 PageRank nodes of the symmetrized customer↔supplier bipartite
    graph (edge = the customer ordered a lineitem shipped by the supplier).
    Node ids disambiguate the two classes arithmetically (cust*2 / supp*2+1).
    Ordering and the top-50 cutoff use the ROUNDED rank so an ulp-level
    summation difference between engines can never flip the boundary."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    fwd = pairs.select(
        (F.col("o_custkey") * 2).alias("src"), (F.col("l_suppkey") * 2 + 1).alias("dst")
    )
    rev = pairs.select(
        (F.col("l_suppkey") * 2 + 1).alias("src"), (F.col("o_custkey") * 2).alias("dst")
    )
    ranks = pagerank(fwd.unionByName(rev))
    return (
        ranks.select("node_id", F.round("rank", 9).alias("rank"))
        .orderBy(F.desc("rank"), "node_id")
        .limit(50)
    )


_TRIANGLE_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), positions AS (
      SELECT doc_id, words,
             unnest(generate_series(1, greatest(len(words) - 2, 1))) AS i
      FROM toks
    ), shingles AS (
      SELECT DISTINCT doc_id,
             words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS shingle
      FROM positions
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id
    ), shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      FROM shingles a
      JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_a, doc_b
      FROM shared
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_shared / (sa.n + sb.n - n_shared) >= 0.3
    )
    SELECT e1.doc_a AS doc_a, e1.doc_b AS doc_b, e2.doc_b AS doc_c
    FROM pairs e1
    JOIN pairs e2 ON e1.doc_b = e2.doc_a
    JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ORDER BY doc_a, doc_b, doc_c
"""


@query("graph_triangles", oracle=_TRIANGLE_ORACLE)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the near-dup pair graph (edges = ngram
    Jaccard ≥ 0.3 pairs, a < b): each output row is a mutually-near-dup
    triple — the density diagnostic that distinguishes chain-shaped
    clusters (transitive-closure artifacts: A≈B≈C but A≉C) from genuinely
    dense duplicate groups before a keep-list collapses them.

    100 TB shape: the classic distributed triangle count — edges are
    oriented (a < b) so each triangle is enumerated exactly once with no
    permutation dedup, and both joins key on single doc ids whose fan-out
    is the doc's near-dup degree (bounded; the stop-shingle cut already
    removed the hot-key mass upstream). The edge list is materialized once
    (localCheckpoint) and reused by both sides of the wedge join."""
    from lakehouses_spark.queries.dedup import (
        hashed_shingle_sets,
        ngram_candidate_pairs,
        verify_jaccard,
    )
    from lakehouses_spark.io import spread

    d = spread(load_table(spark, sf_dir, "documents"))
    sets = hashed_shingle_sets(d).localCheckpoint()
    # r12: candidate generation now passes jaccard_prefix=0.3 like
    # dedup_ngram_jaccard (this was the one threshold caller still on the
    # unfiltered inverted-index self-join): the PPJoin prefix+length+
    # positional set is recall-exact for the 0.3 threshold and exact
    # verification gates every pair, so the edge set is unchanged while the
    # candidate join prunes ~t of all postings before the pair shuffle.
    cand = ngram_candidate_pairs(sets, jaccard_prefix=0.3).localCheckpoint()
    edges = (
        verify_jaccard(cand, sets, threshold=0.3)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    return (
        e1.join(e2, F.col("e1.doc_b") == F.col("e2.doc_a"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .select(
            F.col("e1.doc_a").alias("doc_a"),
            F.col("e1.doc_b").alias("doc_b"),
            F.col("e2.doc_b").alias("doc_c"),
        )
        .orderBy("doc_a", "doc_b", "doc_c")
    )
