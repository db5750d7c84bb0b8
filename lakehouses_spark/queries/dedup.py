"""Deduplication operators over `documents` (SURVEY §2.12 north star).

Five tiers, each with the 100 TB story spelled out:

- exact:   group by content digest (sha256) — one shuffle keyed on the digest,
           never on the raw text.
- n-gram:  3-word shingles + Jaccard via an inverted-index self-join — the
           shuffle key is the 8-byte shingle hash (strings never shuffle),
           and common-shingle skew is the risk; at scale, drop
           top-frequency shingles (stop-shingles) first.
- MinHash: k independent min-hashes over shingles + LSH banding — candidate
           generation cost is linear in corpus size; the only pairwise work
           happens inside tiny band buckets. Deterministic seeds (xxhash64 of
           shingle ⊕ seed index) so results are reproducible run-to-run.
- SimHash: 64-bit weighted-bit signature via an Arrow-batched pandas UDF
           (bit-twiddling over token hashes is the one part built-ins can't
           express cleanly); block-table buckets + popcount filter give
           candidates, exact Jaccard verifies.
- embedding-cosine: semantic near-dups via the embeddings table — exact
           tiled-matmul pairs at moderate thresholds (sim_pairs_blocked),
           ANN buckets at near-dup thresholds, clustered into keep-lists.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from lakehouses_spark.io import explode_nonempty, load_table, spread
from lakehouses_spark.registry import query

# --- shared shingle expression (3-word shingles over whitespace tokens) -----


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


def _raw_shingles(col: str = "text"):
    w = _words(col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - 3, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i + 1), F.element_at(w, i + 2), F.element_at(w, i + 3)
        ),
    )


def _hashed_shingles(col: str = "text"):
    """Distinct 3-word shingles pre-hashed to 8-byte keys (xxhash64).

    Everything downstream — the inverted index, MinHash signatures, and
    exact-Jaccard verification — consumes these longs, never the shingle
    strings: shuffle rows and checkpoint bytes shrink ~3×, and set
    intersection compares 8-byte integers instead of ~20-byte strings.
    Jaccard over the hashed sets equals Jaccard over the string sets unless
    xxhash64 collides within a document pair's union (P ≈ m²/2⁶⁵ for m
    distinct shingles — ~1e-9 at probe scale); the DuckDB oracles compute
    the string-exact value, so a collision would surface as a hash-row
    MISMATCH, not slip through silently."""
    return F.array_distinct(F.transform(_raw_shingles(col), lambda s: F.xxhash64(s)))


def hashed_shingle_sets(d: DataFrame) -> DataFrame:
    """(doc_id, hs: array<long>) — the materialization unit the dedup tier
    shares across candidate generation and verification.

    The token array is projected as a REAL attribute before the shingle
    transform: embedding `split(text)` inside the lambda copies the split
    into every `element_at`, re-tokenizing the whole document once per
    shingle element (measured 10.7 s vs 1.4 s for the ×64 corpus).
    Catalyst leaves the two projections split because the alias is
    referenced multiple times and is not cheap."""
    w = F.col("__w")
    raw = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - 3, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i + 1), F.element_at(w, i + 2),
            F.element_at(w, i + 3),
        ),
    )
    hs = F.array_distinct(F.transform(raw, lambda s: F.xxhash64(s)))
    return (
        d.select("doc_id", _words().alias("__w"))
        .select("doc_id", hs.alias("hs"))
    )


@query(
    "dedup_exact",
    oracle="""
    SELECT min(doc_id)  AS canonical_id,
           count(*)     AS n_copies,
           sha256(text) AS content_hash
    FROM documents
    GROUP BY sha256(text)
    ORDER BY canonical_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on a content digest. Shuffling 32-byte
    digests instead of document bodies keeps shuffle volume flat regardless
    of document size."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("canonical_id", "n_copies", "content_hash")
        .orderBy("canonical_id")
    )


@query(
    "dedup_ngram_jaccard",
    oracle="""
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
      FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_shared / (sa.n + sb.n - n_shared), 4) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_shared / (sa.n + sb.n - n_shared) >= 0.3
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-gram shingle Jaccard ≥ 0.3: inverted-index
    candidate generation (with the stop-shingle skew cut) + exact
    verification over the full shingle sets. Reported jaccard is always the
    exact value — the df cut only prunes candidate *generation*."""
    d = spread(load_table(spark, sf_dir, "documents"))
    shingle_sets = hashed_shingle_sets(d).localCheckpoint()
    # candidates materialized once: verification joins them against the
    # shingle sets twice (doc_a, doc_b sides) and must not re-run the
    # index/self-join pipeline per branch
    cand = ngram_candidate_pairs(shingle_sets, jaccard_prefix=0.3).localCheckpoint()
    return verify_jaccard(cand, shingle_sets, threshold=0.3)


# Stop-shingle cut: a shingle present in more than max(STOP_SHINGLE_MIN_DF,
# STOP_SHINGLE_FRAC · n_docs) documents is dropped from the inverted index
# BEFORE the self-join. One hot shingle ("the the the") otherwise produces a
# df² pair explosion on a single shuffle key — the classic skew that stalls a
# 1000-executor job on one straggler task. Ubiquitous shingles carry no
# near-dup signal: any true near-dup pair (jaccard ≥ 0.3) shares many rare
# shingles too, so recall is preserved (pinned by the pytest fixture).
STOP_SHINGLE_FRAC = 0.05
STOP_SHINGLE_MIN_DF = 16


SHORT_DOC_SHINGLES = 64  # containment tier: docs below this keep ALL shingles

# corpus-size guard for broadcasting the shingle df table into the rank join
# (see ngram_candidate_pairs); past this the shuffle join is the right plan
DF_BROADCAST_MAX_DOCS = 2_000_000


def ngram_candidate_pairs(
    shingle_sets: DataFrame,
    stop_frac: float = STOP_SHINGLE_FRAC,
    min_df: int = STOP_SHINGLE_MIN_DF,
    keep_short_docs: int | None = None,
    containment_threshold: float = 0.5,
    jaccard_prefix: float | None = None,
    containment_prefix: float | None = None,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing ≥1 non-stop shingle. The
    inverted index is keyed on the 8-byte shingle hash — long-keyed shuffle
    and join, never strings.

    ``keep_short_docs``: containment-tier recall guarantee (ADVICE r4 #4).
    The Jaccard recall argument — a true pair shares many shingles, so some
    survive the stop cut — fails for containment of a SHORT doc whose few
    shingles are all ubiquitous boilerplate (exactly the excerpt case the
    containment tier exists for). Docs with fewer than that many shingles
    additionally probe the UNFILTERED index — retention on the short side
    alone wouldn't help, since the containing doc's matching postings are
    what the cut drops.

    Prefix probe (VERDICT r5 #4): the short doc does NOT probe its full
    shingle set — only its ⌊(1−t)·|A|⌋+1 globally RAREST shingles, where t
    is ``containment_threshold``. Exact by pigeonhole: a qualifying pair
    shares ≥ ⌈t·|A|⌉ of A's shingles, and A has only |A|−⌈t·|A|⌉ shingles
    OUTSIDE the intersection, so any (|A|−⌈t·|A|⌉+1)-subset must hit a
    shared one — no ordering assumption needed, so rarest-first is purely a
    cost choice. It is also THE cost choice: the r5 full-probe's α=0.80
    came from short docs probing their hot shingles (df ∝ corpus → a
    quadratic component); rarest-first makes the probed Σ df(h) the
    smallest available, and hot shingles are touched only by pathological
    all-boilerplate docs — at half the previous posting volume even then.
    Recall stays pinned by
    test_quality.py::test_containment_short_doc_hot_shingles_recall;
    exact verification still gates every emitted pair.

    ``jaccard_prefix`` / ``containment_prefix`` select the main-join filter
    family (mutually exclusive; jaccard wins if both set): the symmetric
    PPJoin prefix+length+positional set for a Jaccard threshold, or the
    asymmetric prefix-probe × full-index variant for a containment
    threshold (see the respective branches)."""
    n_docs = shingle_sets.count()  # already checkpointed by callers
    cut = max(min_df, int(stop_frac * n_docs))
    exploded = shingle_sets.select(
        "doc_id", F.size("hs").alias("n_sh"), F.explode("hs").alias("h")
    )
    # materialized once: the df table feeds the hot cut AND the rank join —
    # without this the 16M-row explode+aggregate executes twice
    dfs = exploded.groupBy("h").agg(F.count(F.lit(1)).alias("df")).localCheckpoint()
    # The rank join attaches df to every posting. Below DF_BROADCAST_MAX_DOCS
    # the distinct-shingle table is tens of MB (measured 1.7M entries / ~35MB
    # at 320k docs — vocabulary grows sublinearly once the corpus shares a
    # language), so shipping it to every executor beats shuffling the full
    # posting set by h; past the guard it falls back to the shuffle join,
    # which is the 100 TB shape (the df table there is itself huge).
    dfs_for_rank = F.broadcast(dfs) if n_docs <= DF_BROADCAST_MAX_DOCS else dfs
    hot = dfs.where(F.col("df") > cut).select("h")
    # the hot set is tiny by definition (heavy hitters) → broadcast anti-join
    filtered = exploded.join(F.broadcast(hot), "h", "left_anti").select(
        "doc_id", "n_sh", "h"
    )
    if jaccard_prefix is not None:
        # AllPairs/PPJoin prefix filter (Bayardo et al., public literature):
        # under ONE global order (ascending df, tie-broken by hash), two
        # sets with jaccard ≥ t — hence overlap o ≥ t·max(|A|,|B|) ≥ t·|d|
        # for each — must share an element within their first |d|−⌈t·|d|⌉+1
        # elements. Indexing ONLY that prefix is therefore recall-exact for
        # the Jaccard threshold, drops ~t of all postings, and — because
        # the order is rarest-first — what it drops is each doc's most
        # frequent shingles, the df² contributors the stop cut can only
        # catch once they cross the global df threshold. (Composing with
        # the stop cut keeps recall heuristic in the pathological
        # both-docs-≥(1−t)-hot corner; the exact verification stage still
        # gates every emitted pair, and the oracle parity tests run with
        # the prefix active.)
        from pyspark.sql import Window

        # l=2 ADAPTIVE prefix (VERDICT r6 #7; Wang et al. "adaptive prefix
        # filtering", public literature): extend every prefix by ONE element
        # and require ≥2 shared prefix elements per pair downstream. Exact
        # by the same pigeonhole, one step further: a qualifying pair has
        # overlap o ≥ ⌈t·n_d⌉ per doc, so each doc holds ≤ n_d − o
        # non-shared elements, putting the TWO globally-smallest shared
        # elements within the first n_d − o + 2 of BOTH docs — two
        # guaranteed join rows. Every 1-collision candidate (the vast
        # majority of false pairs at t=0.3: measured 5.2M candidates for
        # 4,096 true pairs at ×16 before this) dies in the pair-count
        # filter instead of reaching exact verification.
        filtered = (
            filtered.join(dfs_for_rank, "h")
            .withColumn(
                "rank",
                F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "h")),
            )
            .where(
                F.col("rank")
                <= F.floor(F.col("n_sh") * (1.0 - jaccard_prefix) + 1e-9) + 2
            )
        )
    if jaccard_prefix is not None:
        # PPJoin length + positional filters (Xiao et al., WWW'08 — public
        # literature), both recall-exact given the prefix:
        #   length: J(A,B) ≥ t ⟹ |A∩B| ≥ t·max(|A|,|B|) and |A∩B| ≤
        #     min(|A|,|B|), so t·|B| ≤ |A| and t·|A| ≤ |B| — pairs with
        #     incompatible sizes can never qualify.
        #   positional: under the one global (df, h) order, the EARLIEST
        #     shared element h* at ranks (r_a, r_b) has every other shared
        #     element after it in BOTH sets, so the overlap is bounded by
        #     1 + min(|A|−r_a, |B|−r_b); a qualifying pair needs overlap
        #     ≥ ⌈t/(1+t)·(|A|+|B|)⌉ (the Jaccard-equivalent overlap
        #     threshold), and h* always satisfies the bound — filtering
        #     each joined posting row keeps every qualifying pair via its
        #     h* row while dropping tail-of-prefix collisions between
        #     dissimilar docs BEFORE the distinct + verify shuffles.
        #     (Survivor rank equals full-set global rank: the stop cut
        #     removes only the highest-df tail, and n_sh is the full size,
        #     so the suffix bound counts cut elements too, as the proof
        #     requires.)
        t = float(jaccard_prefix)
        idx = filtered.select("doc_id", "n_sh", "rank", "h")
        a = idx.alias("a")
        b = idx.alias("b")
        overlap_needed = F.ceil(
            F.lit(t / (1.0 + t)) * (F.col("a.n_sh") + F.col("b.n_sh")) - 1e-9
        )
        # positional bound relaxed by 1 for the l=2 prefix: the SECOND
        # smallest shared element has only o−2 shared elements after it in
        # each set, so its row satisfies 2 + min(suffix) ≥ o — both
        # guaranteed rows survive this filter (the l=1 bound would drop the
        # second row of exactly-threshold pairs and break the count filter)
        suffix_bound = 2 + F.least(
            F.col("a.n_sh") - F.col("a.rank"), F.col("b.n_sh") - F.col("b.rank")
        )
        joined = (
            a.join(
                b,
                (F.col("a.h") == F.col("b.h"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .where(
                (F.col("a.n_sh") * t <= F.col("b.n_sh") + 1e-9)
                & (F.col("b.n_sh") * t <= F.col("a.n_sh") + 1e-9)
                & (suffix_bound >= overlap_needed)
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.n_sh").alias("na"),
                F.col("b.n_sh").alias("nb"),
            )
        )
        # pair-count filter: ≥2 shared prefix elements, except when the
        # pair's required overlap is itself 1 (tiny docs — only one shared
        # element may exist). Doubles as the distinct (same shuffle the
        # old .distinct() paid), so the shared tail below must not re-pay.
        o_pair = F.ceil(F.lit(t / (1.0 + t)) * (F.col("na") + F.col("nb")) - 1e-9)
        pairs = (
            joined.groupBy("doc_a", "doc_b", "na", "nb")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .where((F.col("n_hits") >= 2) | (o_pair <= 1))
            .select("doc_a", "doc_b")
        )
        if keep_short_docs is None:
            return pairs  # already distinct via the groupBy
    elif containment_prefix is not None:
        # Containment-adapted PPJoin (asymmetric): C(A,B) = |A∩B|/min ≥ t
        # constrains only the SMALLER doc A — overlap o ≥ ⌈t·|A|⌉.
        #   prefix probe: pigeonhole over A's first |A|−⌈t·|A|⌉+1 elements
        #     (global rarest-first order) — some prefix element is shared
        #     with B's FULL postings, so prefix(probe) ⋈ full(index) with
        #     probe.n_sh ≤ index.n_sh finds every qualifying pair while
        #     probing ~(1−t) of each doc's postings (t=0.5 → half).
        #   positional (index side): the EARLIEST shared element h* at full
        #     rank r_b has the o−1 later shared elements after it in B, so
        #     r_b ≤ |B|−⌈t·|A|⌉+1; survivor rank ≤ full rank, so filtering
        #     on it never drops h* — tail-of-index collisions go before the
        #     distinct. No length filter exists for containment (sizes are
        #     unconstrained by design — that asymmetry is the tier's point).
        # Same stop-cut composition caveat as the Jaccard branch; the
        # keep_short_docs unfiltered probe below still covers the
        # all-boilerplate short-doc corner, and exact verification gates
        # every emitted pair.
        from pyspark.sql import Window

        t = float(containment_prefix)
        wp = Window.partitionBy("doc_id").orderBy("df", "h")
        ranked = (
            filtered.join(dfs_for_rank, "h")
            .withColumn("rank", F.row_number().over(wp))
            .select("doc_id", "n_sh", "rank", "h")
        )
        probe = ranked.where(
            F.col("rank") <= F.floor(F.col("n_sh") * (1.0 - t) + 1e-9) + 1
        )
        a = probe.alias("a")
        b = ranked.alias("b")
        needed = F.ceil(F.lit(t) * F.col("a.n_sh") - 1e-9)
        pairs = (
            a.join(
                b,
                (F.col("a.h") == F.col("b.h"))
                & (
                    (F.col("a.n_sh") < F.col("b.n_sh"))
                    | (
                        (F.col("a.n_sh") == F.col("b.n_sh"))
                        & (F.col("a.doc_id") < F.col("b.doc_id"))
                    )
                ),
            )
            .where(F.col("b.rank") <= F.col("b.n_sh") - needed + 1)
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            )
        )
    else:
        filtered = filtered.select("doc_id", "h")
        a = filtered.alias("a")
        b = filtered.alias("b")
        pairs = a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    if keep_short_docs is not None:
        from pyspark.sql import Window

        shorts = exploded.where(F.col("n_sh") < keep_short_docs).select(
            F.col("doc_id").alias("s_doc"), "n_sh", "h"
        )
        # rarest-first prefix: broadcast the (tiny) short-doc postings into
        # one pass over the df table, rank within each short doc by global
        # df, keep the pigeonhole prefix
        w = Window.partitionBy("s_doc").orderBy("df", "h")
        prefix = (
            F.broadcast(shorts)
            .join(dfs, "h")
            .withColumn("rank", F.row_number().over(w))
            .where(
                # +1e-9 guards the floor against FP error at exact-integer
                # products ((1-t)·n landing at 30.999999…)
                F.col("rank")
                <= F.floor(F.col("n_sh") * (1.0 - containment_threshold) + 1e-9) + 1
            )
            .select("s_doc", "h")
        )
        extra = (
            F.broadcast(prefix)
            .join(exploded.select(F.col("doc_id").alias("o_doc"), "h"), "h")
            .where(F.col("s_doc") != F.col("o_doc"))
            .select(
                F.least("s_doc", "o_doc").alias("doc_a"),
                F.greatest("s_doc", "o_doc").alias("doc_b"),
            )
        )
        pairs = pairs.unionByName(extra)
    return pairs.distinct()


def verify_jaccard(
    candidates: DataFrame, shingle_sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard over the FULL (hashed) shingle sets for candidate pairs
    only — integer-set intersection, identical to the string-set value
    absent an in-pair xxhash64 collision (see _hashed_shingles).

    The threshold filter compares the UNROUNDED ratio (matching the oracle
    SQL's WHERE clause); round(.,4) is applied only in the projected column —
    filtering on the rounded value would admit pairs in [thr-5e-5, thr).
    """
    sa = shingle_sets.alias("sa")
    sb = shingle_sets.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.hs"), F.col("sb.hs")))
    union = F.size(F.array_union(F.col("sa.hs"), F.col("sb.hs")))
    return (
        candidates.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where((inter / union) >= threshold)
        .select("doc_a", "doc_b", F.round(inter / union, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


N_MINHASH = 32  # signature length
LSH_BANDS = 8  # 8 bands × 4 rows — candidate threshold ≈ (1/8)^(1/4) ≈ 0.6

# Twin injection (mirrors similarity.py's ANN upgrade): the approximate dedup
# paths are hash-function-specific, so they can't be oracled directly — but
# their END-TO-END CONTRACT (find every near-dup pair, invent none) can be.
# The driver queries append one marker word to the first N_DOC_TWINS docs
# (jaccard vs the original ≈ (W-2)/W ≥ 0.9 on this corpus) and the oracle is
# the EXACT inverted-index ngram-Jaccard pair set over the same augmented
# corpus: the LSH/SimHash candidate generation only hash-matches if it
# recovers every true pair — full recall — and exact verification guarantees
# zero invented pairs.
N_DOC_TWINS = 25
DOC_TWIN_ID_OFFSET = 1_000_000
DOC_TWIN_SUFFIX = "zztwinmark"


def with_doc_twins(d: DataFrame) -> DataFrame:
    """Corpus ∪ deterministic near-duplicate documents (1 appended word)."""
    base = d.select("doc_id", "text")
    twins = base.where(F.col("doc_id") < N_DOC_TWINS).select(
        (F.col("doc_id") + DOC_TWIN_ID_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" " + DOC_TWIN_SUFFIX)).alias("text"),
    )
    return base.unionByName(twins)


_TWIN_PAIR_ORACLE = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DOC_TWIN_ID_OFFSET} AS doc_id,
             text || ' {DOC_TWIN_SUFFIX}' AS text
      FROM documents WHERE doc_id < {N_DOC_TWINS}
    ), toks AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM corpus
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
      FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_shared / (sa.n + sb.n - n_shared), 4) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_shared / (sa.n + sb.n - n_shared) >= 0.3
    ORDER BY doc_a, doc_b
    """


def minhash_buckets(shingle_sets: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id[, *keep], buckets: array<long>[LSH_BANDS]) — banded MinHash
    signature, shared by the batch LSH tier and the incremental index.

    signature[j] = min over shingles of xxhash64(shingle_hash, seed=j) —
    a pure per-row map (array_min over the k re-hashes), ZERO shuffle;
    each band of ``rows_per_band`` consecutive components hashes to one
    bucket key."""
    sig = shingle_sets.select(
        "doc_id",
        *keep,
        *[
            F.array_min(
                F.transform("hs", lambda h: F.xxhash64(h, F.lit(j)))
            ).alias(f"h{j}")
            for j in range(N_MINHASH)
        ],
    )
    rows_per_band = N_MINHASH // LSH_BANDS
    band_cols = [
        F.xxhash64(
            F.lit(band),
            *[F.col(f"h{band * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"band{band}")
        for band in range(LSH_BANDS)
    ]
    return sig.select("doc_id", *keep, F.array(*band_cols).alias("buckets"))


@query("dedup_minhash_lsh", oracle=_TWIN_PAIR_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding candidate pairs over the twin-augmented corpus,
    checked against the exact all-pairs ngram-Jaccard oracle (full recall
    required to hash-match; exact verification forbids invented pairs).

    signature[j] = min over shingles of xxhash64(shingle, seed=j); bands of 4
    hashed together; docs sharing any band bucket become candidates, then get
    exact-Jaccard verified. Everything stays JVM-side: the signature build is
    one explode + groupBy(doc) with N_MINHASH min-aggregates; banding is a
    second explode + groupBy(band_hash). Cost is O(total shingles · k) map
    work and two digest-keyed shuffles — linear, no all-pairs stage.
    """
    d = spread(with_doc_twins(load_table(spark, sf_dir, "documents")))
    # materialize shingle sets once — three consumers (signatures, both sides
    # of the verification join) would otherwise recompute the tokenize+
    # shingle lineage end-to-end. At cluster scale this is a persisted
    # intermediate table; locally localCheckpoint gives the same cut.
    # Only the 8-byte shingle hashes are stored — signatures re-hash them and
    # verification intersects them directly, so no shingle string survives
    # tokenization (one third the checkpoint bytes of the string variant).
    shingle_sets = hashed_shingle_sets(d).localCheckpoint()
    # signature + banding via the shared minhash_buckets helper (zero-shuffle
    # per-row map; see its docstring) — identical hash values to the inline
    # formulation it replaced. explode_nonempty (r12): a plain explode here
    # makes InferFiltersFromGenerate evaluate the full 32-hash signature
    # TWICE per row (once in the inferred size>0 filter, once in the
    # projection); buckets always has LSH_BANDS non-null elements.
    banded = explode_nonempty(minhash_buckets(shingle_sets), "buckets", "bucket", "doc_id")
    # single-pass pair generation: bucket members → sorted id array → all
    # (i<j) pairs via nested transform. Avoids the banded-self-join, which
    # would execute the whole signature lineage twice. Buckets are tiny by
    # construction (near-dup groups), so collect_set per bucket is bounded;
    # a pathological hot bucket would need a salt, which LSH keys never do.
    ids = F.array_sort(F.collect_set("doc_id"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    candidates = (
        banded.groupBy("bucket")
        .agg(ids.alias("ids"))
        .where(F.size("ids") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    # exact-Jaccard verification of candidates only
    return verify_jaccard(candidates, shingle_sets, threshold=0.3)


def connected_components(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Union near-dup pairs into clusters: (doc_id, cluster_id) where
    cluster_id is the minimum doc_id reachable through the pair graph.

    Iterative min-label propagation — each round, every node adopts the
    smallest label among itself and its neighbors; converges in O(diameter)
    rounds (near-dup clusters are tiny, so 2-3 rounds in practice; the loop
    stops at the first fixpoint). All joins are keyed shuffles; no driver-
    side graph state — this is how you canonicalize duplicates at corpus
    scale without a graph framework."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_label = F.least(
            F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
        )
        # the change flag rides INSIDE the checkpointed frame (r12): the
        # fixpoint test was a separate join of the two checkpointed label
        # tables per iteration; comparing old vs new label in the same
        # projection makes it a limit-1 scan of the checkpoint instead.
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                new_label.alias("label"),
                (new_label != F.col("label")).alias("__chg"),
            )
            .localCheckpoint()  # cut lineage: iterative plans otherwise explode
        )
        changed = updated.where("__chg").limit(1).count()
        labels = updated.select("id", "label")
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


@query(
    "dedup_clusters",
    # connected components ARE SQL-expressible: transitive closure via a
    # recursive CTE over the exact-jaccard edge set, cluster = min reachable
    # id — so the iterative Spark fixpoint gets a full differential oracle
    oracle="""
    WITH RECURSIVE toks AS (
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
      FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), jpairs AS (
      SELECT doc_a, doc_b
      FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_shared / (sa.n + sb.n - n_shared) >= 0.3
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM jpairs
      UNION
      SELECT doc_b, doc_a FROM jpairs
    ), reach(a, r) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.a
    )
    SELECT cluster_id AS canonical_id, count(*) AS n_members FROM (
      SELECT a, min(r) AS cluster_id FROM reach GROUP BY a
    )
    GROUP BY cluster_id
    ORDER BY canonical_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup: ngram-Jaccard pairs → connected components →
    per-cluster canonical doc (min id) + member count. The keep-list a
    training pipeline actually consumes."""
    pairs = dedup_ngram_jaccard(spark, sf_dir)
    comp = connected_components(pairs)
    return (
        comp.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"),
             F.min("doc_id").alias("canonical_id"))
        .select("canonical_id", "n_members")
        .orderBy("canonical_id")
    )


@pandas_udf(LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """Arrow-batched 64-bit SimHash over whitespace tokens (X2 pattern:
    02…/05.ingesta_incremental [imagenes].py:52-60). Deterministic: token
    hash is Python's stable blake2b over utf-8 bytes.

    Vectorized per batch (ADVICE r2): token hashes are memoized across the
    batch (corpora repeat tokens heavily), and the per-bit tally is one
    numpy unpack + sum over a (tokens × 64) bit matrix instead of a Python
    loop of 64 tests per token. Signatures are bit-identical to the scalar
    formulation (pinned by pytest)."""
    import hashlib

    import numpy as np

    bit_idx = np.arange(64, dtype=np.uint64)
    memo: dict[str, int] = {}

    def tok_hash(tok: str) -> int:
        h = memo.get(tok)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big"
            )
            memo[tok] = h
        return h

    def sim(text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hs = np.array([tok_hash(t) for t in toks], dtype=np.uint64)
        # (T, 64) 0/1 matrix; counts[bit] = 2·ones − T  (same tally as the
        # scalar +1/−1 walk), bit set iff counts > 0
        bits = (hs[:, None] >> bit_idx[None, :]) & np.uint64(1)
        counts = 2 * bits.sum(axis=0, dtype=np.int64) - len(toks)
        v = int(((counts > 0).astype(np.uint64) << bit_idx).sum(dtype=np.uint64))
        # interpret as signed 64-bit for Spark LongType
        return v - (1 << 64) if v >= (1 << 63) else v

    return texts.map(sim)


SIMHASH_BLOCKS = 8  # 8 blocks × 8 bits: pigeonhole-complete for hamming ≤ 7
SIMHASH_MAX_HAMMING = 8
SIMHASH_TARGET_OCCUPANCY = 16  # docs per bucket the index aims for


def simhash_block_width(n_docs: int) -> int:
    """Block width (bits) for the corpus size — the simhash-index dial.

    An 8-bit block has only 256 bucket values per table, so bucket
    occupancy grows LINEARLY with corpus size and the in-bucket pair
    expansion quadratically (measured: the ×16→×32 probe hop went α≈1.9
    before this dial). Widening the block restores ~O(1) occupancy:
    pick the smallest power-of-two width whose table has ≥ n_docs /
    TARGET_OCCUPANCY buckets. Wider blocks mean fewer tables (64/width)
    and a tighter pigeonhole guarantee (hamming ≤ tables−1): candidate
    recall for mid-hamming pairs is traded for a linear index — the
    standard Manku et al. trade, now corpus-size-aware instead of
    hardcoded."""
    width = 64 // SIMHASH_BLOCKS  # 8 bits — the small-corpus default
    while (1 << width) * SIMHASH_TARGET_OCCUPANCY < n_docs and width < 32:
        width *= 2
    return width


@query("dedup_simhash", oracle=_TWIN_PAIR_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the twin-augmented corpus, checked
    against the exact ngram-Jaccard oracle.

    Pipeline (the Manku et al. multi-table shape): 64-bit signatures → k
    tables keyed on one block each → popcount filter (bit_count over the
    XOR, ≤ SIMHASH_MAX_HAMMING) → exact-Jaccard verification of survivors
    only. Candidate generation is pigeonhole-COMPLETE only up to Hamming
    distance k−1 (a pair that close must agree on some block); between k−1
    and SIMHASH_MAX_HAMMING candidates are caught opportunistically when a
    block happens to agree. Widening blocks (fewer tables) therefore trades
    mid-Hamming recall for a linear index — at the 8-bit oracle scale k=8
    covers the filter's whole range minus one, and the sweep corpus's true
    pairs sit within it (pinned by the oracle row + recall pytest).

    Scale notes: the block width adapts to corpus size
    (simhash_block_width) so bucket occupancy stays ~O(1) and the bucket
    join stays linear; the pair expansion is a bucket-keyed JOIN (AQE
    skew-split can parallelize a hot bucket), never a per-bucket collected
    array, and the popcount predicate runs inside the join before anything
    wide is materialized."""
    d = spread(with_doc_twins(load_table(spark, sf_dir, "documents")))
    shingle_sets = hashed_shingle_sets(d).localCheckpoint()
    sigs = d.select("doc_id", _simhash64(F.col("text")).alias("sig"))
    block_width = simhash_block_width(shingle_sets.count())
    mask = (1 << block_width) - 1
    blocks = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{blk}:"),
                        F.conv(
                            F.shiftrightunsigned(F.col("sig"), blk * block_width)
                            .bitwiseAND(F.lit(mask)),
                            10,
                            16,
                        ),
                    )
                    for blk in range(64 // block_width)
                ]
            )
        ).alias("bucket"),
    )
    a = blocks.alias("a")
    b = blocks.alias("b")
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    candidates = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (hamming <= SIMHASH_MAX_HAMMING),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return verify_jaccard(candidates, shingle_sets, threshold=0.3)


EMB_DEDUP_THRESHOLD = 0.4  # far tail of this corpus's cosine distribution


@query(
    "dedup_embedding_cosine",
    # transitive closure over the exact cosine>=0.4 pair graph, joined back
    # to documents for per-cluster content stats — the recursive-CTE oracle
    # pattern proven by dedup_clusters
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) >= {EMB_DEDUP_THRESHOLD}
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach(a, r) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.a
    ), clusters AS (
      SELECT a AS doc_id, min(r) AS cluster_id FROM reach GROUP BY a
    )
    SELECT cluster_id AS canonical_id, count(*) AS n_members,
           CAST(sum(d.n_chars) AS BIGINT) AS total_chars
    FROM clusters c JOIN documents d USING (doc_id)
    GROUP BY cluster_id
    ORDER BY canonical_id
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup — the semantic tier of the dedup
    family (exact / ngram / MinHash / SimHash / EMBEDDING): documents whose
    embeddings sit within cosine ≥ 0.4 are near-dup candidates; the pair
    graph is clustered (connected components) and each cluster reports its
    canonical doc (min id), member count, and total content volume from the
    documents table.

    Pairs come from the tiled-BLAS blocked matmul (sim_pairs_blocked) — the
    exact moderate-threshold path (n²/B shuffle rows, SIMD tiles), since at
    cosine 0.4 locality hashing has nothing to bucket on. At near-dup
    thresholds (≥0.9) swap in ann_lsh_pairs/ann_ivf_pairs for linear cost —
    same downstream clustering."""
    from lakehouses_spark.queries.similarity import sim_pairs_blocked

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = sim_pairs_blocked(emb, EMB_DEDUP_THRESHOLD).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    comp = connected_components(pairs)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        comp.join(docs, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("canonical_id"),
        )
        .select("canonical_id", "n_members", "total_chars")
        .orderBy("canonical_id")
    )


@query(
    "dedup_incremental",
    oracle="""
    WITH digests AS (
      SELECT doc_id,
             sha256(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS digest
      FROM documents
    ), existing AS (
      SELECT digest, min(doc_id) AS first_existing FROM digests
      WHERE doc_id % 2 = 0 GROUP BY digest
    ), incoming AS (
      SELECT doc_id, digest,
             min(doc_id) OVER (PARTITION BY digest) AS first_incoming
      FROM digests WHERE doc_id % 2 = 1
    )
    SELECT i.doc_id,
           CASE WHEN e.first_existing IS NOT NULL THEN 'dup_of_existing'
                WHEN i.first_incoming < i.doc_id THEN 'dup_within_batch'
                ELSE 'accepted' END AS status,
           CASE WHEN e.first_existing IS NOT NULL THEN e.first_existing
                WHEN i.first_incoming < i.doc_id THEN i.first_incoming
                ELSE NULL END AS dup_of
    FROM incoming i LEFT JOIN existing e USING (digest)
    ORDER BY i.doc_id
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production shape of the exact tier: an
    INCOMING batch (odd doc_ids) deduplicates against the EXISTING corpus
    index (even doc_ids) and against itself, in one pass. Each incoming doc
    gets a verdict: accepted / dup_of_existing (canonical existing doc id) /
    dup_within_batch (earlier incoming doc with the same content). The
    dedup key is the canonicalized content digest (sorted distinct words —
    normalization-then-hash, the standard pre-ingest canonical form).

    100 TB shape: the existing side is represented by its (digest →
    first_doc) index, which in production is a LakeTable maintained by
    MERGE after every accepted batch (shuffle keys are 32-byte digests,
    never bodies — same discipline as dedup_exact). One digest-keyed
    shuffle joins batch vs index; the within-batch window shares that same
    hash partitioning, so Catalyst plans a single exchange for both
    checks. The index join is a broadcast only when the index is small;
    here it shuffles, as it would at scale."""
    d = load_table(spark, sf_dir, "documents")
    digest = F.sha2(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " "),
        256,
    )
    digests = d.select("doc_id", digest.alias("digest"))
    existing = (
        digests.where(F.col("doc_id") % 2 == 0)
        .groupBy("digest")
        .agg(F.min("doc_id").alias("first_existing"))
    )
    from pyspark.sql import Window

    incoming = digests.where(F.col("doc_id") % 2 == 1).withColumn(
        "first_incoming", F.min("doc_id").over(Window.partitionBy("digest"))
    )
    joined = incoming.join(existing, "digest", "left")
    status = (
        F.when(F.col("first_existing").isNotNull(), "dup_of_existing")
        .when(F.col("first_incoming") < F.col("doc_id"), "dup_within_batch")
        .otherwise("accepted")
    )
    dup_of = (
        F.when(F.col("first_existing").isNotNull(), F.col("first_existing"))
        .when(F.col("first_incoming") < F.col("doc_id"), F.col("first_incoming"))
        .otherwise(F.lit(None).cast("long"))
    )
    return joined.select(
        "doc_id", status.alias("status"), dup_of.alias("dup_of")
    ).orderBy("doc_id")


INCR_FRESH_ID_OFFSET = 2_000_000  # incoming docs with no corpus near-dup
# Match threshold for the incremental near-dup verdict. Sits at the START of
# the 8×4 banding's high-recall region (ADVICE r5 #4): P(candidate) =
# 1-(1-j^4)^8 is ~6% at j=0.3 but ≥67% at 0.6 and ≥99.99% at j≥0.9 — an
# oracle that admitted j≥0.3 matches would be flaky the moment a regenerated
# corpus produced an organic batch-vs-corpus best match the banding almost
# never finds. The regen pin (tests/test_quality.py::
# test_incremental_minhash_no_uncertain_band_pairs) asserts the shipped data
# keeps every qualifying pair at j≥0.9, where recall is effectively certain.
INCR_MINHASH_THRESHOLD = 0.6


@query(
    "dedup_incremental_minhash",
    oracle=f"""
    WITH incoming AS (
      SELECT doc_id + {DOC_TWIN_ID_OFFSET} AS doc_id,
             text || ' {DOC_TWIN_SUFFIX}' AS text
      FROM documents WHERE doc_id < {N_DOC_TWINS}
      UNION ALL
      SELECT doc_id + {INCR_FRESH_ID_OFFSET} AS doc_id,
             replace(text, ' ', 'x ') AS text
      FROM documents
      WHERE doc_id >= {N_DOC_TWINS} AND doc_id < {2 * N_DOC_TWINS}
    ), all_docs AS (
      SELECT doc_id, text, 0 AS is_in FROM documents
      UNION ALL
      SELECT doc_id, text, 1 AS is_in FROM incoming
    ), toks AS (
      SELECT doc_id, is_in, string_split(text, ' ') AS words FROM all_docs
    ), positions AS (
      SELECT doc_id, is_in, words,
             unnest(generate_series(1, greatest(len(words) - 2, 1))) AS i
      FROM toks
    ), shingles AS (
      SELECT DISTINCT doc_id, is_in,
             words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS shingle
      FROM positions
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id
    ), shared AS (
      SELECT i.doc_id AS in_doc, c.doc_id AS ex_doc, count(*) AS n_shared
      FROM shingles i
      JOIN shingles c ON i.shingle = c.shingle AND i.is_in = 1 AND c.is_in = 0
      GROUP BY 1, 2
    ), scored AS (
      SELECT in_doc, ex_doc, n_shared / (si.n + se.n - n_shared) AS j
      FROM shared
      JOIN sizes si ON si.doc_id = in_doc
      JOIN sizes se ON se.doc_id = ex_doc
      WHERE n_shared / (si.n + se.n - n_shared) >= {INCR_MINHASH_THRESHOLD}
    ), best AS (
      SELECT in_doc, ex_doc, j, row_number() OVER (
               PARTITION BY in_doc ORDER BY j DESC, ex_doc) AS rn
      FROM scored
    )
    SELECT inc.doc_id,
           CASE WHEN b.in_doc IS NOT NULL
                THEN 'dup_of_existing' ELSE 'accepted' END AS status,
           b.ex_doc AS dup_of,
           round(b.j, 4) AS jaccard
    FROM incoming inc
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.in_doc = inc.doc_id
    ORDER BY inc.doc_id
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup dedup (VERDICT r4 #7) — the operator a real
    100 TB crawl pipeline runs daily: an incoming batch is banded against a
    PERSISTED MinHash signature index (a LakeTable maintained across
    ingests), producing a per-doc verdict without re-shingling the corpus.
    Reference analog: the batch-vs-existing set logic of
    notebooks/02.ingestas_ficheros/03.ingesta_incremental_v2 [json].py:211-218
    lifted from exact filenames to near-duplicate content.

    Batch construction (deterministic, twin-injection): twins of the first
    {N_DOC_TWINS} docs (1 appended marker word → jaccard ≈ 0.97 vs origin,
    must come back dup_of_existing) plus {N_DOC_TWINS} "fresh" docs whose
    every word is suffixed (zero shingle overlap → must come back
    accepted). The oracle is the EXACT all-pairs batch×corpus Jaccard
    argmax — the LSH path hash-matches only if banding recovers every true
    best match and invents none.

    100 TB shape: the index (doc_id, hs, buckets) is written once as a
    LakeTable and only READ here — corpus text is never re-tokenized. The
    batch side is small by definition; its banded probe joins the exploded
    index on 8-byte bucket keys (one keyed shuffle of index postings,
    linear), candidates get exact-Jaccard verification against the stored
    hashed-shingle sets, and the argmax is a tiny per-batch-doc window.
    Daily cost is O(index postings + batch work), independent of corpus
    text volume."""
    import tempfile

    from pyspark.sql import Window

    from lakehouses_spark.tables import LakeTable

    d = spread(load_table(spark, sf_dir, "documents"))
    index_df = minhash_buckets(hashed_shingle_sets(d), keep=("hs",))
    base = d.select("doc_id", "text")
    twins = base.where(F.col("doc_id") < N_DOC_TWINS).select(
        (F.col("doc_id") + DOC_TWIN_ID_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(" " + DOC_TWIN_SUFFIX)).alias("text"),
    )
    fresh = base.where(
        (F.col("doc_id") >= N_DOC_TWINS) & (F.col("doc_id") < 2 * N_DOC_TWINS)
    ).select(
        (F.col("doc_id") + INCR_FRESH_ID_OFFSET).alias("doc_id"),
        F.expr("replace(text, ' ', 'x ')").alias("text"),
    )
    incoming = twins.unionByName(fresh)
    inc = minhash_buckets(hashed_shingle_sets(incoming), keep=("hs",)).localCheckpoint()
    with tempfile.TemporaryDirectory() as tmp:
        t = LakeTable.create(spark, f"{tmp}/minhash_index", index_df)
        idx = t.read()  # persisted index — downstream never sees corpus text
        out = minhash_probe(inc, idx)
        # materialize before the temp index directory disappears (the driver
        # collects after return); localCheckpoint keeps the result
        # distributed with its lineage cut at the finished computation
        return out.localCheckpoint()


def minhash_probe(incoming_sigs: DataFrame, idx: DataFrame) -> DataFrame:
    """Per-doc near-dup verdict for an incoming signature batch against a
    persisted MinHash index — the probe step of ``dedup_incremental_minhash``
    factored out so a streaming foreachBatch can run the SAME logic per
    micro-batch (probe → append verdicts → index the accepted docs).

    ``incoming_sigs``/``idx``: (doc_id, hs, buckets) as produced by
    ``minhash_buckets(hashed_shingle_sets(docs), keep=("hs",))``. Returns
    (doc_id, status ∈ {dup_of_existing, accepted}, dup_of, jaccard) — one
    row per incoming doc, ordered by doc_id."""
    from pyspark.sql import Window

    inc_b = incoming_sigs.select(
        F.col("doc_id").alias("in_doc"), F.explode("buckets").alias("bucket")
    )
    idx_b = idx.select(
        F.col("doc_id").alias("ex_doc"), F.explode("buckets").alias("bucket")
    )
    cand = inc_b.join(idx_b, "bucket").select("in_doc", "ex_doc").distinct()
    si = incoming_sigs.select(
        F.col("doc_id").alias("in_doc"), F.col("hs").alias("in_hs")
    )
    se = idx.select(F.col("doc_id").alias("ex_doc"), F.col("hs").alias("ex_hs"))
    inter = F.size(F.array_intersect("in_hs", "ex_hs"))
    union = F.size(F.array_union("in_hs", "ex_hs"))
    scored = (
        cand.join(si, "in_doc")
        .join(se, "ex_doc")
        .withColumn("j", inter / union)
        # unrounded, matching the oracle WHERE; threshold sits in the
        # banding's high-recall region (see INCR_MINHASH_THRESHOLD)
        .where(F.col("j") >= INCR_MINHASH_THRESHOLD)
    )
    wbest = Window.partitionBy("in_doc").orderBy(F.col("j").desc(), "ex_doc")
    best = (
        scored.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select(
            "in_doc",
            F.col("ex_doc").alias("dup_of"),
            F.round("j", 4).alias("jaccard"),
        )
    )
    return (
        incoming_sigs.select("doc_id")
        .join(best, incoming_sigs["doc_id"] == best["in_doc"], "left")
        .select(
            "doc_id",
            F.when(F.col("in_doc").isNotNull(), "dup_of_existing")
            .otherwise("accepted")
            .alias("status"),
            "dup_of",
            "jaccard",
        )
        .orderBy("doc_id")
    )


# --- exact-substring dedup (shared k-token windows) -------------------------

SUBSTR_K = 8  # window width in tokens; a shared 8-token run is copy evidence
# Stop-window df cut (VERDICT r4 #4): a k-token window shared by more than
# this many DISTINCT docs is ubiquitous boilerplate (license headers, nav
# chrome) whose df² pair explosion is the one superlinear stage the probe
# ladder found (α=0.83 trending up on skew). Genuine pairwise copies have
# df≈2, so the cut is far above any real copy signal; on the shipped
# testdata max window df is 4, so exact oracle parity is unaffected — the
# oracle applies the identical cut anyway so semantics stay aligned on ANY
# corpus. The skewed-corpus ladder (tools/scaling_probe.py::probe_substring
# _skew, SCALING.md) measures the cut holding α under boilerplate skew.
SUBSTR_STOP_DF = 64


@query(
    "dedup_common_substring",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    all_wins AS (
      SELECT doc_id, i AS pos, array_to_string(w[i:i+{SUBSTR_K - 1}], ' ') AS win
      FROM (SELECT doc_id, w,
                   unnest(range(1, len(w) - {SUBSTR_K - 2})) AS i
            FROM toks)
    ),
    -- stop-window cut mirroring the Spark side: a window present in more
    -- than SUBSTR_STOP_DF distinct docs is ubiquitous boilerplate and is
    -- dropped before pairing (no-op on this corpus: max df is 4)
    hot AS (
      SELECT win FROM all_wins
      GROUP BY win HAVING count(DISTINCT doc_id) > {SUBSTR_STOP_DF}
    ),
    wins AS (
      SELECT * FROM all_wins WHERE win NOT IN (SELECT win FROM hot)
    ),
    m AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pos_a, b.pos AS pos_b
      FROM wins a JOIN wins b ON a.win = b.win AND a.doc_id < b.doc_id
    ),
    isl AS (
      SELECT doc_a, doc_b, pos_a - pos_b AS diff,
             pos_a - row_number() OVER (
               PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
             ) AS island
      FROM m
    ),
    runs AS (
      SELECT doc_a, doc_b, count(*) AS run_len
      FROM isl GROUP BY doc_a, doc_b, diff, island
    )
    SELECT doc_a, doc_b,
           CAST(sum(run_len) AS BIGINT) AS n_window_matches,
           CAST(max(run_len) + {SUBSTR_K - 1} AS BIGINT) AS max_run_tokens
    FROM runs GROUP BY doc_a, doc_b
    ORDER BY doc_a, doc_b
    """,
)
def dedup_common_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate detection: pairs of documents sharing at
    least one identical run of SUBSTR_K consecutive tokens, with the total
    matched-window count and the longest shared run (in tokens) — the
    "dedup the exact substring, not the whole doc" shape of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), re-expressed relationally instead of via a suffix array.

    Plan: per-doc positional window hashes (xxhash64 longs, never the
    window strings — same rationale as `_hashed_shingles`), inverted-index
    self-join on the 8-byte hash, then gaps-and-islands over aligned
    positions (constant pos_a - pos_b diff, one window partition) to find
    maximal runs. At 100 TB this shuffles (doc_id, pos, long) triples only,
    the join key distribution is the window-hash distribution (near-unique
    outside true copies — ubiquitous boilerplate windows are the skew risk
    and are dropped by the SUBSTR_STOP_DF distinct-doc cut, mirrored
    exactly in the oracle), and the window functions partition by
    (doc_a, doc_b, diff) — bounded per-pair state, no global sort."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return common_substring_pairs(d, stop_df=SUBSTR_STOP_DF)


def common_substring_pairs(
    d: DataFrame, k: int = SUBSTR_K, stop_df: int | None = None
) -> DataFrame:
    """DataFrame-level core of `dedup_common_substring` (reusable on any
    (doc_id, text) frame — e.g. the curated set in the pipeline example):
    pairs sharing ≥1 identical k-token run, with total matched windows and
    the longest shared run in tokens.

    `stop_df`: heavy-hitter cut — window hashes appearing in more than
    `stop_df` DISTINCT documents (ubiquitous boilerplate: license headers,
    navigation chrome) are dropped from the inverted index before the
    self-join, the same skew lever as `ngram_candidate_pairs`' stop-shingle
    cut. The registered query passes SUBSTR_STOP_DF and its oracle applies
    the identical cut, so parity holds by construction; a df cap well above
    2 caps the worst join key at df² pair rows while leaving genuine
    pairwise copies (df≈2) untouched — note it removes those windows from
    run/match COUNTS too, so reported max_run_tokens is then a lower bound
    on boilerplate-heavy pairs."""
    w = F.split(F.col("text"), " ")
    # Window fingerprints from PER-TOKEN hashes, not per-window strings:
    # hashing each token once and combining k consecutive token hashes with
    # a position-dependent rotate-XOR is ~k long ops per window, vs building
    # and xxhashing a fresh k-token string per window (the dominant cost of
    # this operator at scale — measured 8.9 s of a 16.4 s ×16 run). The
    # combiner rotl(t_j, 7·j+1)⊕… is position-sensitive (reordered tokens
    # don't collide) and stays in non-overflowing bitwise ops, so it is
    # ANSI-mode safe. Equality semantics are unchanged modulo 64-bit hash
    # collisions — the same contract the previous per-window xxhash had.
    def _rotl(col, r: int):
        return F.shiftleft(col, r).bitwiseOR(F.shiftrightunsigned(col, 64 - r))

    th_attr = F.col("__th")

    def _win_hash(i):
        acc = None
        for j in range(k):
            term = _rotl(F.element_at(th_attr, i + j + 1), 7 * j + 1)
            acc = term if acc is None else acc.bitwiseXOR(term)
        return acc

    hashed_wins = F.when(
        F.size(th_attr) >= k,
        F.transform(F.sequence(F.lit(0), F.size(th_attr) - k), _win_hash),
    ).otherwise(F.array().cast("array<long>"))
    # materialize the positional window-hash table once — THREE consumers
    # (the df heavy-hitter pass and both sides of the self-join) would
    # otherwise re-evaluate the tokenize+hash explode end-to-end; at cluster
    # scale this is a persisted intermediate table, locally localCheckpoint
    # gives the same cut (same rationale as the jaccard tier's shingle_sets)
    # token hashes land as a REAL attribute (__th) before the window pass:
    # embedding the transform(...) Column directly in the window lambda
    # would copy the whole token-hashing expression into every element_at
    # and re-hash the full token array once per window (measured 75 s vs
    # 19 s at ×64). Catalyst's CollapseProject leaves the two projections
    # split because __th is referenced k+1 times and is not cheap.
    toks = d.select(
        "doc_id", F.transform(w, lambda x: F.xxhash64(x)).alias("__th")
    )
    wins = toks.select(
        "doc_id", F.posexplode(hashed_wins).alias("pos", "h")
    ).localCheckpoint()
    if stop_df is not None:
        hot = (
            wins.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where(F.col("df") > stop_df)
            .select("h")
        )
        # heavy hitters are few by definition → broadcast anti-join
        wins = wins.join(F.broadcast(hot), "h", "left_anti")
    a, b = wins.alias("a"), wins.alias("b")
    m = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pos_a"),
        F.col("b.pos").alias("pos_b"),
    )
    from pyspark.sql import Window

    diff = F.col("pos_a") - F.col("pos_b")
    isl = m.select(
        "doc_a",
        "doc_b",
        diff.alias("diff"),
        (
            F.col("pos_a")
            - F.row_number().over(
                Window.partitionBy("doc_a", "doc_b", diff).orderBy("pos_a")
            )
        ).alias("island"),
    )
    runs = isl.groupBy("doc_a", "doc_b", "diff", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(
            F.sum("run_len").alias("n_window_matches"),
            (F.max("run_len") + k - 1).cast("long").alias("max_run_tokens"),
        )
        .orderBy("doc_a", "doc_b")
    )


# --- containment tier: asymmetric sub-document duplication -------------------


@query(
    "dedup_containment",
    oracle="""
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
      FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_shared / least(sa.n, sb.n), 4) AS containment,
           round(n_shared / (sa.n + sb.n - n_shared), 4) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_shared / least(sa.n, sb.n) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT dedup: |A∩B| / min(|A|,|B|) ≥ 0.5 —
    catches a short document embedded inside a long one, which symmetric
    Jaccard misses (the union term dilutes the score). This is the
    quote/excerpt/boilerplate-wrapper detector a pretraining pipeline runs
    alongside Jaccard near-dup removal.

    100 TB shape: identical machinery to dedup_ngram_jaccard — 8-byte
    hashed-shingle inverted index with the stop-shingle skew cut for
    candidate generation (linear in corpus, df-keyed, never all-pairs),
    then exact verification over full hashed-shingle sets for candidates
    only. Containment-specific recall guarantee: docs shorter than
    SHORT_DOC_SHINGLES keep ALL their postings (hot included), so a short
    boilerplate excerpt whose every shingle is ubiquitous still surfaces
    against its containing doc — the Jaccard tier's "many shared shingles
    survive the cut" argument doesn't hold at containment 0.5 of a tiny
    doc (see ngram_candidate_pairs.keep_short_docs). Containment and Jaccard come from the same intersect/size
    arithmetic, so the extra metric is free. The threshold filter compares
    the UNROUNDED ratio (matching the oracle's WHERE); round(.,4) is
    projection-only — same discipline as verify_jaccard."""
    d = spread(load_table(spark, sf_dir, "documents"))
    shingle_sets = hashed_shingle_sets(d).localCheckpoint()
    cand = ngram_candidate_pairs(
        shingle_sets,
        keep_short_docs=SHORT_DOC_SHINGLES,
        containment_prefix=0.5,
    )
    sa = shingle_sets.alias("sa")
    sb = shingle_sets.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.hs"), F.col("sb.hs")))
    union = F.size(F.array_union(F.col("sa.hs"), F.col("sb.hs")))
    smaller = F.least(F.size("sa.hs"), F.size("sb.hs"))
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where((inter / smaller) >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / smaller, 4).alias("containment"),
            F.round(inter / union, 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )
