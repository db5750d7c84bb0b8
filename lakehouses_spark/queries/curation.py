"""Training-corpus curation operators over `documents` (SURVEY §2.12 north
star — the ops a pretraining-data pipeline runs beyond dedup/quality):

- benchmark decontamination: n-gram overlap between the training split and a
  held-out benchmark split (the GPT-3 appendix-C / open-LM-eval hygiene
  pass). The benchmark side is tiny by construction, so its distinct-gram
  set BROADCASTS and the training grams never shuffle at all.
- stratified sampling: deterministic per-language quota sampling (mixture
  building). The "random" order is md5(doc_id) — reproducible run-to-run
  and engine-independent, so it oracle-checks exactly.
- sequence packing: concat-and-chunk packing of documents into fixed
  token-budget bins (the GPT-style pretraining batch layout). Packing is
  per-source so the running-offset window is partitioned — no global
  serial cumsum; each shard packs independently, exactly how a 1000-node
  packing job shards.
- boilerplate n-grams: global heavy-hitter trigrams (CCNet/RefinedWeb-style
  boilerplate detection) and each document's boilerplate occupancy. The
  heavy-hitter set is a TakeOrdered top-K broadcast back over the corpus.

All four are pure built-ins (split / higher-order array funcs / windows) —
JVM-side end to end, no Python boundary.

Note on gram size: real decontamination uses 8-13-gram collisions; this
synthetic corpus draws from a ~40-word vocabulary, so TRIgrams here have
the same collision statistics that long n-grams have on natural text. The
operator is parameterized; only the registered default is 3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouses_spark.io import explode_nonempty, load_table, spread
from lakehouses_spark.registry import query

BENCH_MOD = 97  # doc_id % BENCH_MOD == 0 => held-out "benchmark" split
GRAM_N = 3
PACK_CONTEXT = 512  # tokens per packed sequence bin
STRATUM_QUOTA = 40  # sampled docs per language
BOILER_TOP_K = 100


def _with_words(d, col: str = "text"):
    """Project the token array as a real attribute (``__w``) first:
    embedding split() inside the n-gram lambda re-tokenizes the whole
    document once per gram element (measured ~8× on the dedup tier's
    identical shape — see hashed_shingle_sets)."""
    return d.select(*d.columns, F.split(F.col(col), " ").alias("__w"))


def _word_ngrams(n: int = GRAM_N, words_col: str = "__w") -> Column:
    """Word n-grams as space-joined strings over a pre-projected token-array
    attribute (see ``_with_words``), [] when the doc is shorter than n
    tokens (guards F.sequence's descending-range behavior)."""
    w = F.col(words_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + k + 1) for k in range(n)]
        ),
    )
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))


def _grams_sql(n: int = GRAM_N) -> str:
    """DuckDB CTE producing (doc_id, g) word n-grams — list slice is 1-based
    inclusive, range() half-open, mirroring _word_ngrams exactly."""
    return f"""
    toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(w[i:i+{n - 1}], ' ') AS g
      FROM (SELECT doc_id, w, unnest(range(1, len(w) - {n - 2})) AS i FROM toks)
    )"""


@query(
    "text_decontaminate",
    oracle=f"""
    WITH {_grams_sql()}
    SELECT t.doc_id, count(DISTINCT t.g) AS n_overlap
    FROM grams t
    JOIN (SELECT DISTINCT g FROM grams WHERE doc_id % {BENCH_MOD} = 0) b USING (g)
    WHERE t.doc_id % {BENCH_MOD} <> 0
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents (doc_id % 97 != 0) that
    share any word n-gram with the benchmark split (doc_id % 97 == 0), with
    the count of distinct shared grams. Downstream, these doc_ids are the
    drop-list a training pipeline subtracts before tokenization.

    100 TB shape: the benchmark gram set is bounded by the benchmark corpus
    (MBs, not TBs) — built once, made distinct, and BROADCAST; the training
    side explodes grams and probes the broadcast hash map in place, so the
    only shuffle is the final per-doc count keyed on doc_id. At real scale
    grams would be pre-hashed to 8-byte keys before the probe (same plan,
    smaller rows)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    # explode_nonempty (r12): plain explode duplicates the n-gram array
    # build inside the inferred size>0 filter; gram strings are never null.
    grams = explode_nonempty(_with_words(d), _word_ngrams(), "g", "doc_id")
    bench = (
        grams.where(F.col("doc_id") % BENCH_MOD == 0).select("g").distinct()
    )
    train = grams.where(F.col("doc_id") % BENCH_MOD != 0)
    return (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_overlap"))
        .orderBy("doc_id")
    )


@query(
    "sample_stratified",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS INTEGER) AS sample_rank
      FROM documents
    )
    SELECT doc_id, lang, sample_rank
    FROM ranked WHERE sample_rank <= {STRATUM_QUOTA}
    ORDER BY lang, sample_rank
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified quota sampling: exactly min(quota, |stratum|) documents per
    language, in a deterministic pseudo-random order (md5 of the doc id) —
    the mixture-building step of a corpus pipeline, reproducible across runs
    and engines (no RNG state; the hash IS the shuffle).

    100 TB shape: one shuffle partitioned on the stratum key; rank-and-cut
    inside each partition. Skewed strata (one language dominating) are the
    known hazard — for quota ≪ stratum size, swap the exact row_number for
    a per-partition top-quota pre-cut (TakeOrdered per stratum shard) before
    the final rank, which bounds any partition at quota × shards rows."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .where(F.col("sample_rank") <= STRATUM_QUOTA)
        .orderBy("lang", "sample_rank")
    )


@query(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT source, doc_id, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING
             ) - n_tokens AS start_offset
      FROM toks
    )
    SELECT source, CAST(floor(start_offset / {PACK_CONTEXT}) AS BIGINT) AS bin_id,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM packed
    GROUP BY source, bin_id
    ORDER BY source, bin_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concat-and-chunk documents (per source, in doc_id
    order) into fixed 512-token context bins — each doc's bin is
    the chunk its starting token offset falls in. Reports bin occupancy,
    the layout a pretraining dataloader materializes.

    100 TB shape: the running offset is a window PARTITIONED BY source —
    no global serial cumsum; every source shard packs independently in one
    shuffle, which is exactly how a distributed packing job shards (pack
    within shard, never across). Bin stats are a second keyed aggregation
    on (source, bin). If one source dwarfs the rest, widen the partition
    key to (source, doc_id div N) — packing quality is unaffected because
    chunk boundaries never carry information across bins."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.select(
        "source",
        "doc_id",
        n_tokens.alias("n_tokens"),
        (F.sum(n_tokens).over(w) - n_tokens).alias("start_offset"),
    )
    return (
        packed.groupBy(
            "source",
            F.floor(F.col("start_offset") / PACK_CONTEXT).alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin_id")
    )


@query(
    "text_boilerplate_ngrams",
    oracle=f"""
    WITH {_grams_sql()},
    top AS (
      SELECT g FROM grams GROUP BY g
      ORDER BY count(*) DESC, g LIMIT {BOILER_TOP_K}
    ), per_doc AS (
      SELECT grams.doc_id, count(*) AS n_grams, count(t.g) AS n_boiler
      FROM grams LEFT JOIN top t USING (g)
      GROUP BY grams.doc_id
    )
    SELECT doc_id, n_grams, n_boiler,
           floor(CAST(n_boiler AS DOUBLE) / n_grams * 10000 + 0.5) / 10000
             AS boiler_ratio
    FROM per_doc
    ORDER BY doc_id
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: the corpus's top-100 most frequent
    trigrams are 'boilerplate'; each document reports how much of it is made
    of them (occupancy ratio) — the CCNet/RefinedWeb-style signal used to
    drop templated/navigation text before training.

    100 TB shape: pass 1 is a partial-aggregated gram count (map-side
    combine, shuffle on gram) cut to top-K via TakeOrderedAndProject; the
    K-row result BROADCASTS back over pass 2's gram stream, so the only
    full shuffle keys on doc_id. At extreme scale pass 1's exact count
    swaps for a count-min/Misra-Gries heavy-hitter sketch — same broadcast
    contract. Ties at the K boundary break on the gram string, so the top
    set is deterministic and engine-independent."""
    d = spread(load_table(spark, sf_dir, "documents"))
    # explode_nonempty (r12): plain explode duplicates the n-gram array
    # build inside the inferred size>0 filter; gram strings are never null.
    grams = explode_nonempty(_with_words(d), _word_ngrams(), "g", "doc_id")
    top = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "g")
        .limit(BOILER_TOP_K)
        .select("g", F.lit(1).alias("boiler"))
    )
    per_doc = (
        grams.join(F.broadcast(top), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("boiler"), F.lit(0))).alias("n_boiler"),
        )
    )
    ratio = F.floor(
        F.col("n_boiler").cast("double") / F.col("n_grams") * 10000 + 0.5
    ) / 10000
    return per_doc.select(
        "doc_id", "n_grams", "n_boiler", ratio.alias("boiler_ratio")
    ).orderBy("doc_id")


@query(
    "text_perplexity_proxy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), counts AS (
      SELECT w, count(*) AS c FROM toks GROUP BY w
    ), total AS (
      SELECT sum(c) AS n FROM counts
    )
    SELECT doc_id, count(*) AS n_tokens, round(avg(-ln(c / n)), 4) AS avg_nll
    FROM toks JOIN counts USING (w) CROSS JOIN total
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality signal: each document's mean negative
    log-likelihood under the corpus's own unigram LM (p(w) = count/total) —
    the cheap stand-in for the KenLM-perplexity filter in CCNet-style
    curation: low avg_nll = repetitive/common text, high = rare-token soup.

    100 TB shape: the unigram table is one partial-aggregated count keyed on
    the token (vocabulary-sized output, ≪ corpus), BROADCAST back over the
    token stream; the per-doc mean is the only corpus-sized shuffle (keyed
    on doc_id). Two linear passes, no Python. The broadcast is safe because
    LM-filter vocabularies are CAPPED by construction (real KenLM filters
    train on a fixed top-K vocab with OOV smoothing); on an uncapped web
    corpus, first cut the count table to top-K by frequency (TakeOrdered,
    like text_boilerplate_ngrams) so the broadcast stays bounded."""
    d = spread(load_table(spark, sf_dir, "documents"))
    # explode_nonempty (r12): avoids the inferred size>0 filter re-running
    # split() per row (guide §4.4 duplicate-eval; measured ~9% on this
    # query). A dc-rewrite (groupBy(doc_id, w) first so the corpus is
    # tokenized once) was measured SLOWER at bench scale — the extra
    # (doc_id, w)-keyed exchange costs more than the second tokenize — and
    # was rejected; see OPTIMIZATION_r12.md.
    toks = explode_nonempty(d, F.split("text", " "), "w", "doc_id")
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("n"))
    logp = counts.crossJoin(F.broadcast(total)).select(
        "w", F.log(F.col("c") / F.col("n")).alias("lp")
    )
    return (
        toks.join(F.broadcast(logp), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.col("lp")), 4).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


TEMP_TAU = 0.5  # mixture temperature: weight_lang = n_lang^tau
TEMP_BUDGET = 200


@query(
    "sample_temperature",
    oracle=f"""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ), quotas AS (
      SELECT lang, CAST(floor({TEMP_BUDGET} * sqrt(n) / sum(sqrt(n)) OVER ())
                        AS INTEGER) AS quota
      FROM counts
    ), ranked AS (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS INTEGER) AS sample_rank
      FROM documents
    )
    SELECT r.lang, r.doc_id, r.sample_rank, q.quota
    FROM ranked r JOIN quotas q USING (lang)
    WHERE r.sample_rank <= q.quota
    ORDER BY r.lang, r.sample_rank
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture sampling: per-language quotas
    proportional to n^τ (τ=0.5) normalized to a 200-doc
    budget — the standard multilingual-pretraining rebalance (upsample the
    tail, downsample the head) — then a deterministic md5-ordered cut per
    stratum, so the draw reproduces across runs and engines.

    100 TB shape: the quota table is stratum-sized (a handful of rows —
    computed from one tiny aggregation and broadcast); the corpus pays one
    shuffle partitioned on the stratum key for the rank-and-cut, same plan
    as sample_stratified."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    wsum = counts.agg(F.sum(F.sqrt("n")).alias("w_total"))
    quotas = counts.crossJoin(F.broadcast(wsum)).select(
        "lang",
        F.floor(TEMP_BUDGET * F.sqrt("n") / F.col("w_total"))
        .cast("int")
        .alias("quota"),
    )
    rank_w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select(
        "doc_id", "lang", F.row_number().over(rank_w).alias("sample_rank")
    )
    return (
        ranked.join(F.broadcast(quotas), "lang")
        .where(F.col("sample_rank") <= F.col("quota"))
        .select("lang", "doc_id", "sample_rank", "quota")
        .orderBy("lang", "sample_rank")
    )


@query(
    "text_repetition_filter",
    oracle=f"""
    WITH {_grams_sql()},
    per_gram AS (
      SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
    )
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(sum(c) - count(*) AS BIGINT) AS n_repeated,
           floor((sum(c) - count(*)) * 10000.0 / sum(c) + 0.5) / 10000
             AS rep_ratio
    FROM per_gram GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (the Gopher/MassiveText quality filter):
    fraction of a doc's trigrams that are repeats of an earlier trigram in
    the SAME doc — high ratio flags looping/spammy generations and
    boilerplate-stuffed pages.

    100 TB shape: entirely per-row higher-order array functions — distinct
    count vs total count of the in-row gram array. ZERO hash shuffle (the
    plan's only exchange is the deterministic output ordering); this is an
    embarrassingly parallel map that scales with executors, period."""
    d = load_table(spark, sf_dir, "documents")
    # gram array hoisted to an attribute: it is consumed three times below
    # (two sizes + array_distinct) and would otherwise be rebuilt per use
    g = F.col("__g")
    n_grams = F.size(g).cast("long")
    n_rep = (F.size(g) - F.size(F.array_distinct(g))).cast("long")
    ratio = F.floor(n_rep * 10000.0 / n_grams + 0.5) / 10000
    return (
        _with_words(d)
        .select("doc_id", _word_ngrams().alias("__g"))
        .select(
            "doc_id",
            n_grams.alias("n_grams"),
            n_rep.alias("n_repeated"),
            ratio.alias("rep_ratio"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_word_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w
    ), tot AS (
      SELECT doc_id, sum(c) AS n FROM freq GROUP BY doc_id
    )
    SELECT f.doc_id,
           round(-sum((c / n) * ln(c / n)), 4) AS word_entropy,
           round(ln(count(*)), 4) AS max_entropy
    FROM freq f JOIN tot USING (doc_id)
    GROUP BY f.doc_id
    ORDER BY f.doc_id
    """,
)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-distribution entropy per document (gibberish / diversity
    signal): Shannon entropy of the doc's own word frequencies in nats,
    with ln(n_distinct) as the attainable maximum — near-zero entropy is a
    single word repeated, near-max is no word reused.

    100 TB shape: per-row higher-order functions again — in-row frequency
    vector via array_distinct + filter counts, entropy via F.aggregate.
    ZERO hash shuffle; the DuckDB oracle computes the identical quantity
    the relational way (explode → per-doc GROUP BY), making this a
    cross-paradigm differential check of the same statistic."""
    d = load_table(spark, sf_dir, "documents")
    # token array / size / distinct set hoisted to REAL attributes: embedded
    # in the transform lambda they re-evaluate per DISTINCT WORD (Catalyst
    # does not CSE across lambda boundaries — the hashed_shingle_sets
    # lesson), turning per-row work into O(distinct · tokenize)
    base = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("__w")
    ).select(
        "doc_id", "__w",
        F.size("__w").cast("double").alias("__n"),
        F.array_distinct("__w").alias("__dist"),
    )
    w, n, dist = F.col("__w"), F.col("__n"), F.col("__dist")
    counts = F.transform(
        dist, lambda x: F.size(F.filter(w, lambda y: y == x)).cast("double")
    )
    entropy = -F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, c: acc + (c / n) * F.log(c / n),
    )
    return base.select(
        "doc_id",
        F.round(entropy, 4).alias("word_entropy"),
        F.round(F.log(F.size(dist).cast("double")), 4).alias("max_entropy"),
    ).orderBy("doc_id")


SPLIT_SEED = "corpus-split-v1"  # version the assignment; bump => full re-split
SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 5  # test gets the remainder


def hash_split_col(key_col: Column) -> Column:
    """'train'/'val'/'test' assignment column for a stable key — THE split
    function (sample_hash_split and any pipeline embedding the split must
    call this, never re-derive the expression, or assignments drift):
    bucket = first 8 hex chars of md5(seed:key) as an int mod 100."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(SPLIT_SEED), key_col.cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long") % 100
    )
    return (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )


@query(
    "sample_hash_split",
    oracle=f"""
    WITH buckets AS (
      SELECT doc_id, source,
             CAST(concat('0x', substr(
               md5('{SPLIT_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8)
             ) AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN bucket < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN bucket < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM buckets
    ORDER BY doc_id
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by seeded content-key hash —
    the production replacement for randomSplit (U2): the same document lands
    in the same split on every run, on every engine, regardless of partition
    layout or row order, because the assignment is a pure function
    md5(seed:doc_id) → bucket ∈ [0,100) → split. Seeded, so a new SPLIT_SEED
    re-rolls the assignment; keyed on the stable doc_id so re-ingesting a
    shard can't migrate documents between splits (keying on a content digest
    instead gives the dedup-aware variant — same plan).

    100 TB shape: a per-row map, ZERO shuffle — the narrowest possible plan
    (the ORDER BY here is presentation for the differential check). Contrast
    with randomSplit, whose per-partition RNG makes the assignment depend on
    partitioning and is rows-only-checkable; this one hash-matches DuckDB
    exactly."""
    d = load_table(spark, sf_dir, "documents")
    split = hash_split_col(F.col("doc_id"))
    return d.select("doc_id", "source", split.alias("split")).orderBy("doc_id")


# --- overlapping chunking (context-window preparation) ----------------------

CHUNK_TOKENS = 32  # tokens per chunk (sized to this corpus's ~54-token docs;
CHUNK_STRIDE = 24  # real pipelines use e.g. 2048/1536 — same plan shape)


@query(
    "text_chunk_overlap",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    chunks AS (
      SELECT doc_id, i AS chunk_idx,
             i * {CHUNK_STRIDE} + 1 AS start_pos,
             w[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_TOKENS}] AS cw
      FROM (SELECT doc_id, w,
                   unnest(range(0, (len(w) - 1) // {CHUNK_STRIDE} + 1)) AS i
            FROM toks)
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(start_pos AS BIGINT) AS start_pos,
           CAST(len(cw) AS BIGINT) AS n_tokens,
           md5(array_to_string(cw, ' ')) AS chunk_md5
    FROM chunks ORDER BY doc_id, chunk_idx
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunking — split every document into
    CHUNK_TOKENS-token windows advancing by CHUNK_STRIDE (overlap =
    CHUNK_TOKENS - CHUNK_STRIDE), the standard context-window preparation
    for both pretraining (sliding-window LM chunks) and retrieval corpora.
    Each chunk carries its provenance (doc_id, chunk_idx, start_pos, token
    count) and a content digest standing in for the chunk body so the
    differential check hashes 32-byte digests, not text.

    100 TB shape: a pure per-row map (sequence → transform → posexplode) —
    ZERO shuffle; the ORDER BY is presentation for the differential check.
    Chunk fan-out is bounded (≈ n_tokens / stride per doc) and rides the
    document partitioning, exactly how a 1000-node chunking job shards."""
    d = load_table(spark, sf_dir, "documents")
    return chunk_docs(d).orderBy("doc_id", "chunk_idx")


def chunk_docs(
    d: DataFrame, width: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """DataFrame-level core of `text_chunk_overlap` (reusable on any
    (doc_id, text) frame): overlapping width-token chunks every `stride`
    tokens, with provenance and a per-chunk content digest."""
    w = F.split(F.col("text"), " ")
    starts = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(w) - 1) / stride)),
        lambda i: (i * stride + 1).cast("long"),
    )
    # posexplode rides next to the text column, so the chunk slice is
    # recomputed on the exploded row — one scan, one narrow stage, no join
    exploded = d.select(
        "doc_id", "text", F.posexplode(starts).alias("chunk_idx", "start")
    )
    chunk = F.slice(F.split(F.col("text"), " "), F.col("start").cast("int"), width)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start").alias("start_pos"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


DOMAIN_CAP = 60  # max docs kept per source domain


@query(
    "curation_domain_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk,
             count(*) OVER (PARTITION BY source) AS source_total
      FROM documents
    )
    SELECT doc_id, source,
           CAST(source_total AS BIGINT) AS source_total,
           rk <= {DOMAIN_CAP} AS kept
    FROM ranked
    ORDER BY doc_id
    """,
)
def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping: keep at most DOMAIN_CAP documents per source domain,
    chosen in a deterministic pseudo-random order (md5 of the doc id) — the
    standard pretraining guard against one crawl domain dominating the
    mixture (the cap is what C4/RefinedWeb-class pipelines apply to
    boilerplate-heavy hosts). Emits a per-doc keep verdict plus the domain's
    total so downstream stages can log what the cap discarded — no silent
    truncation.

    100 TB shape: one shuffle partitioned on source for the rank window
    (same plan family as sample_stratified); md5 order makes the draw
    engine-independent and reproducible, unlike rand()-sampling. Skewed
    domains (the reason the cap exists) cost one hot partition ONCE, and
    the window is a streaming rank — no buffering of the domain's rows."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return d.select(
        "doc_id",
        "source",
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("source_total"),
        (F.row_number().over(w) <= DOMAIN_CAP).alias("kept"),
    ).orderBy("doc_id")


@query(
    "dedup_url_canonical",
    oracle="""
    WITH synth AS (
      SELECT doc_id,
             'https://' ||
             CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END ||
             '.example.com/articles/' || CAST(doc_id % 25 AS VARCHAR) ||
             CASE WHEN doc_id % 2 = 0
                  THEN '?utm_source=feed&utm_campaign=c' || CAST(doc_id AS VARCHAR)
                  ELSE '' END ||
             CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END AS url
      FROM documents
    ), canon AS (
      SELECT doc_id,
             lower(regexp_replace(regexp_replace(url, '[?#].*$', ''),
                                  '/+$', '')) AS canonical_url
      FROM synth
    )
    SELECT canonical_url,
           min(doc_id) AS canonical_id,
           count(*)    AS n_aliases
    FROM canon
    GROUP BY canonical_url
    HAVING count(*) > 1
    ORDER BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup: normalize crawl URLs (lowercase host,
    strip query strings — tracking params like utm_* — and fragments, drop
    trailing slashes) and group records that alias the same canonical page.
    The first dedup stage of a web-crawl pipeline: it removes the
    `?utm_campaign=`-style duplicate fetches BEFORE any content hashing.

    URLs are synthesized analytically from (doc_id, source) — same
    closed-form-manifest discipline as the multimodal oracles, so both
    engines derive identical inputs and the check exercises the
    canonicalization operator itself.

    100 TB shape: canonicalization is pure JVM regexp (codegen, zero
    shuffle); the group-by shuffles the short canonical-URL string once —
    same plan as dedup_exact with the URL as the digest."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.com/articles/"),
        (F.col("doc_id") % 25).cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("?utm_source=feed&utm_campaign=c"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    canonical = F.lower(
        F.regexp_replace(F.regexp_replace(url, r"[?#].*$", ""), r"/+$", "")
    )
    return (
        d.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_aliases"),
        )
        .where(F.col("n_aliases") > 1)
        .orderBy("canonical_url")
    )


TRUNC_CONTEXT = 512  # tokens: docs beyond this get truncated by the packer


@query(
    "curation_length_profile",
    oracle=f"""
    WITH toks AS (
      SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(quantile_cont(n_tokens, 0.1), 2)  AS p10,
           round(quantile_cont(n_tokens, 0.5), 2)  AS p50,
           round(quantile_cont(n_tokens, 0.9), 2)  AS p90,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(CASE WHEN n_tokens > {TRUNC_CONTEXT} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_over_context,
           round(CAST(sum(CASE WHEN n_tokens > {TRUNC_CONTEXT}
                               THEN n_tokens - {TRUNC_CONTEXT} ELSE 0 END)
                      AS DOUBLE)
                 / sum(n_tokens) * 10000) / 10000 AS truncation_loss
    FROM toks
    GROUP BY source
    ORDER BY source
    """,
)
def curation_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length profile: doc counts, token totals, exact
    p10/p50/p90 length percentiles, and the truncation diagnostics a
    context-window decision needs — how many docs exceed the 512-token
    context and what fraction of the corpus' tokens a hard truncation at
    that length would discard. This is the report that sizes PACK_CONTEXT
    before a packing run, and the distribution drift monitor afterwards.

    100 TB shape: token counts are a per-row expression (no explode — the
    split array is sized, never shuffled); ONE hash aggregation on source
    computes every statistic including the exact interpolated percentiles
    (Spark `percentile` == DuckDB `quantile_cont`; at real scale swap for
    approx_percentile and drop the exactness pin)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    over = F.col("n_tokens") > TRUNC_CONTEXT
    lost = F.when(over, F.col("n_tokens") - TRUNC_CONTEXT).otherwise(0)
    return (
        toks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.expr("percentile(n_tokens, 0.1)"), 2).alias("p10"),
            F.round(F.expr("percentile(n_tokens, 0.5)"), 2).alias("p50"),
            F.round(F.expr("percentile(n_tokens, 0.9)"), 2).alias("p90"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum(F.when(over, 1).otherwise(0)).cast("long").alias("n_over_context"),
            (
                F.round(
                    F.sum(lost).cast("double") / F.sum("n_tokens") * 10000
                ) / 10000
            ).alias("truncation_loss"),
        )
        .orderBy("source")
    )


# Target language mixture for the mixture-planning report (the
# Pile/Dolma-style "what do we sample from where" table). English-heavy
# with equal tails — the binding constraint is whichever language has the
# least headroom relative to its target share.
MIX_TARGET_WEIGHTS = (
    ("en", 0.5), ("de", 0.125), ("es", 0.125), ("fr", 0.125), ("zh", 0.125),
)


@query(
    "curation_mix_weights",
    oracle=f"""
    WITH w(lang, tw) AS (VALUES {", ".join(f"('{l}', CAST({t} AS DOUBLE))" for l, t in MIX_TARGET_WEIGHTS)}),
    avail AS (
      SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS avail_tokens
      FROM documents GROUP BY lang
    ), j AS (
      SELECT a.lang, avail_tokens, tw, avail_tokens / tw AS cap
      FROM avail a JOIN w ON w.lang = a.lang
    ), b AS (SELECT min(cap) AS budget FROM j)
    SELECT lang, avail_tokens, tw AS target_weight,
           CAST(floor(budget * tw) AS BIGINT) AS alloc_tokens,
           round(budget * tw / avail_tokens, 6) AS sample_rate,
           cap = budget AS binding
    FROM j, b ORDER BY lang
    """,
)
def curation_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixture planning (the Pile/Dolma mixture table): given
    target LANGUAGE weights and the corpus's available tokens per
    language, compute the maximum total token budget reachable WITHOUT
    upsampling (min over languages of available/weight — the binding
    constraint), each language's allocation, and the per-language sampling
    rate a downstream `sample_hash_split`-style pass would apply. The
    `binding` flag marks the language that caps the whole mixture — the
    answer to "what do we need more of".

    100 TB shape: ONE hash aggregation over the corpus (token counts per
    language — map-side combining, 5 groups), a broadcast join against the
    5-row weight table, and a 1-row budget broadcast back. The corpus is
    scanned once; everything after is constant-size arithmetic, identical
    expression order in both engines so the doubles compare exactly."""
    d = load_table(spark, sf_dir, "documents")
    w = spark.createDataFrame(list(MIX_TARGET_WEIGHTS), "lang string, tw double")
    avail = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("avail_tokens")
    )
    j = avail.join(F.broadcast(w), "lang").withColumn(
        "cap", F.col("avail_tokens") / F.col("tw")
    )
    budget = j.agg(F.min("cap").alias("budget"))
    return (
        j.crossJoin(F.broadcast(budget))
        .select(
            "lang",
            "avail_tokens",
            F.col("tw").alias("target_weight"),
            F.floor(F.col("budget") * F.col("tw")).cast("long").alias("alloc_tokens"),
            F.round(
                F.col("budget") * F.col("tw") / F.col("avail_tokens"), 6
            ).alias("sample_rate"),
            (F.col("cap") == F.col("budget")).alias("binding"),
        )
        .orderBy("lang")
    )
