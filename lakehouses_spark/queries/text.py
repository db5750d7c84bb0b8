"""Text analysis over `documents` (SURVEY §2.12): token stats, quality
scoring, language-ID heuristic, bag-of-words fingerprinting, n-gram
frequencies.

All pure built-ins (split / higher-order array funcs / sha2) — the entire
text pipeline runs inside whole-stage codegen, so it scales as a plain map +
agg with no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F

from lakehouses_spark.io import explode_nonempty, load_table, spread
from lakehouses_spark.registry import query

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def _words(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER)                AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_unique,
           length(text)                                                 AS n_chars_measured,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 4)                     AS avg_token_len
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct count, char stats."""
    d = load_table(spark, sf_dir, "documents")
    w = _words()
    return d.select(
        "doc_id",
        F.size(w).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("int").alias("n_unique"),
        F.length("text").alias("n_chars_measured"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / F.size(w), 4
        ).alias("avg_token_len"),
    ).orderBy("doc_id")


@query(
    "text_quality_score",
    oracle=None,  # oracle assigned at module foot (built from STOPWORDS)
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, lexical diversity, length band —
    composite score in [0,1]."""
    d = load_table(spark, sf_dir, "documents")
    w = _words()
    n_tokens = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_tokens
    diversity = F.size(F.array_distinct(w)).cast("double") / n_tokens
    length_band = F.when((n_tokens >= 20) & (n_tokens <= 80), 1.0).otherwise(0.5)
    raw_score = (1.0 - stop_ratio) * 0.3 + diversity * 0.4 + length_band * 0.3
    # floor(x*1e4+0.5)/1e4: rounding-mode-independent half-up (Spark rounds
    # half-up, DuckDB half-even — scores land exactly on .5 boundaries)
    score = F.floor(raw_score * 10000 + 0.5) / 10000
    return d.select(
        "doc_id",
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(diversity, 4).alias("diversity"),
        length_band.alias("length_band"),
        score.alias("quality_score"),
    ).orderBy("doc_id")


# real oracle for text_quality_score (built after the decorator for clarity)
_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
from lakehouses_spark.registry import QUERIES as _Q  # noqa: E402

_Q["text_quality_score"].oracle = f"""
WITH base AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
                         w -> list_contains({_STOP_SQL}, w))) AS n_stop,
         len(list_distinct(string_split(text, ' '))) AS n_unique
  FROM documents
)
SELECT doc_id,
       round(CAST(n_stop AS DOUBLE) / n_tokens, 4)   AS stop_ratio,
       round(CAST(n_unique AS DOUBLE) / n_tokens, 4) AS diversity,
       CAST(CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.5 END AS DOUBLE)
         AS length_band,
       floor(((1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
              + CAST(n_unique AS DOUBLE) / n_tokens * 0.4
              + CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.5 END * 0.3)
             * 10000 + 0.5) / 10000
         AS quality_score
FROM base
ORDER BY doc_id
"""

LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
}


@query(
    "text_langid",
    oracle=None,  # oracle assigned at module foot (built from LANG_MARKERS)
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: count marker-stopword hits per language,
    argmax with deterministic preference order (en > es > fr > de > unk)."""
    d = load_table(spark, sf_dir, "documents")
    w = _words()
    def marker_hits(markers: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(w, lambda x: F.array_contains(arr, x)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    guess = (
        F.when(best == 0, "unk")
        .when(scores["en"] == best, "en")
        .when(scores["es"] == best, "es")
        .when(scores["fr"] == best, "fr")
        .otherwise("de")
    )
    return d.select(
        "doc_id",
        "lang",
        guess.alias("guessed_lang"),
        (guess == F.col("lang")).alias("correct"),
    ).orderBy("doc_id")


def _markers_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"


_Q["text_langid"].oracle = f"""
WITH scores AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), w -> list_contains({_markers_sql('en')}, w))) AS s_en,
         len(list_filter(string_split(text, ' '), w -> list_contains({_markers_sql('es')}, w))) AS s_es,
         len(list_filter(string_split(text, ' '), w -> list_contains({_markers_sql('fr')}, w))) AS s_fr,
         len(list_filter(string_split(text, ' '), w -> list_contains({_markers_sql('de')}, w))) AS s_de
  FROM documents
), guessed AS (
  SELECT doc_id, lang,
         CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'unk'
              WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
              WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
              WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
              ELSE 'de' END AS guessed_lang
  FROM scores
)
SELECT doc_id, lang, guessed_lang, guessed_lang = lang AS correct
FROM guessed
ORDER BY doc_id
"""


BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{BPE_ISH}')) AS INTEGER) AS n_bpe_tokens,
           CAST(len(string_split(text, ' ')) AS INTEGER)               AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER)   AS n_number_tokens,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INTEGER)
             AS n_punct_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish: pre-tokenizer regex (letter runs / digit
    runs / single punctuation — the GPT-2 pre-tokenization shape) alongside
    the whitespace count. Pure regexp_extract_all, JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH), 0)).cast("int").alias("n_bpe_tokens"),
        F.size(_words()).cast("int").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).cast("int").alias("n_number_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0)).cast("int").alias("n_punct_tokens"),
    ).orderBy("doc_id")


@query(
    "text_fingerprint",
    oracle="""
    SELECT min(doc_id) AS canonical_id, count(*) AS n_docs,
           sha256(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fingerprint
    FROM documents
    GROUP BY 3
    ORDER BY canonical_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: canonical bag-of-words digest — docs that are
    permutations/repetitions of the same vocabulary collide. The digest is
    the shuffle key, so clustering cost is independent of document length."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.sha2(F.array_join(F.array_sort(F.array_distinct(_words())), " "), 256)
    return (
        d.groupBy(fp.alias("fingerprint"))
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
        .select("canonical_id", "n_docs", "fingerprint")
        .orderBy("canonical_id")
    )


@query(
    "text_bigram_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), positions AS (
      SELECT doc_id, words, unnest(generate_series(1, len(words) - 1)) AS i
      FROM toks
    ), bigrams AS (
      SELECT words[i] || ' ' || words[i + 1] AS bigram FROM positions
    )
    SELECT bigram, count(*) AS n
    FROM bigrams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 bigrams: shingle-explode + count + TakeOrdered. The
    classic n-gram LM-corpus statistics job."""
    d = spread(load_table(spark, sf_dir, "documents"))
    # token array hoisted to an attribute — embedding split() in the lambda
    # re-tokenizes the doc per bigram element (see hashed_shingle_sets)
    w = F.col("__w")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: F.concat_ws(" ", F.element_at(w, i + 1), F.element_at(w, i + 2)),
    )
    # explode_nonempty (r12): plain explode makes InferFiltersFromGenerate
    # rebuild the whole bigram array a second time per row inside the
    # inferred size>0 filter; concat_ws elements are never null.
    return (
        explode_nonempty(d.select(_words().alias("__w")), bigrams, "bigram")
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


# end-to-end curation keep-list: the operator a training-data pipeline
# actually runs — exact-dedup canonicalization ∩ quality gate. SQL-expressible
# end to end, so it gets a full oracle (unlike the MinHash tier).
_QUALITY_SUBQUERY = _Q["text_quality_score"].oracle.replace("ORDER BY doc_id", "")


@query("curation_keeplist", oracle=None)  # oracle assigned below
def curation_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-list: canonical (min-doc_id per exact-content group) documents
    whose quality score clears 0.75 — dedup + quality filter composed, the
    shape of a pretraining corpus curation pass. Both stages shuffle only
    digests/scores, never document bodies."""
    from lakehouses_spark.queries.dedup import dedup_exact

    canon = dedup_exact(spark, sf_dir).select(
        F.col("canonical_id").alias("doc_id")
    )
    quality = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    return (
        canon.join(quality, "doc_id")
        .where(F.col("quality_score") >= 0.75)
        .orderBy("doc_id")
    )


_Q["curation_keeplist"].oracle = f"""
WITH canon AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
), quality AS (
{_QUALITY_SUBQUERY}
)
SELECT c.doc_id, q.quality_score
FROM canon c JOIN quality q ON q.doc_id = c.doc_id
WHERE q.quality_score >= 0.75
ORDER BY c.doc_id
"""


# ---------------------------------------------------------------------------
# PII scrubbing — the redaction stage of a training-data pipeline. The
# corpus has no natural PII, so (twin-injection pattern, as with the
# minhash/ANN oracles) both engines deterministically append synthetic
# emails/phones keyed on doc_id, then must produce byte-identical scrubbed
# text (md5-compared) and identical match counts. All JVM-side regexp —
# no Python, no shuffle beyond output ordering.
# ---------------------------------------------------------------------------
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com now' ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' or call 415-555-0142 today' ELSE '' END
               AS text
      FROM documents
      WHERE doc_id % 7 = 0 OR doc_id % 11 = 0
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS clean_hash
    FROM injected
    ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        (F.col("doc_id") % 7 == 0) | (F.col("doc_id") % 11 == 0)
    )
    injected = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit(" or call 415-555-0142 today")
            ).otherwise(F.lit("")),
        ),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_PHONE_RE),
        F.lit("<PHONE>"),
    )
    return (
        injected.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(_EMAIL_RE)).alias("n_emails"),
            F.regexp_count(F.col("text"), F.lit(_PHONE_RE)).alias("n_phones"),
            F.md5(scrubbed).alias("clean_hash"),
        )
        .orderBy("doc_id")
    )


TFIDF_TOP_K = 5


@query(
    "text_tfidf_terms",
    # idf uses the same ln() on the same integers in both engines, so the
    # doubles (and therefore the ordering) are bit-identical; the window
    # tiebreak (score desc, term asc) makes top-k deterministic
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    tf AS (SELECT lang, term, count(*) AS tf FROM toks GROUP BY lang, term),
    scored AS (
      SELECT lang, term, tf,
             tf * ln(CAST(n_docs AS DOUBLE) / df) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT lang, term, tf,
             round(score, 4) AS tfidf,
             row_number() OVER (
               PARTITION BY lang ORDER BY score DESC, term
             ) AS rank
      FROM scored
    )
    SELECT lang, CAST(rank AS INT) AS rank, term, tf, tfidf
    FROM ranked WHERE rank <= {TFIDF_TOP_K}
    ORDER BY lang, rank
    """,
)
def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF terms per language — the classic corpus-characterization
    report (which terms distinguish each language's documents from the
    corpus at large). tf counts a term's occurrences within the language
    stratum; idf = ln(N_docs / df) over the whole corpus.

    100 TB shape: two hash aggregations over exploded tokens (term df and
    per-stratum tf — both shrink to vocabulary-sized tables), the df table
    joined back BROADCAST (a vocabulary is bounded; this corpus's is ~40
    terms, a real one ~10⁶ — still broadcastable), and a per-language
    window over vocabulary-sized input for the top-k. The token explosion
    itself never shuffles document text — only (doc_id, term) pairs."""
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    # explode_nonempty (r12): avoids the inferred size>0 filter re-running
    # split() per row; split elements are never null.
    toks = explode_nonempty(d, F.split("text", " "), "term", "doc_id", "lang")
    n_docs = d.count()
    df_tbl = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tf_tbl = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    score = (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("score")
    scored = tf_tbl.join(F.broadcast(df_tbl), "term").select("lang", "term", "tf", score)
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.select(
            "lang",
            F.row_number().over(w).alias("rank"),
            "term",
            "tf",
            F.round("score", 4).alias("tfidf"),
        )
        .where(F.col("rank") <= TFIDF_TOP_K)
        .orderBy("lang", "rank")
    )


@query("curation_pipeline_report", oracle=None)  # oracle assigned below
def curation_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel report: per-source document counts surviving each
    gate of the standard pretraining pipeline — raw → exact-dedup canonical
    → quality ≥ 0.75 → (training split ∧ decontaminated). The drop counts
    between stages are what a dataset card publishes and what an operator
    watches for gate regressions; composing the REGISTERED gate operators
    (dedup_exact, text_quality_score, text_decontaminate) means the report
    is definitionally consistent with the pipeline it describes.

    100 TB shape: each gate keeps its own scalable plan (digest group-by,
    per-row expression, broadcast gram probe); the report joins only
    doc_id-keyed verdict columns — never document bodies — and the final
    rollup is one tiny per-source aggregation. Conditional counts are
    sum(CASE...) so all four funnel stages come from ONE pass over the
    flags table."""
    from lakehouses_spark.queries.dedup import dedup_exact

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    canon = dedup_exact(spark, sf_dir).select(
        F.col("canonical_id").alias("doc_id"), F.lit(True).alias("is_canon")
    )
    quality = text_quality_score(spark, sf_dir).select(
        "doc_id", (F.col("quality_score") >= 0.75).alias("is_q")
    )
    from lakehouses_spark.queries.curation import text_decontaminate, BENCH_MOD

    contaminated = text_decontaminate(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("is_dirty")
    )
    flags = (
        d.join(canon, "doc_id", "left")
        .join(quality, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .select(
            "source",
            F.coalesce("is_canon", F.lit(False)).alias("is_canon"),
            F.coalesce("is_q", F.lit(False)).alias("is_q"),
            ((F.col("doc_id") % BENCH_MOD != 0)
             & F.coalesce(~F.col("is_dirty"), F.lit(True))).alias("is_final_ok"),
        )
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            cnt(F.col("is_canon")).alias("n_canonical"),
            cnt(F.col("is_canon") & F.col("is_q")).alias("n_quality"),
            cnt(
                F.col("is_canon") & F.col("is_q") & F.col("is_final_ok")
            ).alias("n_final"),
        )
        .orderBy("source")
    )


from lakehouses_spark.queries.curation import _grams_sql as _curation_grams_sql  # noqa: E402
from lakehouses_spark.queries.curation import BENCH_MOD as _BENCH_MOD  # noqa: E402

_Q["curation_pipeline_report"].oracle = f"""
WITH canon AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
), quality AS (
{_QUALITY_SUBQUERY}
), {_curation_grams_sql().lstrip()},
bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {_BENCH_MOD} = 0
), contaminated AS (
  SELECT DISTINCT t.doc_id FROM grams t JOIN bench USING (g)
  WHERE t.doc_id % {_BENCH_MOD} <> 0
), flags AS (
  SELECT d.doc_id, d.source,
         (c.doc_id IS NOT NULL) AS is_canon,
         coalesce(q.quality_score >= 0.75, FALSE) AS is_q,
         (d.doc_id % {_BENCH_MOD} <> 0 AND x.doc_id IS NULL) AS is_final_ok
  FROM documents d
  LEFT JOIN canon c ON c.doc_id = d.doc_id
  LEFT JOIN quality q ON q.doc_id = d.doc_id
  LEFT JOIN contaminated x ON x.doc_id = d.doc_id
)
SELECT source,
       count(*) AS n_raw,
       CAST(sum(CASE WHEN is_canon THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
       CAST(sum(CASE WHEN is_canon AND is_q THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality,
       CAST(sum(CASE WHEN is_canon AND is_q AND is_final_ok THEN 1 ELSE 0 END)
            AS BIGINT) AS n_final
FROM flags GROUP BY source ORDER BY source
"""
