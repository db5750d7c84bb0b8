"""Invariant tests for the corpus-curation operators (beyond the DuckDB
oracle differential): packing conservation, quota arithmetic, injected
contamination recall, repetition/entropy bounds, incremental-dedup verdict
consistency. Synthetic corpora are written as documents.parquet into a tmp
dir so the registered query fns run unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouses_spark.queries.curation import (
    PACK_CONTEXT,
    TEMP_BUDGET,
    pack_sequences,
    sample_temperature,
    text_decontaminate,
    text_repetition_filter,
    text_word_entropy,
)
from lakehouses_spark.queries.dedup import dedup_incremental

SF = "/root/testdata/sf0.01"

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows):
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows], DOC_SCHEMA
    ).write.mode("overwrite").parquet(path)
    return str(tmp_path)


def test_pack_sequences_conserves_docs_and_tokens(spark):
    """Concat-and-chunk must partition the corpus: every doc in exactly one
    bin, token totals conserved, bin ids contiguous from 0 per source."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    n_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0].n
    bins = pack_sequences(spark, SF).collect()
    assert sum(r.n_docs for r in bins) == n_docs
    assert sum(r.total_tokens for r in bins) == n_tokens
    by_source: dict[str, list[int]] = {}
    for r in bins:
        by_source.setdefault(r.source, []).append(r.bin_id)
    for src, ids in by_source.items():
        assert sorted(ids) == list(range(len(ids))), src
    # a bin's payload can only exceed the context by its last doc's spill
    for r in bins:
        assert r.n_docs >= 1
        assert r.first_doc <= r.last_doc


def test_sample_temperature_quota_arithmetic(spark):
    """Quota sum never exceeds the budget; each stratum delivers exactly
    min(quota, stratum size) docs; the draw is deterministic."""
    out = sample_temperature(spark, SF)
    rows = out.collect()
    quotas = {r.lang: r.quota for r in rows}
    assert sum(quotas.values()) <= TEMP_BUDGET
    sizes = {
        r.lang: r.n
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    from collections import Counter

    drawn = Counter(r.lang for r in rows)
    for lang, quota in quotas.items():
        assert drawn[lang] == min(quota, sizes[lang]), lang
    assert [tuple(r) for r in out.collect()] == [tuple(r) for r in rows]


def test_decontaminate_flags_injected_overlap(spark, tmp_path):
    """A training doc sharing a trigram with the benchmark split (doc 0)
    must be flagged; a disjoint doc must not."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "alpha beta gamma delta epsilon"),  # benchmark (0 % 97 == 0)
            (1, "alpha beta gamma something else entirely"),  # overlaps
            (2, "zeta eta theta iota kappa"),  # disjoint
        ],
    )
    got = {r.doc_id: r.n_overlap for r in text_decontaminate(spark, sf).collect()}
    assert got == {1: 1}


def test_repetition_filter_detects_within_doc_repeats(spark, tmp_path):
    """'a b c a b c a b c' repeats its trigrams; an all-distinct doc has
    rep_ratio 0."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c a b c a b c"),
            (2, "one two three four five six"),
        ],
    )
    got = {r.doc_id: r for r in text_repetition_filter(spark, sf).collect()}
    assert got[2].n_repeated == 0 and got[2].rep_ratio == 0.0
    # 7 trigrams, only 3 distinct ('a b c','b c a','c a b') => 4 repeats
    assert got[1].n_grams == 7 and got[1].n_repeated == 4
    assert got[1].rep_ratio == pytest.approx(4 / 7, abs=1e-4)


def test_word_entropy_bounds(spark, tmp_path):
    """0 <= entropy <= max_entropy; single repeated word => 0; all-distinct
    doc achieves the maximum exactly."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "same same same same"),
            (2, "w1 w2 w3 w4 w5"),
        ],
    )
    got = {r.doc_id: r for r in text_word_entropy(spark, sf).collect()}
    assert got[1].word_entropy == 0.0
    assert got[2].word_entropy == got[2].max_entropy
    for r in got.values():
        assert -1e-9 <= r.word_entropy <= r.max_entropy + 1e-9
    full = text_word_entropy(spark, SF).collect()
    assert all(0 <= r.word_entropy <= r.max_entropy + 1e-9 for r in full)


def test_incremental_dedup_verdicts_consistent(spark):
    """Every incoming doc gets exactly one verdict; dup targets precede the
    doc and are accepted-or-existing; accepted digests are unique across
    existing ∪ accepted."""
    rows = dedup_incremental(spark, SF).collect()
    incoming = {r.doc_id for r in rows}
    assert all(r.doc_id % 2 == 1 for r in rows)
    accepted = {r.doc_id for r in rows if r.status == "accepted"}
    for r in rows:
        if r.status == "accepted":
            assert r.dup_of is None
        elif r.status == "dup_of_existing":
            assert r.dup_of is not None and r.dup_of % 2 == 0
        else:
            assert r.status == "dup_within_batch"
            assert r.dup_of in incoming and r.dup_of < r.doc_id
            # the within-batch canonical target must itself not be an
            # existing-dup — otherwise existing would have claimed this doc
            target = next(x for x in rows if x.doc_id == r.dup_of)
            assert target.status in ("accepted", "dup_of_existing")
    # accepted docs never collide with each other
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    digest = F.sha2(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " "),
        256,
    )
    dg = {r.doc_id: r.d for r in docs.select("doc_id", digest.alias("d")).collect()}
    acc_digests = [dg[i] for i in accepted]
    assert len(acc_digests) == len(set(acc_digests))
    existing_digests = {dg[i] for i in dg if i % 2 == 0}
    assert not (set(acc_digests) & existing_digests)


def test_hash_split_deterministic_and_partition_independent(spark):
    from lakehouses_spark.queries.curation import sample_hash_split

    a = {r.doc_id: r.split for r in sample_hash_split(spark, SF).collect()}
    # re-running yields the identical assignment (pure function of doc_id —
    # no RNG state, no partition-layout dependence, the randomSplit failure
    # mode this operator exists to eliminate)
    b = {r.doc_id: r.split for r in sample_hash_split(spark, SF).collect()}
    assert a == b
    # proportions near 90/5/5 (md5 buckets are uniform; 500 docs → loose band)
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.82 <= frac_train <= 0.97
    assert set(a.values()) <= {"train", "val", "test"}


def test_matview_rollup_merges_instead_of_rebuilding(spark, tmp_path):
    """The second drain must arrive as MERGE commits on the SAME gold table
    (not a rebuild): version strictly increases and windows from batch one
    survive untouched when batch two only adds later windows."""
    from lakehouses_spark.io import load_table
    from lakehouses_spark.streaming.materialized import start_rollup_view
    from lakehouses_spark.tables import LakeTable

    events = load_table(spark, SF, "events")
    # time-ordered cutoffs computed from the data, not from calendar
    # assumptions about the generator: batch 2 is strictly later than batch 1
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    c1 = lo + (hi - lo) / 10
    c2 = lo + 2 * (hi - lo) / 10
    bronze = LakeTable.create(
        spark, tmp_path / "bronze", events.where(F.col("ts") <= F.lit(c1))
    )
    q = start_rollup_view(spark, bronze.path, tmp_path / "gold", tmp_path / "ck")
    q.awaitTermination()
    gold = LakeTable(spark, tmp_path / "gold")
    v1 = gold.version
    first = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in gold.read().collect()
    }
    bronze.append(
        events.where((F.col("ts") > F.lit(c1)) & (F.col("ts") <= F.lit(c2)))
    )
    q = start_rollup_view(spark, bronze.path, tmp_path / "gold", tmp_path / "ck")
    q.awaitTermination()
    assert gold.version > v1
    after = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in gold.read().collect()
    }
    # pre-cutoff windows unchanged (except the boundary hour the second
    # batch extends); later windows appeared
    boundary = str(c1.replace(minute=0, second=0, microsecond=0))
    assert all(
        after[k] == v for k, v in first.items()
        if k in after and k[0] != boundary
    )
    assert set(after) > set(first)


def test_common_substring_finds_known_run(spark, tmp_path):
    """A planted 12-token copied run between two otherwise-disjoint docs
    must surface as exactly one pair with max_run_tokens == 12."""
    from lakehouses_spark.queries.dedup import SUBSTR_K, dedup_common_substring

    run = " ".join(f"copied{i}" for i in range(12))
    rows = [
        (1, "alpha beta gamma " + run + " delta epsilon zeta"),
        (2, "one two three four " + run + " five six seven"),
        (3, "totally unrelated words " * 5),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = dedup_common_substring(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.max_run_tokens == 12
    # a 12-token run contains 12 - SUBSTR_K + 1 aligned windows
    assert r.n_window_matches == 12 - SUBSTR_K + 1


def test_common_substring_ignores_sub_k_overlap(spark, tmp_path):
    """Shared runs shorter than SUBSTR_K tokens are not copy evidence and
    must produce no pair."""
    from lakehouses_spark.queries.dedup import SUBSTR_K, dedup_common_substring

    short = " ".join(f"shared{i}" for i in range(SUBSTR_K - 1))
    rows = [
        (1, "a b c " + short + " d e f"),
        (2, "x y z " + short + " u v w"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    assert dedup_common_substring(spark, sf).count() == 0


def test_chunk_overlap_covers_and_overlaps(spark, tmp_path):
    """Chunking invariants: every token position covered, consecutive
    chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE, short docs yield one
    short chunk."""
    from lakehouses_spark.queries.curation import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        text_chunk_overlap,
    )

    long_doc = " ".join(f"w{i}" for i in range(100))
    rows = [(1, long_doc), (2, "tiny doc only five tokens")]
    sf = _write_docs(spark, tmp_path, rows)
    out = text_chunk_overlap(spark, sf).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: a single chunk of its full 5 tokens
    assert len(by_doc[2]) == 1
    assert by_doc[2][0].n_tokens == 5 and by_doc[2][0].start_pos == 1
    # doc 1 (100 tokens): starts advance by the stride; coverage is gapless
    chunks = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [c.start_pos for c in chunks] == [
        1 + i * CHUNK_STRIDE for i in range(len(chunks))
    ]
    covered = set()
    for c in chunks:
        covered |= set(range(c.start_pos, c.start_pos + c.n_tokens))
    assert covered == set(range(1, 101))
    # interior chunks are full-width → overlap with the next chunk
    assert chunks[0].n_tokens == CHUNK_TOKENS
    assert chunks[0].start_pos + CHUNK_TOKENS - 1 >= chunks[1].start_pos


def test_common_substring_stop_df_cut(spark, tmp_path):
    """The optional heavy-hitter window cut must drop boilerplate-only
    pairs while keeping genuinely copied (df=2) runs intact."""
    from lakehouses_spark.queries.dedup import common_substring_pairs

    boiler = " ".join(f"boiler{i}" for i in range(10))  # in EVERY doc
    copied = " ".join(f"copied{i}" for i in range(10))  # only docs 1 and 2
    rows = [
        (1, boiler + " " + copied + " tail one"),
        (2, boiler + " middle words here " + copied),
        (3, boiler + " third doc unique suffix"),
        (4, boiler + " fourth doc other suffix"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    uncut = common_substring_pairs(docs)
    assert uncut.count() == 6  # all pairs share the boilerplate run
    cut = common_substring_pairs(docs, stop_df=3).collect()
    # boilerplate windows (df=4) are gone; only the true copied run remains
    assert [(r.doc_a, r.doc_b) for r in cut] == [(1, 2)]
    assert cut[0].max_run_tokens == 10


@pytest.mark.parametrize("width,stride", [(8, 3), (16, 16), (5, 7)])
def test_chunk_docs_invariants_any_geometry(spark, tmp_path, width, stride):
    """chunk_docs must stay gapless and stride-regular for any (width,
    stride) — including stride == width (no overlap) and stride > width
    (sampling gaps allowed ONLY in that declared regime)."""
    from lakehouses_spark.queries.curation import chunk_docs

    rows = [(1, " ".join(f"w{i}" for i in range(41))), (2, "a b")]
    sf = _write_docs(spark, tmp_path, rows)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = chunk_docs(docs.select("doc_id", "text"), width=width, stride=stride)
    chunks = sorted(
        out.where(F.col("doc_id") == 1).collect(), key=lambda r: r.chunk_idx
    )
    assert [c.start_pos for c in chunks] == [
        1 + i * stride for i in range(len(chunks))
    ]
    # last chunk start must still be inside the doc; next start would not be
    assert chunks[-1].start_pos <= 41 < chunks[-1].start_pos + stride
    if stride <= width:  # coverage is gapless only when windows overlap/abut
        covered = set()
        for c in chunks:
            covered |= set(range(c.start_pos, c.start_pos + c.n_tokens))
        assert covered == set(range(1, 42))
    # every token digest is over exactly the declared slice
    assert all(c.n_tokens <= width for c in chunks)
    tiny = out.where(F.col("doc_id") == 2).collect()
    assert len(tiny) == 1 and tiny[0].n_tokens == 2


def test_common_substring_k_parameter(spark, tmp_path):
    """The window width k is the sensitivity dial: a 10-token planted run
    is found at k=4 and k=10 but not at k=12."""
    from lakehouses_spark.queries.dedup import common_substring_pairs

    run = " ".join(f"copied{i}" for i in range(10))
    rows = [
        (1, "alpha beta gamma delta " + run),
        (2, run + " epsilon zeta eta theta"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    for k, expected_pairs, expected_run in ((4, 1, 10), (10, 1, 10), (12, 0, None)):
        got = common_substring_pairs(docs, k=k).collect()
        assert len(got) == expected_pairs, (k, got)
        if expected_pairs:
            assert got[0].max_run_tokens == expected_run
