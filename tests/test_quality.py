"""Self-consistency checks for the approximate operators (the rows-only
queries): MinHash-LSH recall vs exact Jaccard, ANN-LSH recall vs brute-force
cosine, SimHash sanity, medallion UDF-vs-builtin parity, multimodal
plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouses_spark.registry import load_all_queries

SF = "/root/testdata/sf0.01"
REGISTRY = load_all_queries()


def test_minhash_recall_vs_exact_jaccard(spark):
    """Every high-similarity pair found exactly must be recovered by the
    LSH candidate pipeline (8 bands × 4 rows ⇒ candidate prob at j=0.5 is
    ~1-(1-0.5^4)^8 ≈ 0.40, at j=0.7 ≈ 0.88, at j=0.9 ≈ 0.997 — so assert
    full recall only above 0.8)."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, SF).collect()
    }
    approx = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, SF).collect()
    }
    high = {p for p, j in exact.items() if j >= 0.8}
    assert high, "fixture should contain near-dup pairs above 0.8"
    missed = high - set(approx)
    assert not missed, f"LSH missed high-similarity pairs: {missed}"
    # verified candidates report the same jaccard as the exact pipeline
    for p in high:
        assert abs(approx[p] - exact[p]) < 1e-9
    # no false positives below the verification threshold
    assert all(j >= 0.3 for j in approx.values())


@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    """The testdata embeddings carry NO true near-dups (max pairwise cos
    ≈ 0.5), so ANN recall must be measured on injected ones: 40 vectors get
    a slightly-perturbed twin (cos ≈ 0.999) appended with vec_id + 10000."""
    import numpy as np

    from lakehouses_spark.io import load_table

    rng = np.random.default_rng(42)
    base = load_table(spark, SF, "embeddings").orderBy("vec_id").collect()
    rows = [(r.vec_id, [float(x) for x in r.embedding]) for r in base]
    twins = []
    for r in base[:40]:
        v = np.array(r.embedding, dtype=np.float64)
        noise = rng.normal(0, 0.01, v.shape)
        twins.append((r.vec_id + 10000, [float(x) for x in v + noise]))
    return spark.createDataFrame(rows + twins, "vec_id long, embedding array<double>")


def _recall(approx: set, exact: set) -> float:
    return len(approx & exact) / len(exact)


def test_ann_lsh_recall_on_injected_near_dups(spark, near_dup_corpus):
    from lakehouses_spark.queries.similarity import ann_lsh_pairs, brute_force_pairs

    exact = {(r.vec_a, r.vec_b) for r in
             brute_force_pairs(near_dup_corpus, 0.95).collect()}
    assert len(exact) >= 35, "injection should create ≥35 true near-dup pairs"
    approx = {(r.vec_a, r.vec_b) for r in
              ann_lsh_pairs(near_dup_corpus, 0.95).collect()}
    assert approx <= exact, "ANN must not invent pairs (exact re-rank applied)"
    recall = _recall(approx, exact)
    assert recall >= 0.7, f"LSH recall too low: {recall:.2f} ({len(approx)}/{len(exact)})"


def test_ann_ivf_recall_on_injected_near_dups(spark, near_dup_corpus):
    from lakehouses_spark.queries.similarity import ann_ivf_pairs, brute_force_pairs

    exact = {(r.vec_a, r.vec_b) for r in
             brute_force_pairs(near_dup_corpus, 0.95).collect()}
    approx = {(r.vec_a, r.vec_b) for r in
              ann_ivf_pairs(near_dup_corpus, 0.95).collect()}
    assert approx <= exact
    recall = _recall(approx, exact)
    assert recall >= 0.7, f"IVF recall too low: {recall:.2f} ({len(approx)}/{len(exact)})"


def test_ann_queries_find_exactly_injected_twins(spark):
    """The driver ANN queries inject N_TWINS deterministic near-dups; each
    path must return exactly those pairs — full recall, zero invented pairs
    from the clean corpus."""
    from lakehouses_spark.queries.similarity import N_TWINS, TWIN_ID_OFFSET

    expected = {(i, i + TWIN_ID_OFFSET) for i in range(N_TWINS)}
    for name in ("sim_ann_lsh", "sim_ann_ivf", "sim_ann_ivfpq"):
        got = {(r.vec_a, r.vec_b) for r in REGISTRY[name].fn(spark, SF).collect()}
        assert got == expected, f"{name}: {got ^ expected}"


def test_ann_ivfpq_recall_on_injected_near_dups(spark, near_dup_corpus):
    """IVF-PQ: the PQ approx filter (threshold − PQ_MARGIN on reconstructed
    similarities) plus exact re-rank must keep recall with zero invented
    pairs, like the other ANN paths."""
    from lakehouses_spark.queries.similarity import ann_ivfpq_pairs, brute_force_pairs

    exact = {(r.vec_a, r.vec_b) for r in
             brute_force_pairs(near_dup_corpus, 0.95).collect()}
    approx = {(r.vec_a, r.vec_b) for r in
              ann_ivfpq_pairs(near_dup_corpus, 0.95).collect()}
    assert approx <= exact, "exact re-rank must forbid invented pairs"
    recall = _recall(approx, exact)
    assert recall >= 0.7, f"IVF-PQ recall too low: {recall:.2f}"


def test_simhash_full_recall_vs_exact_jaccard(spark):
    """The upgraded simhash pipeline (8×8-bit block tables → popcount filter
    → exact verify) must recover EVERY exact ngram-Jaccard pair on the
    twin-augmented corpus and invent none — the same contract its DuckDB
    oracle enforces, pinned here with a readable diff."""
    from lakehouses_spark.io import load_table, spread
    from lakehouses_spark.queries.dedup import (
        hashed_shingle_sets,
        ngram_candidate_pairs,
        verify_jaccard,
        with_doc_twins,
    )

    d = spread(with_doc_twins(load_table(spark, SF, "documents")))
    sets = hashed_shingle_sets(d).localCheckpoint()
    no_cut = ngram_candidate_pairs(sets, stop_frac=2.0, min_df=10**9)
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in verify_jaccard(no_cut, sets, 0.3).collect()
    }
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["dedup_simhash"].fn(spark, SF).collect()
    }
    assert set(got) == set(exact), f"simhash diff: {set(got) ^ set(exact)}"
    # twins must be present (the injected recall probes)
    from lakehouses_spark.queries.dedup import DOC_TWIN_ID_OFFSET

    assert any(b >= DOC_TWIN_ID_OFFSET for _, b in got)


def test_medallion_udf_builtin_parity(spark):
    """X1 (Python UDF) and X3 (builtin regexp) title parsers agree."""
    from lakehouses_spark.medallion import parse_title, parse_title_udf

    df = spark.createDataFrame(
        [("Toy Story (1995)",), ("Heat (1995)",), ("Notitle",), ("Weird (abc)",)],
        "title_raw string",
    )
    both = df.select(
        parse_title("title_raw").alias("b"),
        parse_title_udf("title_raw").alias("u"),
    ).collect()
    for r in both:
        assert r.b.title == (r.u[0] if r.u else None)
        assert (str(r.b.year) if r.b.year is not None else None) == r.u[1]


def test_medallion_silver_helpers(spark):
    from lakehouses_spark.medallion import (
        assert_no_rescued_rows,
        epoch_to_timestamp,
        snake_case_columns,
        split_multivalue,
    )

    df = spark.createDataFrame(
        [(1, "Action|Comedy", 828124615), (2, "(no genres listed)", 828124616)],
        "movieId int, genresRaw string, ratingTs long",
    )
    out = snake_case_columns(df).select(
        "movie_id",
        split_multivalue("genres_raw").alias("genres"),
        epoch_to_timestamp("rating_ts").alias("ts"),
    )
    rows = {r.movie_id: r for r in out.collect()}
    assert rows[1].genres == ["Action", "Comedy"]
    assert rows[2].genres == []
    assert rows[1].ts.year == 1996
    # rescued-rows gate
    clean = spark.createDataFrame([(1, None)], "id int, _rescued_data string")
    assert "_rescued_data" not in assert_no_rescued_rows(clean).columns
    dirty = spark.createDataFrame([(1, "bad")], "id int, _rescued_data string")
    with pytest.raises(ValueError, match="rescued"):
        assert_no_rescued_rows(dirty)


def test_als_pipeline(spark):
    """X5: seeded ALS trains, evaluates, and recommends top-k per user."""
    from lakehouses_spark.medallion import evaluate_rmse, recommend_for_all_users, train_als

    ratings = (
        spark.range(0, 300)
        .select(
            (F.col("id") % 20).cast("int").alias("user_id"),
            (F.col("id") % 15).cast("int").alias("item_id"),
            ((F.col("id") % 5) + 1.0).alias("rating"),
        )
    )
    train, test = ratings.randomSplit([0.8, 0.2], seed=42)
    model = train_als(train)
    rmse = evaluate_rmse(model, test)
    # pinned band, the reference's practice of anchoring the model metric
    # (RMSE ≈ 0.878 ± noise on MovieLens, 03.movielens-gold.py:122-129):
    # seeded split + seeded ALS on this fixture reproduces 0.0507
    assert abs(rmse - 0.0507) < 0.02, f"ALS RMSE drifted: {rmse}"
    recs = recommend_for_all_users(model, k=3)
    assert recs.columns == ["user_id", "rank", "item_id", "rating"]
    per_user = recs.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    assert per_user == 3


def test_als_cross_validation(spark):
    """X5: CrossValidator + ParamGridBuilder model selection (the
    reference's 3-fold CV, scaled down to a 2x1 grid for test time)."""
    from lakehouses_spark.medallion import tune_als

    ratings = spark.range(0, 400).selectExpr(
        "CAST(id % 25 AS INT) AS user_id",
        "CAST(id % 12 AS INT) AS item_id",
        "CAST((id % 5) + 1.0 AS DOUBLE) AS rating",
    )
    best, metrics = tune_als(ratings)
    assert len(metrics) == 2  # one RMSE per grid candidate
    assert all(0.0 < m < 5.0 for m in metrics)
    assert best.rank in (5, 10)


def test_multimodal_metadata_extraction(spark):
    """Header probe decodes PNG/JPEG/GIF/WAV dims without media libs; stub
    decoder raises NotImplementedError; frame sampler emits bounded rows."""
    from lakehouses_spark.multimodal import (
        _decode_stub,
        extract_media_metadata,
        header_probe,
        sample_frames,
    )
    from lakehouses_spark.queries.advanced import _fake_png

    png = _fake_png(64, 48)
    assert header_probe(png) == {"format": "png", "width": 64, "height": 48, "n_channels": 4}
    wav = b"RIFF" + b"\x00" * 4 + b"WAVE" + b"\x00" * 10 + (2).to_bytes(2, "little") + (44100).to_bytes(4, "little") + (176400).to_bytes(4, "little") + b"\x00" * 100
    meta = header_probe(wav)
    assert meta["format"] == "wav" and meta["sample_rate"] == 44100

    media = spark.createDataFrame(
        [("a.png", bytearray(png)), ("b.bin", bytearray(b"unknownformat"))],
        "path string, content binary",
    )
    got = {r.path: r for r in extract_media_metadata(media).collect()}
    assert got["a.png"].width == 64 and got["a.png"].format == "png"
    assert got["b.bin"].format is None

    frames = sample_frames(media, every_n_bytes=16, max_frames=4).collect()
    assert all(f.frame_idx < 4 for f in frames)
    assert {f.path for f in frames} == {"a.png", "b.bin"}

    with pytest.raises(Exception, match="NotImplementedError|media library"):
        sample_frames(media, decoder=_decode_stub).collect()


def test_driver_advanced_queries_run(spark):
    for name in ("lake_dml_roundtrip", "gold_als_recommendations", "multimodal_metadata"):
        df = REGISTRY[name].fn(spark, SF)
        assert df.count() > 0, name


def test_stop_shingle_cut_preserves_recall(spark):
    """Skew mitigation: a ubiquitous shingle (df = corpus size) must be cut
    from the inverted index — collapsing the candidate explosion — while
    every true near-dup pair is still found with its exact jaccard."""
    from lakehouses_spark.queries.dedup import (
        hashed_shingle_sets,
        ngram_candidate_pairs,
        verify_jaccard,
    )

    n, words = 60, 12
    rows = []
    for i in range(n):
        body = " ".join(f"w{i}_{k}" for k in range(words))
        # every doc ends with the same hot phrase -> universal shingles
        rows.append((i, body + " the quick brown fox jumps"))
    # near-dup twins of docs 0-4: same body, one word changed
    for i in range(5):
        body = " ".join(f"w{i}_{k}" if k else "CHANGED" for k in range(words))
        rows.append((1000 + i, body + " the quick brown fox jumps"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sets = hashed_shingle_sets(docs).localCheckpoint()

    # without the cut every doc pair shares the hot shingles -> O(n^2) pairs
    no_cut = ngram_candidate_pairs(sets, stop_frac=2.0, min_df=10**9)
    assert no_cut.count() == (65 * 64) // 2
    # with the cut (df > max(16, 0.05*65)=16; hot shingles have df=65) the
    # candidate set collapses to pairs sharing rare shingles only
    cut = ngram_candidate_pairs(sets)
    assert cut.count() < 100

    expected = verify_jaccard(no_cut, sets, threshold=0.3)
    got = verify_jaccard(cut, sets, threshold=0.3)
    exp = {(r.doc_a, r.doc_b): r.jaccard for r in expected.collect()}
    assert {(i, 1000 + i) for i in range(5)} <= set(exp)
    assert {(r.doc_a, r.doc_b): r.jaccard for r in got.collect()} == exp, \
        "stop-shingle cut must not lose any true near-dup pair"


def test_containment_short_doc_hot_shingles_recall(spark):
    """ADVICE r4 #4 pin: a SHORT boilerplate doc embedded verbatim in a
    long doc, where every one of the short doc's shingles is hot (df above
    the stop cut because 20+ other docs carry the same boilerplate), must
    still surface as a containment pair. Plain ngram_candidate_pairs drops
    all of the short doc's postings (they're all hot) and misses the pair;
    keep_short_docs retains them and recovers it — the exact case the
    containment tier exists for."""
    from lakehouses_spark.queries.dedup import (
        SHORT_DOC_SHINGLES,
        hashed_shingle_sets,
        ngram_candidate_pairs,
    )

    boiler = " ".join(f"lic{k}" for k in range(8))  # 6 shingles, all hot
    rows = []
    # 20 LONG docs (>SHORT_DOC_SHINGLES shingles) carrying the boilerplate,
    # so its shingles get df>16 while the docs themselves aren't "short"
    for i in range(20):
        body = " ".join(f"w{i}_{k}" for k in range(80))
        rows.append((i, boiler + " " + body))
    # the short excerpt doc: boilerplate ONLY (every shingle hot)
    rows.append((500, boiler))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sets = hashed_shingle_sets(docs).localCheckpoint()

    missing = ngram_candidate_pairs(sets, min_df=16)
    assert not [
        r for r in missing.collect() if r.doc_a == 500 or r.doc_b == 500
    ], "precondition: the plain cut drops every posting of the short doc"

    kept = ngram_candidate_pairs(sets, min_df=16, keep_short_docs=SHORT_DOC_SHINGLES)
    pairs = {(r.doc_a, r.doc_b) for r in kept.collect()}
    assert pairs == {(i, 500) for i in range(20)}, (
        "short-doc probe must recover exactly the short-in-long containment "
        f"pairs without re-exploding the hot shingles, got {sorted(pairs)[:30]}"
    )


def test_simhash_signatures_pinned(spark):
    """The numpy-vectorized _simhash64 must stay bit-identical to the
    original scalar formulation — pinned against values computed with the
    per-token/per-bit Python walk."""
    from lakehouses_spark.queries.dedup import _simhash64

    expected = {
        "the quick brown fox": 202806156967688757,
        "hello world": 13723176454590477,
        "": 0,
        "a": 4681665781835383343,
        "repeated repeated repeated token": -3239682553675964579,
    }
    df = spark.createDataFrame([(t,) for t in expected], "text string")
    got = {r.text: r.sig for r in df.select("text", _simhash64(F.col("text")).alias("sig")).collect()}
    assert got == expected


def test_all_pairs_guard_refuses_large_corpus(spark):
    """VERDICT r2 weak item: the exact all-pairs baselines must refuse a
    corpus beyond ALL_PAIRS_MAX_VECTORS and point at the scale paths."""
    from lakehouses_spark.queries.similarity import (
        ALL_PAIRS_MAX_VECTORS,
        brute_force_pairs,
    )

    big = spark.range(ALL_PAIRS_MAX_VECTORS + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="refusing"):
        brute_force_pairs(big, 0.9)
    # and the blocked path handles the same corpus without the guard
    from lakehouses_spark.queries.similarity import sim_pairs_blocked

    small = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.rand(seed=7)).alias("embedding"),
    )
    exact = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in brute_force_pairs(small, 0.95).collect()
    }
    got = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in sim_pairs_blocked(small, 0.95, block_size=16).collect()
    }
    assert set(got) == set(exact)
    for p, s in got.items():
        assert abs(s - exact[p]) < 1e-9


def test_stop_shingle_cut_lossless_on_oracle_corpus(spark):
    """Corpus-property pin (ADVICE r2): the dedup_ngram_jaccard ORACLE has no
    stop-shingle cut, so the engine-with-cut only hash-matches it while no
    qualifying pair on the sweep corpus relies solely on stop shingles.
    Assert that property explicitly on the actual sf0.01 documents table so
    corpus drift is caught here, not as an opaque oracle mismatch."""
    from lakehouses_spark.io import load_table, spread
    from lakehouses_spark.queries.dedup import (
        hashed_shingle_sets,
        ngram_candidate_pairs,
        verify_jaccard,
    )

    d = spread(load_table(spark, SF, "documents"))
    sets = hashed_shingle_sets(d).localCheckpoint()
    no_cut = ngram_candidate_pairs(sets, stop_frac=2.0, min_df=10**9)
    cut = ngram_candidate_pairs(sets)
    exact = {(r.doc_a, r.doc_b) for r in verify_jaccard(no_cut, sets, 0.3).collect()}
    got = {(r.doc_a, r.doc_b) for r in verify_jaccard(cut, sets, 0.3).collect()}
    assert got == exact, (
        f"stop-shingle cut dropped qualifying pairs on the oracle corpus: "
        f"{sorted(exact - got)[:10]}"
    )


def test_multimodal_image_pipeline_deterministic(spark):
    """S11→X2→X3 pipeline: 10 labels × {png, gif, wav} with pinned stats."""
    df = REGISTRY["multimodal_image_pipeline"].fn(spark, SF)
    rows = {(r.label, r.format): r for r in df.collect()}
    assert len(rows) == 30
    assert rows[("cat", "png")].n_files == 2
    assert rows[("cat", "png")].avg_width == 32.5   # (32 + 33) / 2
    assert rows[("cat", "gif")].avg_height == 16.5  # (16 + 17) / 2
    assert rows[("cat", "wav")].total_duration_s == 0.5
    assert rows[("emu", "wav")].total_duration_s == 1.4  # 0.5 + 0.1*9


def test_simhash_block_width_dial():
    """The corpus-size-aware block width keeps expected bucket occupancy
    bounded: 8-bit blocks for oracle-scale corpora (unchanged driver
    behavior), wider power-of-two blocks once 2^width * occupancy < n."""
    from lakehouses_spark.queries.dedup import simhash_block_width

    assert simhash_block_width(525) == 8        # sf0.01 oracle corpus
    assert simhash_block_width(5_025) == 16     # sf0.1
    assert simhash_block_width(160_000) == 16   # probe x32
    assert simhash_block_width(5_000_000) == 32
    assert simhash_block_width(10**9) == 32     # capped: >=2 tables always


def test_sketch_error_bands_vs_exact(spark):
    """The two sketch aggregates the engine leans on at scale stay inside
    their published error bands on real data: HyperLogLog++ distinct counts
    within 4×rsd of exact (rsd is a STANDARD DEVIATION, not a bound — the
    default 0.05 sketch misses 5% on this very table, which is in-spec;
    4σ at rsd=0.02 is a sound assertion), approx_percentile within the
    rank-error bound of the exact interpolated percentile."""
    from lakehouses_spark.io import load_table

    li = load_table(spark, SF, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_d"),
            F.count_distinct("l_orderkey").alias("exact_d"),
            F.expr("approx_percentile(l_extendedprice, 0.9, 1000)").alias("approx_p90"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("exact_p90"),
            F.expr("percentile(l_extendedprice, 0.88)").alias("exact_p88"),
            F.expr("percentile(l_extendedprice, 0.92)").alias("exact_p92"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx_d - r.exact_d) <= 4 * 0.02 * r.exact_d, r
        # accuracy=1000 → rank error ≤ n/1000 rows ≈ 0.1 percentile points;
        # the [p88, p92] band is deliberately ~20× looser than that bound
        assert r.exact_p88 <= r.approx_p90 <= r.exact_p92, r


def test_pagerank_invariants(spark):
    """Semantic invariants the differential oracle can't express: on a
    symmetric graph (no dangling mass) total rank is conserved at 1.0,
    every rank is at least the teleport floor (1-d)/n, and a star
    topology's hub outranks its spokes."""
    from lakehouses_spark.queries.graph import pagerank

    spokes = list(range(1, 7))
    edges = [(0, s) for s in spokes] + [(s, 0) for s in spokes]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r.node_id: r.rank for r in pagerank(df).collect()}
    n = len(ranks)
    assert n == 7
    assert abs(sum(ranks.values()) - 1.0) < 1e-9, sum(ranks.values())
    floor = 0.15 / n
    assert all(v >= floor - 1e-12 for v in ranks.values())
    hub, spoke_max = ranks[0], max(ranks[s] for s in spokes)
    assert hub > spoke_max * 2, (hub, spoke_max)


def test_incremental_minhash_verdicts(spark):
    """dedup_incremental_minhash semantic pin: every twin in the incoming
    batch must come back dup_of_existing with its origin (or the origin's
    corpus near-dup) as the match at jaccard ≥ 0.9; every word-suffixed
    fresh doc must come back accepted with null dup_of."""
    from lakehouses_spark.queries.dedup import (
        DOC_TWIN_ID_OFFSET,
        INCR_FRESH_ID_OFFSET,
        N_DOC_TWINS,
    )

    rows = {r.doc_id: r for r in REGISTRY["dedup_incremental_minhash"].fn(spark, SF).collect()}
    assert len(rows) == 2 * N_DOC_TWINS
    for i in range(N_DOC_TWINS):
        r = rows[DOC_TWIN_ID_OFFSET + i]
        assert r.status == "dup_of_existing" and r.jaccard >= 0.9, r
    for i in range(N_DOC_TWINS, 2 * N_DOC_TWINS):
        r = rows[INCR_FRESH_ID_OFFSET + i]
        assert r.status == "accepted" and r.dup_of is None, r


def test_incremental_minhash_no_uncertain_band_pairs():
    """Regen pin (ADVICE r5 #4): the Spark/oracle hash match relies on the
    8×4 banding recovering every ORACLE-best pair. Recovery is near-certain
    only at j ≥ 0.9 (P ≈ 0.99998 per pair) — a best match in
    [threshold, 0.9) would make the driver row flaky. Assert the shipped
    corpus produces no such pair: every non-null best-match jaccard in the
    exact all-pairs oracle sits in the certain-recall region. If a testdata
    regen flips this, raise bands or shrink rows-per-band before re-rowing."""
    from lakehouses_spark.queries.dedup import INCR_MINHASH_THRESHOLD
    from lakehouses_spark.registry import load_all_queries
    from tests.oracle import duckdb_connection

    oracle = load_all_queries()["dedup_incremental_minhash"].oracle
    con = duckdb_connection(SF)
    jaccards = [j for (j,) in con.execute(
        f"SELECT jaccard FROM ({oracle}) WHERE jaccard IS NOT NULL"
    ).fetchall()]
    assert jaccards, "twin injection should produce matches"
    assert min(jaccards) >= 0.9, (
        f"best-match jaccard {min(jaccards)} inside the banding's uncertain "
        f"band [{INCR_MINHASH_THRESHOLD}, 0.9) — driver row would be flaky"
    )


def test_scd2_invariants(spark):
    """lake_scd2_build structural invariants, independent of the oracle:
    exactly one open (is_current) version per user; ranges are gapless —
    each closed version's valid_to equals the next version's valid_from;
    closed versions never have NULL valid_to."""
    rows = REGISTRY["lake_scd2_build"].fn(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, versions in by_user.items():
        versions.sort(key=lambda r: (r.valid_from_ms, r.valid_to_ms or 1 << 62))
        open_rows = [r for r in versions if r.is_current]
        assert len(open_rows) == 1, f"user {user}: {len(open_rows)} open rows"
        assert versions[-1].is_current, f"user {user}: open row not last"
        for prev, nxt in zip(versions, versions[1:]):
            assert prev.valid_to_ms is not None, f"user {user}: closed row w/o end"
            assert prev.valid_to_ms == nxt.valid_from_ms, (
                f"user {user}: gap {prev.valid_to_ms} -> {nxt.valid_from_ms}"
            )


def test_cdc_apply_delete_semantics(spark):
    """lake_cdc_apply: users whose LAST change is a delete ('error') must be
    absent from the final state; everyone else present exactly once."""
    import duckdb

    got = {r.user_id for r in REGISTRY["lake_cdc_apply"].fn(spark, SF).collect()}
    last = duckdb.sql(f"""
        SELECT user_id, event_type FROM (
          SELECT user_id, event_type, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM '{SF}/events.parquet') WHERE rn = 1
    """).fetchall()
    deleted = {u for u, op in last if op == "error"}
    live = {u for u, op in last if op != "error"}
    assert deleted, "fixture should contain users ending on a delete"
    assert got == live
    assert not (got & deleted)
