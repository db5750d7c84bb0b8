"""Property-based scalar-function parity vs DuckDB (SURVEY §5 item 5).

Hypothesis generates value batches; each batch becomes both a Spark DataFrame
and a DuckDB table, the same expression battery runs on both, results must
agree canonically. Examples are kept few (each costs Spark jobs) but each
example carries many values.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.oracle import _canon_rows

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)
safe_strings = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="'\"\\\x00"),
    min_size=0, max_size=20,
)


def _compare(spark, rows, schema_ddl, spark_exprs, duck_sql_body):
    sdf = spark.createDataFrame(rows, schema_ddl).selectExpr(*spark_exprs)
    con = duckdb.connect()
    cols = [c.split()[0] for c in schema_ddl.split(",")]
    ddl_duck = ", ".join(
        f"{name} {'DOUBLE' if 'double' in typ else 'BIGINT' if ('long' in typ or 'int' in typ) else 'VARCHAR'}"
        for name, typ in (c.strip().split(" ", 1) for c in schema_ddl.split(","))
    )
    con.execute(f"CREATE TABLE t ({ddl_duck})")
    con.executemany(
        f"INSERT INTO t VALUES ({', '.join('?' for _ in cols)})", [list(r) for r in rows]
    )
    res = con.execute(f"SELECT {duck_sql_body} FROM t")
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    s_rows = [tuple(r) for r in sdf.collect()]
    assert _canon_rows(sdf.columns, s_rows) == _canon_rows(d_cols, d_rows)


@given(vals=st.lists(finite_doubles, min_size=1, max_size=50))
@SET
def test_math_function_parity(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    _compare(
        spark, rows, "id long, x double",
        [
            "id",
            "round(abs(x), 4) AS f_abs",
            "round(floor(x) + ceil(x), 1) AS f_fc",
            "round(sqrt(abs(x)), 6) AS f_sqrt",
            "CAST(sign(x) AS DOUBLE) AS f_sign",
            "round(ln(abs(x) + 1.0), 6) AS f_ln",
            "greatest(x, 0.0) AS f_max0",
        ],
        "id, round(abs(x), 4) AS f_abs, round(floor(x) + ceil(x), 1) AS f_fc, "
        "round(sqrt(abs(x)), 6) AS f_sqrt, CAST(sign(x) AS DOUBLE) AS f_sign, "
        "round(ln(abs(x) + 1.0), 6) AS f_ln, greatest(x, 0.0) AS f_max0",
    )


@given(vals=st.lists(safe_strings, min_size=1, max_size=50))
@SET
def test_string_function_parity(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    _compare(
        spark, rows, "id long, s string",
        [
            "id",
            "upper(s) AS f_upper",
            "lower(s) AS f_lower",
            "length(s) AS f_len",
            "substring(s, 2, 3) AS f_sub",
            "reverse(s) AS f_rev",
            "concat(s, '_x') AS f_cat",
            "trim(s) AS f_trim",
        ],
        "id, upper(s) AS f_upper, lower(s) AS f_lower, CAST(length(s) AS BIGINT) AS f_len, "
        "substring(s, 2, 3) AS f_sub, reverse(s) AS f_rev, concat(s, '_x') AS f_cat, "
        "trim(s) AS f_trim",
    )


@given(vals=st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=50))
@SET
def test_integer_function_parity(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    _compare(
        spark, rows, "id long, n long",
        [
            "id",
            "pmod(n, 7) AS f_pmod",
            "CAST(n / 3 AS DOUBLE) IS NOT NULL AS f_div_ok",
            "abs(n) AS f_abs",
            "CAST(n AS STRING) AS f_str",
            "greatest(n, 0) AS f_ge0",
            "least(n, 100) AS f_le100",
        ],
        "id, ((n % 7) + 7) % 7 AS f_pmod, CAST(n / 3 AS DOUBLE) IS NOT NULL AS f_div_ok, "
        "abs(n) AS f_abs, CAST(n AS VARCHAR) AS f_str, greatest(n, 0) AS f_ge0, "
        "least(n, 100) AS f_le100",
    )


@given(
    vals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=4), finite_doubles),
        min_size=1, max_size=60,
    )
)
@SET
def test_aggregate_parity(spark, vals):
    """Grouped aggregates agree regardless of partitioning/summation order
    (rounding absorbs the float-order noise, as in the oracle contract)."""
    rows = [(k, v) for k, v in vals]
    import duckdb as dk

    con = dk.connect()
    con.execute("CREATE TABLE t (k INTEGER, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [list(r) for r in rows])
    want = con.execute(
        "SELECT k, count(*) AS n, round(sum(v), 3) AS s, round(min(v), 6) AS lo, "
        "round(max(v), 6) AS hi FROM t GROUP BY k"
    ).fetchall()
    from pyspark.sql import functions as F

    got = (
        spark.createDataFrame(rows, "k int, v double")
        .repartition(8)  # force multi-partition partial aggregation
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("v"), 3).alias("s"),
            F.round(F.min("v"), 6).alias("lo"),
            F.round(F.max("v"), 6).alias("hi"),
        )
        .collect()
    )
    assert _canon_rows(["k", "n", "s", "lo", "hi"], [tuple(r) for r in got]) == _canon_rows(
        ["k", "n", "s", "lo", "hi"], want
    )


# --- regen-fragile parity pins (VERDICT r4 #8) ------------------------------
# agg_skew_kurtosis and ts_ewma are formula-exact vs their oracles after the
# r3 fixes (explicit population de-bias; NULL filter + truncated-lag form).
# These properties pin that equality against testdata REGENERATION: arbitrary
# synthetic distributions (NULL-bearing values included) must agree between
# the Spark formulation and the oracle's DuckDB formulation to ~1e-9 relative
# on the UNROUNDED statistic — far inside the oracles' rounding, so no
# regenerated distribution can open a formula gap that rounding then exposes.

maybe_null_doubles = st.one_of(
    st.none(),
    st.floats(allow_nan=False, allow_infinity=False, min_value=-1e4, max_value=1e4),
)


def _close(a, b, tol=1e-9):
    if a is None or b is None:
        return a is None and b is None
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


@given(
    groups=st.lists(
        st.lists(maybe_null_doubles, min_size=4, max_size=40).filter(
            # ≥3 non-null with some spread: below that the sample moments
            # are undefined/degenerate in engine-specific ways the real
            # query never hits (lineitem groups are thousands of rows)
            lambda vs: len({v for v in vs if v is not None}) >= 3
        ),
        min_size=1,
        max_size=4,
    )
)
@SET
def test_skew_kurtosis_debias_parity(spark, groups):
    from pyspark.sql import functions as F

    rows = [
        (g, i, v) for g, vals in enumerate(groups) for i, v in enumerate(vals)
    ]
    sdf = (
        spark.createDataFrame(rows, "grp long, i long, value double")
        .groupBy("grp")
        .agg(F.skewness("value").alias("skew"), F.kurtosis("value").alias("kurt"))
        .orderBy("grp")
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp BIGINT, i BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", [list(r) for r in rows])
    d_rows = con.execute(
        """
        SELECT grp,
               skewness(value) * (count(value) - 2)
                 / sqrt(count(value) * (count(value) - 1.0)) AS skew,
               kurtosis_pop(value) AS kurt
        FROM t GROUP BY grp ORDER BY grp
        """
    ).fetchall()
    s_rows = [tuple(r) for r in sdf.collect()]
    assert len(s_rows) == len(d_rows)
    for s, d in zip(s_rows, d_rows):
        assert s[0] == d[0]
        assert _close(s[1], d[1]), f"skew grp {s[0]}: {s[1]} vs {d[1]}"
        assert _close(s[2], d[2]), f"kurt grp {s[0]}: {s[2]} vs {d[2]}"


@given(
    series=st.lists(
        st.tuples(st.integers(0, 2), maybe_null_doubles),  # (user, value|NULL)
        min_size=1,
        max_size=60,
    ).filter(lambda s: any(v is not None for _, v in s))
)
@SET
def test_ewma_truncated_lag_parity(spark, series):
    from lakehouses_spark.queries.timeseries import _EWMA_DEN, _EWMA_NUM, ewma_over
    from pyspark.sql import functions as F

    rows = [(u, i, i, v) for i, (u, v) in enumerate(series)]
    e = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, value double"
    ).where(F.col("value").isNotNull())
    s_rows = {
        (r.user_id, r.event_id): r.ewma
        for r in ewma_over(e, rounded=False).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (user_id BIGINT, event_id BIGINT, ts BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", [list(r) for r in rows])
    d_rows = {
        (u, ev): w
        for u, ev, w in con.execute(
            f"""
            SELECT user_id, event_id, ({_EWMA_NUM}) / ({_EWMA_DEN}) AS ewma
            FROM t WHERE value IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, event_id
            """
        ).fetchall()
    }
    assert set(s_rows) == set(d_rows)
    for k in s_rows:
        assert _close(s_rows[k], d_rows[k]), f"{k}: {s_rows[k]} vs {d_rows[k]}"


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),                      # user
            st.integers(0, 5),                      # ts (tiny range → ties)
            st.sampled_from(["click", "purchase"]),
            maybe_null_doubles,  # NULL click values: ADVICE r5 #3
        ),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_asof_tie_break_parity(spark, events):
    """ADVICE r4 #3 pin under ACTUAL ties (the shipped testdata has none):
    clicks sharing (user_id, ts) must resolve to the same winner in the
    Spark union+window merge (c_event_id tie-break) and the oracle's
    collapse-then-ASOF formulation (row_number per (user_id, ts)).

    ADVICE r5 #3: values are NULL-bearing — a winning click whose value is
    NULL must yield a NULL prior_click_value (struct-valued last), not an
    older click's value; the oracle collapse uses row_number, not arg_max
    (which skips NULL values and would mix rows)."""
    from pyspark.sql import functions as F

    from lakehouses_spark.queries.timeseries import asof_merge

    rows = [
        (i, u, t, typ, v) for i, (u, t, typ, v) in enumerate(events)
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    s_rows = {
        r.event_id: (r.prior_click_id, r.prior_click_value)
        for r in asof_merge(e).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT, ts BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?, ?)",
        [[i, u, t, typ, v] for i, u, t, typ, v in rows],
    )
    d_rows = {
        eid: (pid, pv)
        for eid, pid, pv in con.execute(
            """
            SELECT p.event_id, c.event_id, round(c.value, 2)
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (
              SELECT user_id, ts, event_id, value
              FROM events WHERE event_type = 'click'
              QUALIFY row_number() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
            ) c ON p.user_id = c.user_id AND p.ts >= c.ts
            """
        ).fetchall()
    }
    assert s_rows == d_rows


# --------------------------------------------------------------------------- #
# PPJoin candidate-filter recall (r6): the prefix/length/positional filters
# (symmetric Jaccard variant) and the asymmetric containment variant are
# claimed recall-EXACT — hypothesis hunts for a corpus shape (ties, equal
# sizes, tiny docs, heavy overlap) where a qualifying pair is filtered out
# of the candidate stage. The tiny-corpus stop cut is inactive by
# construction (df ≤ n_docs < 16), isolating the filter math.
# --------------------------------------------------------------------------- #
_PP_VOCAB = ["a", "b", "c", "d", "e", "f"]
_pp_docs = st.lists(
    st.lists(st.sampled_from(_PP_VOCAB), min_size=3, max_size=24),
    min_size=3,
    max_size=9,
)


def _pp_shingles(toks):
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


@SET
@given(docs=_pp_docs)
def test_ppjoin_jaccard_filters_recall_exact(spark, docs):
    from lakehouses_spark.queries.dedup import (
        hashed_shingle_sets,
        ngram_candidate_pairs,
        verify_jaccard,
    )

    sh = {i: _pp_shingles(t) for i, t in enumerate(docs)}
    expected = {}
    for a in sh:
        for b in sh:
            if a < b:
                j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if j >= 0.3:
                    expected[(a, b)] = round(j, 4)
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    sets = hashed_shingle_sets(df).localCheckpoint()
    cand = ngram_candidate_pairs(sets, jaccard_prefix=0.3)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in verify_jaccard(cand, sets, threshold=0.3).collect()
    }
    assert got == expected


@SET
@given(docs=_pp_docs)
def test_ppjoin_containment_prefix_recall_exact(spark, docs):
    from lakehouses_spark.queries.dedup import (
        hashed_shingle_sets,
        ngram_candidate_pairs,
    )

    sh = {i: _pp_shingles(t) for i, t in enumerate(docs)}
    qualifying = {
        (a, b)
        for a in sh
        for b in sh
        if a < b and len(sh[a] & sh[b]) / min(len(sh[a]), len(sh[b])) >= 0.5
    }
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    sets = hashed_shingle_sets(df).localCheckpoint()
    # keep_short_docs=None isolates the asymmetric main join — every
    # qualifying pair must already be IN its candidates (exact verification
    # downstream only removes, never adds)
    cand = {
        (r.doc_a, r.doc_b)
        for r in ngram_candidate_pairs(sets, containment_prefix=0.5).collect()
    }
    assert qualifying <= cand


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),                      # user
            st.integers(0, 5),                      # ts (tiny range → ties)
            st.sampled_from(["click", "purchase"]),
            maybe_null_doubles,
        ),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_asof_nearest_tie_break_parity(spark, events):
    """ts_asof_nearest's tie rules under actual ties: (1) |Δt| minimized,
    (2) equidistant prior beats next, (3) within a side, highest event_id
    wins, (4) the winner's OWN value is returned (NULL included). Checked
    against a brute-force Python oracle on tied-timestamp frames."""
    from pyspark.sql import functions as F

    from lakehouses_spark.queries.timeseries import (
        ASOF_TOLERANCE_S,
        asof_nearest_merge,
    )

    rows = [(i, u, t, typ, v) for i, (u, t, typ, v) in enumerate(events)]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.event_id: (r.nearest_click_id, r.nearest_click_value)
        for r in asof_nearest_merge(e).collect()
    }
    expected = {}
    clicks = [(i, u, t, v) for i, u, t, typ, v in rows if typ == "click"]
    for i, u, t, typ, v in rows:
        if typ != "purchase":
            continue
        cand = [
            (abs(t - ct), 0 if ct <= t else 1, -ci, ci, cv)
            for ci, cu, ct, cv in clicks
            if cu == u and abs(t - ct) <= ASOF_TOLERANCE_S
        ]
        if cand:
            _, _, _, ci, cv = min(cand)
            expected[i] = (ci, round(cv, 2) if cv is not None else None)
        else:
            expected[i] = (None, None)
    assert set(got) == set(expected)
    for k in got:
        gid, gv = got[k]
        eid, ev = expected[k]
        assert gid == eid, f"{k}: id {gid} vs {eid}"
        assert _close(gv, ev), f"{k}: value {gv} vs {ev}"


@given(
    dim_keys=st.sets(st.integers(-10**12, 10**12), min_size=0, max_size=40),
    fact_keys=st.lists(st.integers(-10**12, 10**12), min_size=1, max_size=60),
)
@SET
def test_bloom_prefilter_has_no_false_negatives(spark, dim_keys, fact_keys):
    """scale.bloom_bitmap/bloom_prefilter: every fact row whose key IS in
    the dim key set must survive the probe (Bloom's one-sided guarantee —
    false positives allowed, false negatives never). Hypothesis drives the
    hand-rolled bit arithmetic (word indexing, shifts, sign of xxhash64)
    across negative keys, empty dims, and duplicates. A small m_bits forces
    dense bitmaps so word-boundary bugs can't hide in sparsity."""
    from pyspark.sql import functions as F

    from lakehouses_spark.scale import bloom_bitmap, bloom_prefilter

    dim = spark.createDataFrame([(k,) for k in dim_keys] or [(None,)], "k long")
    if not dim_keys:
        dim = dim.where(F.col("k").isNotNull())  # empty frame, same schema
    fact = spark.createDataFrame(
        [(i, k) for i, k in enumerate(fact_keys)], "row_id long, k long"
    )
    bitmap = bloom_bitmap(dim, "k", m_bits=256, k=3)
    kept = {
        r.row_id for r in bloom_prefilter(fact, "k", bitmap, m_bits=256, k=3).collect()
    }
    must_keep = {i for i, k in enumerate(fact_keys) if k in dim_keys}
    assert must_keep <= kept


# --------------------------------------------------------------------------- #
# DV codec round-trip (r8: dv.py now ENCODES too — export side)
# --------------------------------------------------------------------------- #
@given(
    idxs=st.one_of(
        st.lists(st.integers(min_value=0, max_value=2**40), max_size=300),
        # dense runs inside one 16-bit container (bitmap-container path)
        st.builds(
            lambda start, n: list(range(start, start + n)),
            st.integers(min_value=0, max_value=100_000),
            st.integers(min_value=4000, max_value=6000),
        ),
    )
)
@settings(deadline=None, max_examples=60)
def test_dv_payload_roundtrip(idxs):
    """encode_dv_payload ∘ decode_dv_payload is identity over sorted unique
    row indexes — across array containers, bitmap containers (>4096 dense),
    multi-bucket (>2^32 analog via 2^40 values), and the empty set."""
    from lakehouses_spark.tables import dv

    want = sorted(set(idxs))
    assert dv.decode_dv_payload(dv.encode_dv_payload(want)) == want


# --------------- dual-format export: differential property ---------------- #
_ARC_OPS = st.lists(
    st.tuples(
        st.sampled_from(["append", "delete", "lazy_delete", "update"]),
        st.integers(min_value=0, max_value=9),   # predicate bucket
    ),
    min_size=1,
    max_size=4,
)


@given(ops=_ARC_OPS)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_uniform_export_differential(spark, tmp_path_factory, ops):
    """DIFFERENTIAL property over random DML arcs: whatever sequence of
    append/COW-delete/MOR-delete/update commits a table takes,
    `export_uniform` yields a Delta layer and an Iceberg layer that read
    IDENTICALLY at the final state — deletion vectors on one side must
    always agree with position-delete files on the other, over the same
    shared data files."""
    from lakehouses_spark.tables import LakeTable
    from lakehouses_spark.tables.delta_log import read_delta
    from lakehouses_spark.tables.iceberg_meta import read_iceberg

    tmp = tmp_path_factory.mktemp("uni_prop")
    df = spark.createDataFrame(
        [(i, i % 10, float(i)) for i in range(40)], "k long, b int, v double"
    )
    t = LakeTable.create(spark, tmp / "lake", df)
    nxt = 100
    for op, bucket in ops:
        if op == "append":
            t.append(spark.createDataFrame(
                [(nxt + j, bucket, 1.0) for j in range(5)],
                "k long, b int, v double"))
            nxt += 5
        elif op == "delete":
            t.delete(f"b = {bucket}")
        elif op == "lazy_delete":
            t.delete(f"b = {bucket}", lazy=True)
        else:
            t.update({"v": "v + 1"}, where=f"b = {bucket}")
    dest = t.export_uniform(tmp / "uni")

    def rows(df_):
        return sorted(tuple(r) for r in df_.select("k", "b", "v").collect())

    want = rows(t.read())
    assert rows(read_delta(spark, dest)) == want
    assert rows(read_iceberg(spark, dest)) == want


@given(ops=_ARC_OPS)
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_external_maintenance_differential(spark, tmp_path_factory, ops):
    """DIFFERENTIAL property over random DML arcs for the r9 maintenance
    ops: after ANY arc, `DeltaLogReader.optimize` (DV purge included) and
    `IcebergMetadataReader.rewrite_data_files` (position deletes applied)
    each leave their layer reading EXACTLY the source table's rows, and
    the follow-up reclamation (vacuum / expire) changes nothing."""
    from lakehouses_spark.tables import LakeTable
    from lakehouses_spark.tables.delta_log import DeltaLogReader, read_delta
    from lakehouses_spark.tables.iceberg_meta import (
        IcebergMetadataReader, read_iceberg,
    )

    tmp = tmp_path_factory.mktemp("maint_prop")
    df = spark.createDataFrame(
        [(i, i % 10, float(i)) for i in range(40)], "k long, b int, v double"
    )
    t = LakeTable.create(spark, tmp / "lake", df)
    nxt = 100
    for op, bucket in ops:
        if op == "append":
            t.append(spark.createDataFrame(
                [(nxt + j, bucket, 1.0) for j in range(5)],
                "k long, b int, v double"))
            nxt += 5
        elif op == "delete":
            t.delete(f"b = {bucket}")
        elif op == "lazy_delete":
            t.delete(f"b = {bucket}", lazy=True)
        else:
            t.update({"v": "v + 1"}, where=f"b = {bucket}")

    def rows(df_):
        return sorted(tuple(r) for r in df_.select("k", "b", "v").collect())

    want = rows(t.read())

    d_dest = t.export_delta_log(tmp / "delta")
    dr = DeltaLogReader(spark, d_dest)
    if dr.snapshot().files:
        dr.optimize(target_files=2)
        assert rows(read_delta(spark, d_dest)) == want
        DeltaLogReader(spark, d_dest).vacuum(retention_hours=0)
        assert rows(read_delta(spark, d_dest)) == want

    i_dest = t.export_iceberg_metadata(tmp / "ice")
    ir = IcebergMetadataReader(spark, i_dest)
    if ir.live_files():
        ir.rewrite_data_files(target_files=2)
        assert rows(read_iceberg(spark, i_dest)) == want
        ir.expire_snapshots(keep_last=1)
        assert rows(read_iceberg(spark, i_dest)) == want
