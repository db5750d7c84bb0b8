"""Streaming analytics tests (T4-T8): availableNow drain of a staged file
stream, checked against the identical batch expression (stream/batch
unification is the invariant — SURVEY §5 item 3)."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from lakehouses_spark.io import load_table
from lakehouses_spark.streaming import (
    dedup_within_watermark,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Stage the events table as parquet files for file-stream replay (the
    Kafka substitute, SURVEY §7.0)."""
    d = tmp_path_factory.mktemp("events_stream")
    load_table(spark, SF, "events").repartition(4).write.mode("overwrite") \
        .parquet(str(d / "data"))
    return d


def _drain(spark, stream_df, tmp: Path, name: str):
    """Run a streaming aggregation to completion, return the result rows."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def _stream(spark, events_dir):
    schema = spark.read.parquet(str(events_dir / "data")).schema
    return spark.readStream.schema(schema).parquet(str(events_dir / "data"))


def _norm(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_matches_batch(spark, events_dir, tmp_path):
    batch = spark.read.parquet(str(events_dir / "data"))
    got = _drain(spark, tumbling_window_agg(_stream(spark, events_dir)),
                 tmp_path, "tumbling")
    want = tumbling_window_agg(batch)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _norm(got, cols) == _norm(want, cols)


def test_sliding_stream_matches_batch(spark, events_dir, tmp_path):
    batch = spark.read.parquet(str(events_dir / "data"))
    got = _drain(spark, sliding_window_agg(_stream(spark, events_dir)),
                 tmp_path, "sliding")
    want = sliding_window_agg(batch)
    cols = ["window_start", "n_events", "total_value"]
    assert _norm(got, cols) == _norm(want, cols)


def test_session_stream_matches_batch(spark, events_dir, tmp_path):
    batch = spark.read.parquet(str(events_dir / "data"))
    got = _drain(spark, session_window_agg(_stream(spark, events_dir)),
                 tmp_path, "sessions")
    want = session_window_agg(batch)
    cols = ["session_start", "user_id", "n_events", "total_value"]
    assert _norm(got, cols) == _norm(want, cols)
    # sanity: session count matches the batch gaps-and-islands operator
    n_sessions_stream = got.count()
    from lakehouses_spark.queries.timeseries import ts_sessionize
    n_sessions_batch = (
        ts_sessionize(spark, SF).agg(F.sum("n_sessions").alias("s")).collect()[0].s
    )
    assert n_sessions_stream == n_sessions_batch


def test_processing_time_live_appends(spark, tmp_path):
    """T2/T5: a processingTime-triggered query keeps consuming while new
    files land (the reference's live stream-plus-inserts demo,
    02.delta_lake_primer.py:144-151), then stops cleanly."""
    import time

    src = tmp_path / "live_src"
    src.mkdir()
    schema = "id long, v double"
    spark.createDataFrame([(1, 1.0)], schema).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "live_out"))
        .option("checkpointLocation", str(tmp_path / "live_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        for i in range(2, 5):  # concurrent producer
            spark.createDataFrame([(i, float(i))], schema).write.mode("append") \
                .parquet(str(src))
            time.sleep(1.2)
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                if spark.read.parquet(str(tmp_path / "live_out")).count() >= 4:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(30)
    got = sorted(r.id for r in spark.read.parquet(str(tmp_path / "live_out")).collect())
    assert got == [1, 2, 3, 4]


def test_dedup_within_watermark(spark, events_dir, tmp_path):
    # duplicate the stream: replay the same files twice under one source dir
    dup_dir = tmp_path / "dup"
    import shutil

    shutil.copytree(events_dir / "data", dup_dir / "a")
    shutil.copytree(events_dir / "data", dup_dir / "b")
    schema = spark.read.parquet(str(events_dir / "data")).schema
    stream = spark.readStream.schema(schema).option("recursiveFileLookup", "true") \
        .parquet(str(dup_dir))
    deduped = dedup_within_watermark(stream, keys=("event_id",), watermark="1 hour")
    q = (
        deduped.writeStream.format("memory").queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_unique = spark.read.parquet(str(events_dir / "data")).count()
    assert spark.sql("SELECT count(*) AS n FROM dedup").collect()[0].n == n_unique


def test_running_totals_tws_gate(spark, tmp_path):
    """transformWithStateInPandas is env-gated on google.protobuf (the TWS
    state-server protocol). Where protobuf works, the drain must equal the
    batch aggregate (the same equation streaming_stateful_totals pins for
    applyInPandasWithState); here the plan must at least construct, and the
    stream fail with the documented initialization error, not something
    else."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    from lakehouses_spark.streaming.stateful import running_totals_tws

    try:
        from google.protobuf import descriptor  # noqa: F401
        protobuf_ok = True
    except ImportError:
        protobuf_ok = False

    events = spark.range(20).select(
        (F.col("id") % 4).alias("user_id"), F.col("id").cast("double").alias("value")
    )
    events.coalesce(1).write.parquet(str(tmp_path / "d"))
    stream = spark.readStream.schema("user_id long, value double").parquet(
        str(tmp_path / "d")
    )
    plan = running_totals_tws(stream)  # construction always works
    assert plan.isStreaming
    q = (
        plan.writeStream.format("memory").queryName("tws_gate")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    if not protobuf_ok:
        import pytest as _pytest

        from pyspark.errors.exceptions.captured import StreamingQueryException

        with _pytest.raises(StreamingQueryException):
            q.awaitTermination()
        return
    q.awaitTermination()
    got = {
        (r.key, r.n, r.total)
        for r in spark.sql(
            "select key, max(n) n, max(total) total from tws_gate group by key"
        ).collect()
    }
    want = {
        (r.user_id, r.n, r.total)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_stream_stream_left_outer_join_watermark_expiry(spark, tmp_path):
    """Left-outer stream-stream join: matched rows emit immediately;
    UNMATCHED left rows emit with nulls only after the watermark passes
    their join-window end — and rows near the stream's end stay withheld
    (their state never expires because no later batch advances the
    watermark past them). This pins the exact availableNow semantics a
    pipeline must design around; the INNER-join drain (which has no such
    withholding) is the driver-facing query (streaming_stream_join)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    views = [  # (view_id, user, ts)
        (1, 10, ts(0)),    # early, matched by purchase at +5
        (2, 11, ts(0)),    # early, UNMATCHED -> expires when batch 2 lands
        (3, 10, ts(600)),  # late, matched
        (4, 11, ts(600)),  # late, UNMATCHED -> state never expires: withheld
    ]
    purchases = [  # (purchase_id, user, ts)
        (101, 10, ts(5)),
        (103, 10, ts(605)),
    ]
    vdf = spark.createDataFrame(views, "view_id long, user_id long, ts timestamp")
    pdf = spark.createDataFrame(
        purchases, "purchase_id long, user_id long, ts timestamp"
    )
    # one file per time-tier so availableNow (maxFilesPerTrigger=1) replays
    # tier 0 then tier 600 as separate micro-batches, advancing the
    # watermark between them
    for tier, part in (("b0", 0), ("b1", 600)):
        vdf.where(F.col("ts") == ts(part)).coalesce(1).write.parquet(
            f"{tmp_path}/v/{tier}"
        )
        pdf.where(F.col("ts") == ts(part + 5)).coalesce(1).write.parquet(
            f"{tmp_path}/p/{tier}"
        )
    v = (
        spark.readStream.schema(vdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_path}/v/*")
        .withWatermark("ts", "10 minutes")
        .alias("v")
    )
    p = (
        spark.readStream.schema(pdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_path}/p/*")
        .withWatermark("ts", "10 minutes")
        .alias("p")
    )
    joined = v.join(
        p,
        F.expr(
            "v.user_id = p.user_id AND p.ts > v.ts "
            "AND p.ts <= v.ts + interval 30 minutes"
        ),
        "left_outer",
    ).select("view_id", "purchase_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.view_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM ssj_outer").collect()
    }
    assert (1, 101) in got and (3, 103) in got  # matches always emit
    assert (2, None) in got  # expired unmatched view emits null-joined
    # view 4's state never expires (no batch after tier 600 advances the
    # watermark) — availableNow withholds it; this is the designed-for gap
    assert (4, None) not in got


def test_streaming_incremental_minhash_updates_index_between_batches(
    spark, tmp_path
):
    """The streaming form of dedup_incremental_minhash: a file stream drains
    in TWO micro-batches through a foreachBatch that (1) probes the current
    persisted MinHash index, (2) appends verdicts, (3) indexes the accepted
    docs' signatures. The crux is batch 2 containing a twin of a doc
    ACCEPTED in batch 1 — it must come back dup_of_existing pointing at the
    batch-1 doc, which only happens if the index update between micro-batches
    is real. Verdicts must equal the sequential batch replay of the same
    probe (stream/batch unification, SURVEY §5 item 3)."""
    import json
    import os

    from lakehouses_spark.queries.dedup import (
        hashed_shingle_sets,
        minhash_buckets,
        minhash_probe,
    )
    from lakehouses_spark.tables import LakeTable

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    corpus_rows = {r.doc_id: r.text for r in docs.limit(4).collect()}
    base_ids = sorted(corpus_rows)
    t0, t1 = corpus_rows[base_ids[0]], corpus_rows[base_ids[1]]
    fresh1 = " ".join("x" + w for w in t0.split())   # zero shingle overlap
    fresh2 = " ".join("y" + w for w in t1.split())
    batches = [
        # batch 1: twin of a corpus doc (dup) + a fresh doc (accepted)
        [
            {"doc_id": 100_000 + base_ids[0], "text": t0 + " zzz"},
            {"doc_id": 200_001, "text": fresh1},
        ],
        # batch 2: twin of batch-1's ACCEPTED doc (incremental crux) + fresh
        [
            {"doc_id": 300_001, "text": fresh1 + " qqq"},
            {"doc_id": 200_002, "text": fresh2},
        ],
    ]

    def sigs_of(df):
        return minhash_buckets(hashed_shingle_sets(df), keep=("hs",))

    idx_path = tmp_path / "minhash_index"
    LakeTable.create(spark, idx_path, sigs_of(docs))

    landing = tmp_path / "landing"
    landing.mkdir()
    for i, rows in enumerate(batches):
        p = landing / f"batch-{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (1_000_000 + i, 1_000_000 + i))  # deterministic order

    verdict_dir = str(tmp_path / "verdicts")

    def probe_and_index(batch_df, _batch_id):
        t = LakeTable(batch_df.sparkSession, idx_path)
        sigs = sigs_of(batch_df).localCheckpoint()
        verdicts = minhash_probe(sigs, t.read()).localCheckpoint()
        verdicts.write.mode("append").parquet(verdict_dir)
        accepted = sigs.join(
            verdicts.where(F.col("status") == "accepted").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        t.append(accepted)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
        .writeStream.foreachBatch(probe_and_index)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r.doc_id: (r.status, r.dup_of)
        for r in spark.read.parquet(verdict_dir).collect()
    }
    assert got[100_000 + base_ids[0]] == ("dup_of_existing", base_ids[0])
    assert got[200_001] == ("accepted", None)
    # the incremental crux: found only because batch 1 indexed 200001
    assert got[300_001] == ("dup_of_existing", 200_001)
    assert got[200_002] == ("accepted", None)
    # index grew by exactly the accepted docs
    all_corpus_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    assert sorted(
        r.doc_id
        for r in LakeTable(spark, idx_path).read().select("doc_id").collect()
    ) == sorted([*all_corpus_ids, 200_001, 200_002])

    # stream/batch unification: the sequential batch replay of the same
    # probe over the same two batches yields identical verdicts
    idx2 = tmp_path / "replay_index"
    LakeTable.create(spark, idx2, sigs_of(docs))
    replay = {}
    for rows in batches:
        bdf = spark.createDataFrame(rows, "doc_id long, text string")
        t = LakeTable(spark, idx2)
        sigs = sigs_of(bdf).localCheckpoint()
        v = minhash_probe(sigs, t.read()).localCheckpoint()
        replay.update({r.doc_id: (r.status, r.dup_of) for r in v.collect()})
        t.append(
            sigs.join(
                v.where(F.col("status") == "accepted").select("doc_id"),
                "doc_id",
                "left_semi",
            )
        )
    assert replay == got
