"""Streaming semantics tests (SURVEY.md §5.2-5).

Multi-batch behavior the single-replay oracle cannot see: watermark
late-data drop, cross-batch stateful accumulation, and the
sessionization batch/stream equivalence.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _write_batch(spark, d: str, name: str, rows: list[tuple]) -> None:
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(d)
    # distinct mtimes so the file source sees them as separate batches
    time.sleep(0.05)


@pytest.fixture
def stream_dir(tmp_path):
    return str(tmp_path / "stream_in")


def test_late_rows_dropped_after_watermark(spark, stream_dir, tmp_path):
    """A row older than the watermark must not resurrect a closed window."""
    schema = "event_id long, ts timestamp, user_id long, value double"
    # batch 1: events at 10:00 and 12:00 -> watermark reaches 11:50
    _write_batch(
        spark,
        stream_dir,
        "b1",
        [(1, "2024-01-01 10:00:00", 1, 1.0), (2, "2024-01-01 12:00:00", 1, 1.0)],
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.sum("value").alias("s"))
        .select(F.unix_micros("window.start").alias("w"), "s")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE row for the already-closed 10:00 window
        _write_batch(spark, stream_dir, "b2", [(3, "2024-01-01 10:30:00", 1, 99.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r["w"]: r["s"] for r in spark.table("late_test").collect()}
    ten = 1704103200000000  # 2024-01-01 10:00:00 UTC in µs
    assert out.get(ten) == 1.0, f"late row leaked into closed window: {out}"


def test_stateful_accumulates_across_batches(spark, stream_dir, tmp_path):
    """applyInPandasWithState must carry state between micro-batches."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = "event_id long, ts timestamp, user_id long, value double"
    _write_batch(spark, stream_dir, "b1", [(1, "2024-01-01 10:00:00", 7, 1.0)])

    def update(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    out = src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_test")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, stream_dir, "b2", [(2, "2024-01-01 10:01:00", 7, 1.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    ns = [r["n"] for r in spark.table("state_test").collect()]
    assert max(ns) == 2, f"state did not accumulate across batches: {ns}"


def test_session_stream_equals_batch(spark, sf_dir):
    """session_window (stream) == gaps-and-islands (batch) on closed
    sessions — the reference's two-implementations cross-check idea."""
    from traj_sim_spark_spark import registry

    registry.load_all()
    stream = registry.QUERIES["stream_session"](spark, sf_dir).toPandas()
    batch_all = registry.QUERIES["traj_session_batch"](spark, sf_dir).toPandas()
    max_us = batch_all["end_us"].max()
    cutoff = max_us - 10 * 60 * 1_000_000
    batch = batch_all[batch_all["end_us"] + 1_800_000_000 <= cutoff]
    s = stream.sort_values(["user_id", "start_us"]).reset_index(drop=True)
    b = batch.sort_values(["user_id", "start_us"]).reset_index(drop=True)
    assert len(s) == len(b)
    assert (s["user_id"] == b["user_id"]).all()
    assert (s["n_events"].to_numpy() == b["n_events"].to_numpy()).all()


def test_funnel_state_machine_across_batches(spark, stream_dir, tmp_path):
    """The funnel state machine must advance — and only advance — across
    micro-batches: a click BEFORE the first view never counts, a click in
    a later batch does, and the purchase must follow the click."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from traj_sim_spark_spark.streaming.streams_ext import _funnel_advance

    def _write(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["user_id", "event_type", "ts"]
        )
        pdf["us"] = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
        spark.createDataFrame(
            pdf[["user_id", "event_type", "us"]]
        ).coalesce(1).write.mode("append").parquet(stream_dir)
        time.sleep(0.05)

    # b1: click precedes the first view (must not count), then the view
    _write("b1", [(7, "click", "2024-01-01 09:59:00"),
                  (7, "view", "2024-01-01 10:00:00"),
                  (7, "purchase", "2024-01-01 10:00:30")])  # pre-click: no
    src = (
        spark.readStream.schema("user_id long, event_type string, us long")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    out = src.groupBy("user_id").applyInPandasWithState(
        _funnel_advance,
        outputStructType="user_id bigint, v_us bigint, c_us bigint, "
        "p_us bigint, stage int",
        stateStructType="v bigint, c bigint, p bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_test")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    try:
        q.processAllAvailable()
        mid = {
            r["user_id"]: r for r in spark.table("funnel_test").collect()
        }
        assert mid[7]["stage"] == 1, f"pre-view click/purchase counted: {mid}"
        # b2: the real click, then the purchase
        _write("b2", [(7, "click", "2024-01-01 10:01:00"),
                      (7, "purchase", "2024-01-01 10:02:00")])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [
        r for r in spark.table("funnel_test").collect() if r["stage"] == 3
    ]
    assert rows, "funnel never reached stage 3 after batch 2"
    r = rows[-1]
    us = lambda s: int(pd.Timestamp(s).value // 1000)  # noqa: E731
    assert r["v_us"] == us("2024-01-01 10:00:00")
    assert r["c_us"] == us("2024-01-01 10:01:00")
    assert r["p_us"] == us("2024-01-01 10:02:00")


def test_anomaly_welford_state_across_batches(spark, stream_dir, tmp_path):
    """The Welford accumulator must carry across micro-batches: the
    spike in batch 2 is anomalous only against batch 1's history."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from traj_sim_spark_spark.streaming.streams_ext import _anomaly_advance

    def _write(rows):
        pdf = pd.DataFrame(
            rows, columns=["user_id", "event_id", "us", "value"]
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            stream_dir
        )
        time.sleep(0.05)

    # batch 1: 8 well-behaved points (warmup is 5)
    _write([(7, i, i * 1000, float(v)) for i, v in
            enumerate([10, 11, 9, 10, 12, 9, 11, 10])])
    src = (
        spark.readStream.schema(
            "user_id long, event_id long, us long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    out = src.groupBy("user_id").applyInPandasWithState(
        _anomaly_advance,
        outputStructType="user_id bigint, n_events bigint, "
        "n_anomalies bigint",
        stateStructType="n bigint, mean double, m2 double, hits bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("anom_test")
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r["user_id"]: r for r in spark.table("anom_test").collect()}
        assert first[7]["n_anomalies"] == 0, first
        # batch 2: an extreme spike — anomalous only vs carried history
        _write([(7, 100, 100_000, 1000.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(
        spark.table("anom_test").collect(), key=lambda r: r["n_events"]
    )
    assert rows[-1]["n_events"] == 9
    assert rows[-1]["n_anomalies"] == 1, rows


def test_pack_chunks_offset_across_batches(spark, tmp_path):
    """The packing offset must carry across micro-batches: a document
    arriving in batch 2 starts at the token offset where batch 1 ended,
    so its block range continues the stream rather than restarting at
    chunk 0."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from traj_sim_spark_spark.streaming.streams_ext import _pack_advance

    src_dir = str(tmp_path / "docs")

    def _write(rows):
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "source", "shard", "n_tokens"]
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(0.05)

    # batch 1: 100 + 200 tokens -> stream offset ends at 300
    _write([(0, "web", 0, 100), (4, "web", 0, 200)])
    src = (
        spark.readStream.schema(
            "doc_id long, source string, shard long, n_tokens long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = src.groupBy("source", "shard").applyInPandasWithState(
        _pack_advance,
        outputStructType="source string, shard bigint, doc_id bigint, "
        "n_tokens bigint, first_chunk bigint, last_chunk bigint, "
        "n_chunks bigint",
        stateStructType="off bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("pack_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_pack"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: 300 tokens starting at offset 300 -> chunks 1..2
        _write([(8, "web", 0, 300)])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["doc_id"]: (r["first_chunk"], r["last_chunk"])
        for r in spark.table("pack_test").collect()
    }
    assert got[0] == (0, 0)  # offset 0..99
    assert got[4] == (0, 1)  # offset 100..299 crosses the 256 boundary
    assert got[8] == (1, 2)  # offset 300..599: state carried, not reset


def test_ewma_ring_state_across_batches(spark, stream_dir, tmp_path):
    """The 16-slot ring buffer must carry across micro-batches: after
    two batches of 10 events each, the EWMA sees the last 16 events
    spanning both batches, not just batch 2."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from traj_sim_spark_spark.streaming.streams_ext import (
        _EWMA_W,
        _ewma_advance,
    )

    def _write(rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "us", "vi"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            stream_dir
        )
        time.sleep(0.05)

    vals1 = [(9, i, i * 1000, 1_000_000 * (i + 1)) for i in range(10)]
    _write(vals1)
    src = (
        spark.readStream.schema(
            "user_id long, event_id long, us long, vi long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    out = src.groupBy("user_id").applyInPandasWithState(
        _ewma_advance,
        outputStructType="user_id bigint, n_events bigint, ewma double",
        stateStructType="vals array<bigint>, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_ewma"))
        .start()
    )

    def _expected(all_vis):
        tail = all_vis[-_EWMA_W:]
        k = len(tail)
        num = sum(
            v << (_EWMA_W - 1 - j) for j, v in enumerate(reversed(tail))
        )
        denom = (1 << _EWMA_W) - (1 << (_EWMA_W - k))
        # the UDF emits the RAW double (rounding is JVM-side in the
        # final select); identical integer inputs => identical float
        return num / denom / 1e6

    try:
        q.processAllAvailable()
        rows = {
            r["n_events"]: r["ewma"]
            for r in spark.table("ewma_test").collect()
        }
        assert rows[10] == _expected([v[3] for v in vals1])
        vals2 = [(9, 10 + i, (10 + i) * 1000, 2_000_000 * (i + 1))
                 for i in range(10)]
        _write(vals2)
        q.processAllAvailable()
        rows = {
            r["n_events"]: r["ewma"]
            for r in spark.table("ewma_test").collect()
        }
        all_vis = [v[3] for v in vals1 + vals2]
        # 20 events seen; the ring holds the last 16, 6 of them from
        # batch 1 — wrong if state did not carry across batches
        assert rows[20] == _expected(all_vis)
    finally:
        q.stop()


def test_stream_layout_ingest_across_batches(spark, stream_dir, tmp_path):
    """The stream-grown partitioned layout must accumulate correctly
    across MULTIPLE micro-batches (maxFilesPerTrigger=1): every batch
    appends into the right band directories, nothing is lost or
    double-committed, and the final partitioned read equals the union
    of all batches."""
    schema = "event_id long, ts timestamp, user_id long, value double"
    _write_batch(
        spark, stream_dir, "b1",
        [(1, "2024-01-01 10:00:00", 1, 10.0),
         (2, "2024-01-01 10:01:00", 2, 60.0)],
    )
    _write_batch(
        spark, stream_dir, "b2",
        [(3, "2024-01-01 10:02:00", 1, 20.0),
         (4, "2024-01-01 10:03:00", 3, 110.0)],
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    out = str(tmp_path / "layout")
    q = (
        src.select(
            "user_id", "value",
            F.floor(F.col("value") / 50.0).cast("bigint").alias("band"),
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .partitionBy("band")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert q.lastProgress is None or True  # query drained
    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("band=")
    )
    assert dirs == ["band=0", "band=1", "band=2"], dirs
    back = spark.read.parquet(out)
    got = sorted(
        (int(r["band"]), float(r["value"])) for r in back.collect()
    )
    assert got == [(0, 10.0), (0, 20.0), (1, 60.0), (2, 110.0)]
    # band-restricted read touches only its directory
    b0 = spark.read.parquet(out).filter(F.col("band") == 0)
    assert b0.count() == 2


def test_cdc_lww_survives_out_of_order_and_tombstones(
    spark, tmp_path
):
    """The CDC register must be batching- and arrival-order-independent:
    a LATE-arriving older event in batch 2 must NOT displace the newer
    value carried in state, and a tombstone ('error') must delete the
    key while later upserts resurrect it."""
    import os
    import time

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from traj_sim_spark_spark.streaming.streams_ext import _cdc_advance

    cdc_dir = str(tmp_path / "cdc_src")
    os.makedirs(cdc_dir, exist_ok=True)

    def _write(rows):
        pdf = pd.DataFrame(
            rows,
            columns=["user_id", "event_id", "event_type", "us", "value"],
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "append"
        ).parquet(cdc_dir)
        time.sleep(0.05)

    # batch 1: u1 upserted twice (winner us=200); u2 tombstoned last
    _write(
        [
            (1, 1, "view", 100, 10.0),
            (1, 2, "view", 200, 20.0),
            (2, 3, "view", 150, 5.0),
            (2, 4, "error", 250, 0.0),
        ]
    )
    src = (
        spark.readStream.schema(
            "user_id long, event_id long, event_type string,"
            " us long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(cdc_dir)
    )
    out = src.groupBy("user_id").applyInPandasWithState(
        _cdc_advance,
        outputStructType=(
            "user_id bigint, n_ops bigint, last_epoch_s bigint,"
            " alive int, last_value double"
        ),
        stateStructType=(
            "best_us bigint, best_eid bigint, val double,"
            " alive int, n bigint"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("cdc_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_cdc"))
        .start()
    )
    try:
        q.processAllAvailable()
        snap = {
            r["user_id"]: r
            for r in spark.table("cdc_test").collect()
        }
        assert snap[1]["last_value"] == 20.0 and snap[1]["alive"] == 1
        assert snap[2]["alive"] == 0  # tombstoned
        # batch 2: a LATE event for u1 (us=50 — must lose), and a
        # resurrection upsert for u2 (us=300 — must win over tombstone)
        _write(
            [
                (1, 5, "view", 50, 99.0),
                (2, 6, "view", 300, 7.0),
            ]
        )
        q.processAllAvailable()
    finally:
        q.stop()
    final = {}
    for r in spark.table("cdc_test").collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_ops"] > cur["n_ops"]:
            final[r["user_id"]] = r
    assert final[1]["n_ops"] == 3
    assert final[1]["last_value"] == 20.0, final[1]  # late row lost LWW
    assert final[2]["alive"] == 1 and final[2]["last_value"] == 7.0


def test_stream_parquet_sink_exactly_once_across_restart(
    spark, tmp_path
):
    """The checkpointed parquet sink's exactly-once contract under
    RESTART: a query writes batch 1, STOPS, a brand-new query object
    resumes from the same checkpoint over the same source, batch 2
    arrives — the landed files must contain every row exactly once
    (no re-emission of batch 1, no loss of batch 2). This is the
    recovery path sink_stream_parquet / stream_layout_ingest claim."""
    import os
    import time

    import pandas as pd

    src = str(tmp_path / "eo_src")
    data = str(tmp_path / "eo_data")
    ckpt = str(tmp_path / "eo_ckpt")
    os.makedirs(src, exist_ok=True)

    def _write(rows):
        pdf = pd.DataFrame(rows, columns=["k", "v"])
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(0.05)

    def _start():
        return (
            spark.readStream.schema("k long, v long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", data)
            .option("checkpointLocation", ckpt)
            .start()
        )

    _write([(1, 10), (2, 20)])
    q1 = _start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    first = spark.read.parquet(data).count()
    assert first == 2, first
    # restart from the same checkpoint with a NEW query; new data lands
    _write([(3, 30)])
    q2 = _start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows = sorted(
        tuple(r) for r in spark.read.parquet(data).collect()
    )
    assert rows == [(1, 10), (2, 20), (3, 30)], rows


def test_late_audit_multibatch_semantics(spark, sf_dir):
    """Pins the multi-batch watermark rules stream_late_audit's oracle
    mirrors (established empirically round 8): the staged 3-file
    replay must (a) run exactly three data batches in bulk->head->echo
    order, (b) DROP echo rows at the state operator
    (numRowsDroppedByWatermark > 0 in the echo batch — a 2-batch
    split shows zero drops because same-batch late rows merge before
    eviction), and (c) emit each window at most once (append mode,
    no re-created windows)."""
    import os

    from pyspark.sql import types as T

    from traj_sim_spark_spark import registry
    from traj_sim_spark_spark.sources.readers import staging_dir

    registry.load_all()
    QUERIES = registry.QUERIES

    # build/refresh the staged split via the operator itself
    res = QUERIES["stream_late_audit"](spark, sf_dir)
    assert res.count() > 0

    root = os.path.join(staging_dir(sf_dir, "latesplit3"), "files")
    names = sorted(
        f for f in os.listdir(root) if f.endswith(".parquet")
    )
    assert names == [
        "a_bulk.parquet",
        "b_head.parquet",
        "c_echo.parquet",
    ], names
    mtimes = [os.stat(os.path.join(root, f)).st_mtime for f in names]
    assert mtimes == sorted(mtimes), mtimes

    sch = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    agg = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_audit_pin")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
        drops = [
            sum(
                op.get("numRowsDroppedByWatermark") or 0
                for op in p["stateOperators"]
            )
            for p in q.recentProgress
        ]
    finally:
        q.stop()
    # (a) three data batches
    assert len(progress) == 3, [p["batchId"] for p in progress]
    # (b) the echo batch dropped late rows
    assert sum(drops) > 0, drops
    # (c) append emitted each window at most once
    emitted = spark.table("late_audit_pin")
    dups = emitted.groupBy("w").count().filter("count > 1").count()
    assert dups == 0


def test_markov_state_seam_across_batches(spark, tmp_path):
    """stream_markov_transitions' state seam: the transition ACROSS a
    micro-batch boundary must be counted exactly once — the carried
    (us, event_id, event_type) tail is the one row batch LAG needs."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from traj_sim_spark_spark.streaming.streams_ext import _markov_update

    d = str(tmp_path / "mk_in")
    schema = "user_id long, us long, event_id long, event_type string"

    def write(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["user_id", "us", "event_id", "event_type"]
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(d)
        time.sleep(0.05)

    # batch 1: view -> click for user 7; batch 2 opens with purchase,
    # so (click -> purchase) exists ONLY via the carried state
    write("b1", [(7, 100, 1, "view"), (7, 200, 2, "click")])
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = src.groupBy("user_id").applyInPandasWithState(
        _markov_update,
        outputStructType="src string, dst string, n bigint",
        stateStructType="last_us bigint, last_eid bigint, "
        "last_type string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("markov_seam")
        .option("checkpointLocation", str(tmp_path / "ckpt_mk"))
        .start()
    )
    try:
        q.processAllAvailable()
        write("b2", [(7, 300, 3, "purchase"), (7, 400, 4, "view")])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["src"], r["dst"]): r["n"]
        for r in spark.table("markov_seam")
        .groupBy("src", "dst")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert got == {
        ("view", "click"): 1,
        ("click", "purchase"): 1,  # the cross-batch seam transition
        ("purchase", "view"): 1,
    }, got


def test_markov_tail_keep_max_on_out_of_order_batch():
    """The carried tail is keep-max on (us, event_id): a micro-batch
    whose events all precede the carried tail chains onto it (emitting
    its pairs) but must NOT regress the state — the next in-order
    batch still sees the true chronological tail."""
    from traj_sim_spark_spark.streaming.streams_ext import _markov_update

    class _FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists = True
            self._v = v

    state = _FakeState()

    def run(rows):
        pdf = pd.DataFrame(
            rows, columns=["user_id", "us", "event_id", "event_type"]
        )
        out = list(_markov_update((7,), iter([pdf]), state))
        pairs = {}
        for df in out:
            for r in df.itertuples(index=False):
                pairs[(r.src, r.dst)] = pairs.get((r.src, r.dst), 0) + r.n
        return pairs

    # in-order batch establishes tail at (400, 4, "view")
    assert run(
        [(7, 100, 1, "view"), (7, 200, 2, "click"), (7, 400, 4, "view")]
    ) == {("view", "click"): 1, ("click", "view"): 1}
    assert state._v == (400, 4, "view")
    # out-of-order batch: earlier than the tail -> chains onto it but
    # does NOT regress the carried state
    assert run([(7, 150, 99, "search")]) == {("view", "search"): 1}
    assert state._v == (400, 4, "view")
    # next in-order batch chains from the PRESERVED tail
    assert run([(7, 500, 5, "click")]) == {("view", "click"): 1}
    assert state._v == (500, 5, "click")


def test_bm25_ledger_batching_independent(spark, sf_dir, tmp_path):
    """The BM25 index ledger must be identical whether the corpus
    arrives as one batch or as three micro-batches (round 12): every
    per-document contribution is additive and row-local, so any file
    split replays to the same index state."""
    from traj_sim_spark_spark.streaming.streams import run_to_completion
    from traj_sim_spark_spark.streaming.streams_ext import bm25_ledger_agg
    from traj_sim_spark_spark.tables import Tables

    t = Tables(spark, sf_dir)
    docs = t.documents
    d = str(tmp_path / "docs_in")
    # three disjoint slices as separate files -> separate micro-batches
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        time.sleep(0.05)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    streamed = {
        (r["token"], r["df"], r["tf_sum"])
        for r in run_to_completion(
            bm25_ledger_agg(stream), "complete"
        ).collect()
    }
    batch = {
        (r["token"], r["df"], r["tf_sum"])
        for r in bm25_ledger_agg(docs).collect()
    }
    assert streamed == batch and len(streamed) > 1
    # the sentinel row carries N = corpus document count
    n_docs = docs.count()
    assert (" corpus_docs ", n_docs, n_docs) in streamed
