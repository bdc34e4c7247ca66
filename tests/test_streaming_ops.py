"""Stream-static enrichment and the foreachBatch batch-sink bridge."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from parquet_to_postgres_spark.etl import ParquetSink
from parquet_to_postgres_spark.streaming import ops
from parquet_to_postgres_spark.tables import load_table

from .conftest import SF_SMOKE


def test_enrich_with_dim_matches_batch_join(spark):
    """Stream-static broadcast enrichment == the same join run in batch
    (stateless: no watermark required, no streaming state)."""
    dim = (
        load_table(spark, SF_SMOKE, "customer")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    stream = ops.events_stream(spark, SF_SMOKE).select("event_id", "user_id")
    enriched = ops.enrich_with_dim(stream, dim, on="user_id")
    got = ops.run_stream_to_df(enriched, "append")

    batch = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id"
    ).join(dim, "user_id", "left")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # every event kept (left join), segments attached where the dim matches
    assert got.count() == load_table(spark, SF_SMOKE, "events").count()
    assert got.where(F.col("segment").isNotNull()).count() > 0


def test_foreach_batch_parquet_sink_roundtrip(spark):
    """foreachBatch bridges a stream into the batch ETL sink: the
    written parquet equals the batch-filtered input. Sink mode must be
    append — each micro-batch is one sink.write call."""
    stream = ops.events_stream(spark, SF_SMOKE).where(
        F.col("event_type") == "purchase"
    )
    with tempfile.TemporaryDirectory() as d:
        ops.run_stream_to_sink(
            stream, ParquetSink(f"{d}/out", mode="append"), f"{d}/ckpt"
        )
        back = spark.read.parquet(f"{d}/out")
        batch = load_table(spark, SF_SMOKE, "events").where(
            F.col("event_type") == "purchase"
        )
        assert back.count() == batch.count()
        assert sorted(back.columns) == sorted(batch.columns)
        assert (
            back.agg(F.sum(F.col("value").cast("decimal(12,2)"))).collect()[0][0]
            == batch.agg(F.sum(F.col("value").cast("decimal(12,2)"))).collect()[0][0]
        )


def test_foreach_batch_rejects_overwrite_sink(spark):
    """An overwrite-mode sink under foreachBatch would keep only the
    last micro-batch — rejected loudly instead of losing data."""
    import pytest

    with pytest.raises(ValueError, match="overwrite"):
        ops.foreach_batch_writer(ParquetSink("/tmp/nope", mode="overwrite"))


def test_idempotent_sink_replayed_batch_no_double_insert(spark):
    """The batch_id-keyed sink is exactly-once under retries: running
    the stream, then REPLAYING a micro-batch through the same writer
    (what a failure-after-write/before-commit retry does), leaves the
    table unchanged — the replay overwrites its own batch_id partition
    instead of appending a second copy."""
    import tempfile

    from parquet_to_postgres_spark.etl import IdempotentParquetSink

    stream = ops.events_stream(spark, SF_SMOKE).where(
        F.col("event_type") == "purchase"
    )
    with tempfile.TemporaryDirectory() as d:
        sink = IdempotentParquetSink(f"{d}/out")
        ops.run_stream_to_sink(stream, sink, f"{d}/ckpt")

        batch = load_table(spark, SF_SMOKE, "events").where(
            F.col("event_type") == "purchase"
        )
        back = spark.read.parquet(f"{d}/out")
        n0 = back.count()
        assert n0 == batch.count()
        checksum0 = back.agg(
            F.sum(F.col("value").cast("decimal(12,2)"))
        ).collect()[0][0]
        batch_ids = [r[0] for r in back.select("batch_id").distinct().collect()]

        # replay: re-deliver one whole micro-batch to the writer with its
        # original batch_id (at-least-once delivery after a lost commit)
        writer = ops.foreach_batch_writer(sink)
        replay_id = batch_ids[0]
        # materialize the replayed rows BEFORE the write: the sink
        # overwrites the very partition this frame lazily reads
        replay_df = (
            spark.read.parquet(f"{d}/out")
            .where(F.col("batch_id") == replay_id)
            .drop("batch_id")
            .localCheckpoint(eager=True)
        )
        writer(replay_df, replay_id)

        after = spark.read.parquet(f"{d}/out")
        assert after.count() == n0
        assert (
            after.agg(F.sum(F.col("value").cast("decimal(12,2)"))).collect()[0][0]
            == checksum0
        )
        # an APPEND-mode plain sink under the same replay WOULD double-insert
        # (control for the assertion above)
        plain = ParquetSink(f"{d}/plain", mode="append")
        plain.write(replay_df)
        plain.write(replay_df)
        assert spark.read.parquet(f"{d}/plain").count() == 2 * replay_df.count()


def test_tws_user_totals_plan_builds(spark):
    """transformWithStateInPandas (the Spark-4 successor stateful API):
    the operator's streaming plan must BUILD against the real stream —
    analysis catches schema/key/output-mode mistakes — even where the
    runtime protobuf dependency is missing."""
    result = ops.stateful_user_totals_tws(ops.events_stream(spark, SF_SMOKE))
    assert result.isStreaming
    assert set(result.columns) == {"user_id", "n_events", "sum_cents"}


@pytest.mark.skipif(
    not ops.tws_available(),
    reason="transformWithStateInPandas needs google.protobuf at runtime; "
    "not shipped in this environment (applyInPandasWithState covers T6)",
)
def test_tws_user_totals_matches_batch(spark):
    """Where protobuf exists, the new-API operator must produce exactly
    the batch per-user totals (same contract as stateful_user_totals)."""
    got = ops.run_stream_to_df(
        ops.stateful_user_totals_tws(ops.events_stream(spark, SF_SMOKE)),
        "update",
        rocksdb=True,
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_idempotent_sink_multi_batch_replay(spark):
    """Exactly-once across a MULTI-batch run: maxFilesPerTrigger=1 over
    a 3-file input produces 3 micro-batches / 3 batch_id partitions;
    replaying the middle batch leaves total rows and per-batch layout
    unchanged."""
    import tempfile

    from parquet_to_postgres_spark.etl import IdempotentParquetSink

    src = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )
    with tempfile.TemporaryDirectory() as d:
        src.repartition(3).write.parquet(f"{d}/in")
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{d}/in")
        )
        sink = IdempotentParquetSink(f"{d}/out")
        ops.run_stream_to_sink(stream, sink, f"{d}/ckpt")

        back = spark.read.parquet(f"{d}/out")
        n0 = back.count()
        assert n0 == src.count()
        ids = sorted(
            r[0] for r in back.select("batch_id").distinct().collect()
        )
        assert len(ids) >= 2, f"expected multiple micro-batches, got {ids}"

        replay_id = ids[len(ids) // 2]
        replay_df = (
            spark.read.parquet(f"{d}/out")
            .where(F.col("batch_id") == replay_id)
            .drop("batch_id")
            .localCheckpoint(eager=True)
        )
        ops.foreach_batch_writer(sink)(replay_df, replay_id)

        after = spark.read.parquet(f"{d}/out")
        assert after.count() == n0
        per_batch = {
            r["batch_id"]: r["n"]
            for r in after.groupBy("batch_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert sorted(per_batch) == ids  # no new partitions appeared


def test_checkpoint_restart_processes_nothing_twice(spark):
    """Source-side exactly-once: re-running an availableNow query over
    the SAME durable checkpoint re-delivers no data — the restarted
    query sees the committed offsets and writes zero new rows even into
    a plain append sink."""
    import tempfile

    stream = ops.events_stream(spark, SF_SMOKE).where(
        F.col("event_type") == "purchase"
    )
    with tempfile.TemporaryDirectory() as d:
        sink = ParquetSink(f"{d}/out", mode="append")
        ops.run_stream_to_sink(stream, sink, f"{d}/ckpt")
        n1 = spark.read.parquet(f"{d}/out").count()
        assert n1 > 0

        # "restart": same input, same checkpoint, fresh query object
        stream2 = ops.events_stream(spark, SF_SMOKE).where(
            F.col("event_type") == "purchase"
        )
        ops.run_stream_to_sink(stream2, sink, f"{d}/ckpt")
        assert spark.read.parquet(f"{d}/out").count() == n1


def test_run_stream_to_df_concurrent_conf_restore(spark):
    """r15 optimization: stream_windowed_aggs overlaps two harness runs
    from driver threads, so the session-global harness conf
    (shuffle.partitions=8) must be saved/set/restored through the
    refcounted guard — the naive per-call save/restore races and can
    leave the session at 8 after the LAST exiter restores the other
    run's snapshot.  Two concurrent runs must produce the same rows as
    sequential runs and leave the conf exactly as found."""
    from pyspark import InheritableThread

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results: dict[str, object] = {}

    def run(name: str) -> None:
        stream = ops.events_stream(spark, SF_SMOKE).select(
            "event_id", "user_id"
        )
        results[name] = ops.run_stream_to_df(
            stream.groupBy("user_id").count(), "complete"
        )

    threads = [
        InheritableThread(target=run, args=(n,)) for n in ("a", "b")
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    seq = ops.run_stream_to_df(
        ops.events_stream(spark, SF_SMOKE)
        .select("event_id", "user_id")
        .groupBy("user_id")
        .count(),
        "complete",
    )
    want = sorted(map(tuple, seq.collect()))
    assert sorted(map(tuple, results["a"].collect())) == want
    assert sorted(map(tuple, results["b"].collect())) == want
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_run_stream_to_df_guard_is_per_session(spark):
    """r15 review finding: the harness-conf guard state must be keyed
    by SESSION.  Two sessions (same SparkContext, independent SQLConf)
    running overlapped harness streams must each get the 8-partition
    regime and each be restored to their OWN previous conf — a
    process-wide refcount would skip setting the second session's
    regime and cross-restore the first session's values onto it."""
    from pyspark import InheritableThread

    other = spark.newSession()
    other.conf.set("spark.sql.shuffle.partitions", "23")
    prev_main = spark.conf.get("spark.sql.shuffle.partitions")
    assert prev_main != "23"
    results: dict[str, object] = {}

    def run(name: str, session) -> None:
        stream = ops.events_stream(session, SF_SMOKE).select(
            "event_id", "user_id"
        )
        results[name] = ops.run_stream_to_df(
            stream.groupBy("user_id").count(), "complete"
        )

    threads = [
        InheritableThread(target=run, args=("main", spark)),
        InheritableThread(target=run, args=("other", other)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_main
    assert other.conf.get("spark.sql.shuffle.partitions") == "23"
    want = sorted(map(tuple, results["main"].collect()))
    assert sorted(map(tuple, results["other"].collect())) == want
    assert len(want) > 0


def test_run_stream_to_df_row_cap_guard(spark, monkeypatch):
    """run_stream_to_df collects the memory sink to the driver — safe
    only because the harness is bounded.  The cap makes a large-stream
    misuse fail fast and loud instead of OOMing the driver (driver
    ADVICE r7).  Verified by shrinking the cap below the fixture size."""
    stream = ops.events_stream(spark, SF_SMOKE).select("event_id", "user_id")
    monkeypatch.setattr(ops, "MAX_MEMORY_SINK_ROWS", 10)
    with pytest.raises(RuntimeError, match="memory sink exceeded 10 rows"):
        ops.run_stream_to_df(stream, "append")
    # and the over-cap run must not leak its memory-sink temp view
    assert not [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("stream_sink_")
    ]


def test_stateful_user_totals_prunes_arrow_boundary(spark):
    """r15 (guide §4): applyInPandasWithState ships every child column
    through the state shuffle and the Arrow boundary (the kernel is
    opaque to Catalyst — nothing downstream can prune it), so
    stateful_user_totals must project to exactly the two columns the
    kernel reads BEFORE the stateful operator.  Pin: the stateful node
    names only (user_id, value), and its direct child is that
    two-column Project — not the six-column events stream."""
    import re

    st = ops.stateful_user_totals(ops.events_stream(spark, SF_SMOKE))
    plan = st._jdf.queryExecution().analyzed().toString()
    head = plan.splitlines()[0]
    assert "FlatMapGroupsInPandasWithState" in head, head
    for fat in ("props", "event_type", "event_id", r"(?<![a-z_])ts#"):
        assert not re.search(fat, head), (
            f"unpruned column reaches the kernel: {head}"
        )
    # search the WHOLE plan for the two-column Project rather than
    # pinning it to a specific pretty-printed line (r15 ADVICE item —
    # indentation markers / extra nodes vary across Spark versions)
    assert re.search(r"Project \[user_id#\d+L?, value#\d+\]", plan), plan
    # the TWS twin carries the same projection (shared §4 contract)
    tws = ops.stateful_user_totals_tws(ops.events_stream(spark, SF_SMOKE))
    tws_plan = tws._jdf.queryExecution().analyzed().toString()
    assert re.search(r"Project \[user_id#\d+L?, value#\d+\]", tws_plan), tws_plan
