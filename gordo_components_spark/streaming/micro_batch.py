"""Structured Streaming micro-batch scoring path (SURVEY §2.9, §3.2).

Reference restatement: the Flask ``/anomaly/prediction`` serving loop and
the client's chunked predict (``client/client.py``) become a
``readStream → window/score → sink`` pipeline.  Real-time serving does
not fit Spark (BASELINE.json); micro-batch is the stated approach.

These helpers run a *real* streaming query (file source, event-time
watermark, availableNow trigger, memory sink) over the events fixture,
replayed as a multi-file directory so several micro-batches occur.
``stream_watermark_latedrop`` in the registry wraps them rows-only; the
batch-parity assertion (FIXTURES B5: streaming result == batch window())
lives in tests/test_streaming.py.
"""

from __future__ import annotations

import contextlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from gordo_components_spark.session import prepare
from gordo_components_spark.sources.tables import load_table

_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _pid_alive(pid: int) -> bool:
    """Portable liveness probe: ``os.kill(pid, 0)`` works wherever Python
    does (``/proc`` probing only works on Linux and on other hosts would
    make every sibling look dead — exactly the concurrent-rmtree race the
    PID token exists to prevent).  EPERM means the pid exists but belongs
    to another user — still alive."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except OSError:
        return True
    return True


#: rows of stream input one state-store task should own before another
#: task pays off.  A state task's FIXED cost per micro-batch (store
#: init, checkpoint delta write + fsync, maintenance) is ~100-300 ms
#: locally while per-row state upkeep is ~1-5 µs, so tasks below ~50k
#: rows are overhead-bound — the streaming analog of AQE's
#: advisoryPartitionSizeInBytes, which never applies to streams.
_STREAM_ROWS_PER_TASK = 50_000


@contextlib.contextmanager
def _stream_shuffle_partitions(
    spark: SparkSession,
    est_rows: int | None = None,
    python_stateful: bool = False,
):
    """Pin ``spark.sql.shuffle.partitions`` for the lifetime of ONE
    streaming run to a scale-derived value (guide §2: partitioning must
    be scale-adaptive, not a constant tuned for local mode or one
    cluster).  Unlike batch, streaming gets NO AQE coalescing, and the
    conf at first-micro-batch planning time fixes the state-store task
    count for the checkpoint's lifetime — on a session left at the
    200-partition default, every stateful face runs 200 state-store
    tasks (and writes 200 checkpoint delta files) per micro-batch over
    fixture-sized data: measured 168-215 s for stream_stateful_ewma on a
    vanilla local[32] session vs ~9 s at 32 partitions.

    ``est_rows`` (parquet-footer row count of the replay source — the
    same zero-cost exact statistic the footer-adaptive joins use) sizes
    DOWN from cluster parallelism when the whole run carries little
    data: partitions = clamp(est_rows / _STREAM_ROWS_PER_TASK, 8,
    defaultParallelism).  Large inputs therefore keep today's
    defaultParallelism; fixture-sized runs stop paying ~cores× state
    fixed costs (measured on stream_stream_join at 32 cores: 17.9-20.1 s
    at 32 partitions vs 7.5-11.9 s at 8, same session, interleaved).
    GORDO_STREAM_SHUFFLE_PARTITIONS overrides both for deployments
    whose state-key cardinality wants a specific width.  Checkpoints
    here are run-scoped (uuid / pid-token dirs), so no prior checkpoint
    can disagree with the pin.  Restore in finally: the conf is
    session-global and batch queries must keep seeing the session's own
    setting.

    ``python_stateful=True`` (the ``applyInPandasWithState`` faces keyed
    by ~machine-cardinality) disables the est_rows DOWN-sizing and keeps
    full parallelism: their cost is per-group PANDAS compute, and
    coalescing serializes Python workers — the streaming twin of the
    CLAUDE.md ``_spread`` invariant (measured on stream_cusum_genuine:
    7.0-7.8 s at 32 partitions vs 13.4-14.2 s at 8, same session,
    interleaved — the exact inverse of the JVM-stateful faces)."""
    key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(key)
    env = os.environ.get("GORDO_STREAM_SHUFFLE_PARTITIONS")
    if env:
        target = int(env)
    else:
        target = max(8, spark.sparkContext.defaultParallelism)
        if est_rows is not None and not python_stateful:
            sized = max(8, -(-est_rows // _STREAM_ROWS_PER_TASK))
            target = min(target, sized)
    spark.conf.set(key, str(target))
    try:
        yield
    finally:
        spark.conf.set(key, prior)


def _group_rows(pdfs):
    """Concatenate one group's Arrow chunks into a single pandas frame,
    skipping the ``pd.concat`` copy in the (dominant) single-chunk case —
    measured ~60 µs per group, and the stateful faces pay it once per
    group per micro-batch (guide §4.2: the per-group Python constant IS
    the scale term at real group cardinality)."""
    import pandas as pd

    chunks = list(pdfs)
    if not chunks:
        return pd.DataFrame()
    if len(chunks) == 1:
        return chunks[0]
    return pd.concat(chunks)


def _ts_event_order(rows):
    """Exact (ts, event_id) sort permutation via ``np.lexsort`` — the
    composite key is globally unique (event_id is), so this is the
    identical permutation ``rows.sort_values(["ts", "event_id"])``
    produces, at ~7 µs per group instead of ~400 µs (measured on
    10-row groups; the faces run it once per group per micro-batch)."""
    import numpy as np

    return np.lexsort((rows["event_id"].values, rows["ts"].values))


def _events_rows(sf_dir: str) -> int | None:
    """Exact replay-source row count from the events parquet footer."""
    try:
        from gordo_components_spark.caches import _parquet_rows

        return _parquet_rows(sf_dir, "events")
    except Exception:
        return None


def _replay_cache(spark: SparkSession, sf_dir: str, name: str, table: str, build):
    """Fingerprinted, atomically-installed replay cache — the discipline
    now lives in ``caches.materialized_cache`` (review r7: the scan legs
    in operators/providers.py shared the same stale-fixture hazard, so
    the one definition moved to the shared module; this wrapper keeps
    the streaming scratch root)."""
    from gordo_components_spark.caches import materialized_cache

    return materialized_cache(sf_dir, "/tmp/gordo_spark_stream", name, table, build)


def _replay_dir(spark: SparkSession, sf_dir: str, n_files: int = 3) -> str:
    """Materialize events as an n-file parquet directory (micro-batch
    replay source, FIXTURES B5).  Timestamps land as µs TimestampType so
    the streaming source needs no ns workaround."""

    def build(tmp: str) -> None:
        (
            load_table(spark, sf_dir, "events")
            .select("event_id", "ts", "user_id", "event_type", "value")
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(tmp)
        )

    return _replay_cache(spark, sf_dir, "events_replay", "events", build)


def _run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    latest_by: tuple[tuple[str, ...], str] | None = None,
    est_rows: int | None = None,
    python_stateful: bool = False,
) -> DataFrame:
    """Execute an availableNow streaming query into a memory sink and
    return the MATERIALIZED result (eager localCheckpoint), then drop
    the sink table — uuid-named memory sinks otherwise accrete full
    result sets in driver memory for the session lifetime.  Both the
    checkpoint dir AND the temp view are released in the finally so a
    raising query can't leak either (the uuid leaves don't match the
    PID sweeper's prefixes).  ``latest_by=((keys...), order_col)``
    post-filters UPDATE-mode emissions to each key's final row — the
    stateful faces' per-key summary contract (review finding: the
    CUSUM/Hampel faces each hand-rolled this tail, and their
    dropTempView sat outside the finally)."""
    import shutil

    spark = stream_df.sparkSession
    chk = f"/tmp/gordo_spark_stream/chk/{query_name}-{uuid.uuid4().hex}"
    try:
        with _stream_shuffle_partitions(
            spark, est_rows=est_rows, python_stateful=python_stateful
        ):
            q = (
                stream_df.writeStream.format("memory")
                .queryName(query_name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .option("checkpointLocation", chk)
                .start()
            )
            q.awaitTermination()
        out = spark.table(query_name).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(chk, ignore_errors=True)  # run-scoped checkpoint
        try:
            spark.catalog.dropTempView(query_name)
        except Exception:
            pass
    if latest_by is not None:
        keys, order_col = latest_by
        w = f"PARTITION BY {', '.join(keys)} ORDER BY {order_col} DESC"
        out = (
            out.withColumn("rn", F.expr(f"ROW_NUMBER() OVER ({w})"))
            .where("rn = 1")
            .drop("rn")
        )
    return out


def run_streaming_tumbling_agg(
    spark: SparkSession,
    sf_dir: str,
    duration: str = "10 minutes",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """O33/O36: event-time tumbling aggregation with a late-data watermark,
    executed as a genuine streaming query over the replayed file source.

    With ``max_files_per_trigger=1`` the three replay files (each a random
    slice of the whole month) arrive as separate micro-batches: batch 1
    advances the watermark to ~month-end, so most rows of batches 2–3 are
    LATE and get dropped — the O36 semantic, observable (see
    tests/test_streaming.py::test_watermark_drops_late_batches)."""
    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    reader = spark.readStream.schema(_RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", duration).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 9).alias("avg_value"))
        .select("event_type", F.col("w.start").alias("window_start"), "n", "avg_value")
    )
    name = f"stream_agg_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(agg, name, est_rows=_events_rows(sf_dir))


def run_streaming_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 restated: the reference's ``POST /anomaly/prediction`` serving
    loop as micro-batch scoring — ``readStream → foreachBatch(score)``.

    Models train once in batch (the builder path), broadcast via their
    blob frame; each micro-batch joins the stream slice to its machine's
    model and emits the anomaly frame.  The scoring expressions are the
    SAME code as batch (``ml/islands.py::score_models``) — that reuse is
    the point of building scoring as column algebra."""
    import shutil

    from gordo_components_spark.ml.islands import score_models, trained_models

    prepare(spark)
    models = trained_models(spark, sf_dir).where("status = 'ok'").cache()
    models.count()  # materialize once; broadcast into every micro-batch

    src = _replay_dir(spark, sf_dir)
    stream = spark.readStream.schema(_RAW_SCHEMA).parquet(src)
    # deploy-shaped sink: each micro-batch APPENDS its scored frame to a
    # parquet directory executor-side (the O7 sink), never collecting to
    # the driver — the demonstrated pattern is the deployable one.
    # Deterministic per-SF-per-PROCESS dirs: the sf_tag keeps reruns in
    # one process from accreting /tmp litter (the leaf is cleared up
    # front — the checkpoint must go with the sink or a rerun would
    # replay nothing), while the PID token keeps two concurrent sessions
    # on the same SF (e.g. pytest and bench.py) from rmtree'ing each
    # other's in-flight sink mid-query.  Stale siblings from dead
    # processes are swept instead of the live path.
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    for base in ("/tmp/gordo_spark_stream/sink", "/tmp/gordo_spark_stream/chk"):
        try:
            for leaf in os.listdir(base):
                if leaf.startswith(f"score-{sf_tag}-p"):
                    pid = leaf.rsplit("-p", 1)[-1]
                    if pid.isdigit() and not _pid_alive(int(pid)):
                        shutil.rmtree(os.path.join(base, leaf), ignore_errors=True)
        except OSError:
            pass
    leaf = f"score-{sf_tag}-p{os.getpid()}"
    sink_dir = f"/tmp/gordo_spark_stream/sink/{leaf}"
    chk_dir = f"/tmp/gordo_spark_stream/chk/{leaf}"
    for d in (sink_dir, chk_dir):
        shutil.rmtree(d, ignore_errors=True)

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as FF

        # the per-batch window aggregate is only correct when availableNow
        # delivers the replay as ONE batch (no maxFilesPerTrigger set): a
        # window spanning two batches would emit conflicting partial
        # feature rows.  Fail loudly instead of silently mis-scoring.
        if batch_id > 0:
            raise RuntimeError(
                "run_streaming_scoring requires single-batch delivery; "
                f"got micro-batch {batch_id} — windowed features would be partial"
            )
        feats = (
            batch_df.groupBy("user_id", FF.window("ts", "60 minutes").alias("w"))
            .agg(
                FF.round(FF.avg("value"), 9).alias("value__avg"),
                FF.max("value").alias("value__max"),
                FF.min("value").alias("value__min"),
                FF.count("value").cast("double").alias("value__count"),
            )
            .select("user_id", FF.col("w.start").alias("bucket"),
                    "value__avg", "value__max", "value__min", "value__count")
        )
        score_models(feats, models).write.mode("append").parquet(sink_dir)

    # seed the sink with a 0-row frame carrying the score schema: a replay
    # source that yields zero micro-batches otherwise never creates the
    # directory and the read below would raise PATH_NOT_FOUND.  Seed from
    # the static SCORE_SCHEMA — scoring an empty frame would collect and
    # broadcast every model blob just to materialize a schema.
    from gordo_components_spark.ml.islands import SCORE_SCHEMA

    spark.createDataFrame([], SCORE_SCHEMA).write.mode("append").parquet(sink_dir)

    with _stream_shuffle_partitions(spark, est_rows=_events_rows(sf_dir)):
        q = (
            stream.writeStream.foreachBatch(score_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", chk_dir)
            .start()
        )
        q.awaitTermination()
    models.unpersist()  # sink is durable parquet; the cache has served its batches
    return spark.read.parquet(sink_dir)


def run_streaming_stateful_ewma(
    spark: SparkSession, sf_dir: str, alpha: float = 0.2
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (the
    Structured Streaming escape hatch for per-key state Spark's built-ins
    can't express): a per-machine EWMA + running count that SURVIVES
    across micro-batches (state store).  ``maxFilesPerTrigger=1`` forces
    3 micro-batches over the replay files, so state carry is actually
    exercised — each machine's final row aggregates all three.

    State is (ewma, n, total); n/total are order-independent and testable
    against batch; the EWMA is the serving-side smoothing (O25) face."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            ewma, n, total = state.get
        else:
            ewma, n, total = None, 0, 0.0
        # concatenate ALL Arrow chunks before sorting: a per-chunk sort
        # only orders within one ~10k-row chunk, so a key spilling over
        # the Arrow batch size would fold the EWMA out of time order
        # while LOOKING sorted.  (Cross-BATCH order still follows file
        # arrival, as in any real stream — the EWMA contract is
        # arrival-order within the watermark, exact time-order within a
        # batch.)  r15: the full-frame ``sort_values("ts")`` copy is
        # replaced by the IDENTICAL argsort permutation (pandas nargsort
        # on a no-null datetime column is values.argsort(kind=
        # "quicksort")) applied to just the value column — same float64
        # fold order, ~400 µs less per group per batch.
        rows = _group_rows(pdfs)
        if len(rows):
            order = rows["ts"].values.argsort(kind="quicksort")
            for v in rows["value"].values[order]:
                ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
                n += 1
                total += v
        state.update((float(ewma) if ewma is not None else 0.0, int(n), float(total)))
        yield pd.DataFrame(
            [{"user_id": key[0], "ewma": ewma, "n": n, "total": total}]
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, ewma double, n bigint, total double",
        stateStructType="ewma double, n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    import shutil

    name = f"stream_ewma_{uuid.uuid4().hex[:8]}"
    chk = f"/tmp/gordo_spark_stream/chk/{name}"
    with _stream_shuffle_partitions(
        spark, est_rows=_events_rows(sf_dir), python_stateful=True
    ):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", chk)
            .start()
        )
        q.awaitTermination()
    shutil.rmtree(chk, ignore_errors=True)  # memory sink: checkpoint is run-scoped
    # update-mode memory sink holds one row per (key, batch); the final
    # state per machine is the last emitted row
    full = spark.table(name)
    w = "PARTITION BY user_id ORDER BY n DESC"
    return (
        full.withColumn("rn", F.expr(f"ROW_NUMBER() OVER ({w})"))
        .where("rn = 1")
        .drop("rn")
    )


def run_streaming_watermark_dedup(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """O37 streaming dedup keyed on event_id within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — state is bounded by the watermark,
    which is what makes this viable on an unbounded 100 TB/day stream)."""
    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    stream = spark.readStream.schema(_RAW_SCHEMA).parquet(src)
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "ts", "event_type", "value")
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(deduped, name, est_rows=_events_rows(sf_dir))


def run_streaming_stream_join(
    spark: SparkSession, sf_dir: str, horizon: str = "30 minutes"
) -> DataFrame:
    """Stream-stream interval join (SURVEY §2.9 breadth): purchases
    joined to the same machine's clicks at most ``horizon`` earlier —
    the attribution-window shape.  Both sides are watermarked so the
    join's state store evicts rows older than the horizon (what makes a
    stream-stream join viable on an unbounded feed: state is bounded by
    watermark + interval, not by stream length).

    availableNow replays the whole fixture in one batch, so no row is
    late and the result equals the equivalent batch interval join —
    asserted in tests/test_streaming.py::test_stream_stream_join_batch_parity."""
    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    clicks = (
        spark.readStream.schema(_RAW_SCHEMA)
        .parquet(src)
        .where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        spark.readStream.schema(_RAW_SCHEMA)
        .parquet(src)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id", "p_ts", "c_ts"
    )
    name = f"stream_join_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(joined, name, est_rows=_events_rows(sf_dir))


def run_streaming_enrich_dim(
    spark: SparkSession, sf_dir: str, duration: str = "1 day"
) -> DataFrame:
    """Stream-static enrichment (SURVEY §2.9 breadth): the event stream
    joined to the slowly-changing customer dimension, then windowed per
    market segment.  The static side is re-planned per micro-batch (so a
    dim refresh between batches is picked up) and broadcast — the
    canonical shape for enriching an unbounded 100 TB/day feed with a
    dimension that fits an executor: NO stream state is created by the
    join at all; only the downstream window agg keeps state, bounded by
    its watermark.

    availableNow replays the fixture in one batch, so the result equals
    the equivalent batch join+window — asserted in
    tests/test_streaming.py::test_enrich_dim_batch_parity."""
    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    stream = spark.readStream.schema(_RAW_SCHEMA).parquet(src)
    # no FORCED broadcast: the customer dim GROWS with the scale factor
    # (r7 mirror rule — explicit hints only for fixed-cardinality sides).
    # The static side is re-planned per micro-batch, and the planner
    # broadcasts it by size estimate at bench SF; a 100 TB deployment
    # whose dim outgrows an executor degrades to a shuffle join instead
    # of OOMing — either way the join stays stateless.
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = (
        stream.withWatermark("ts", "1 hour")
        .join(dim, "user_id")  # stream-static: stateless, broadcast
        .groupBy("c_mktsegment", F.window("ts", duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE)").alias("total_value"),
        )
        .select("c_mktsegment", F.col("w.start").alias("window_start"), "n", "total_value")
    )
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(enriched, name, est_rows=_events_rows(sf_dir))


def run_streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming face of the incremental-dedup nightly cycle
    (``extensions_corpus.pipe_dedup_incremental`` is the batch face):
    crawl-batch documents arrive as a replayed file stream; duplicates
    WITHIN the stream are dropped by ``dropDuplicatesWithinWatermark``
    on the content digest (state bounded by the crawl-time watermark —
    viable on an unbounded feed), and each micro-batch anti-joins the
    persisted historical digest index before appending survivors to the
    sink.  The history probe is stream-static: re-planned per batch, no
    stream state, so index compactions land between batches.

    Batch parity (the surviving digest SET equals the batch face's —
    keep_id depends on arrival order, so the set is the contract) is
    asserted in tests/test_streaming.py."""
    import shutil

    from gordo_components_spark.operators.extensions_corpus import build_dedup_index

    prepare(spark)
    root = build_dedup_index(spark, sf_dir)
    sf_tag = os.path.basename(sf_dir.rstrip("/"))

    # replay source: the SHARED crawl-batch fixture (_delta_batch — one
    # definition with the batch faces, so parity can't silently drift)
    # as a 3-file parquet dir with a synthetic crawl timestamp for the
    # watermark, installed through the fingerprinted atomic cache
    from gordo_components_spark.operators.extensions_corpus import _delta_batch

    def build(tmp: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        batch = _delta_batch(docs).select("doc_id", "text_hash", "source").withColumn(
            "crawl_ts",
            F.expr(
                "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, doc_id % 86400)"
            ),
        )
        batch.repartition(3).write.mode("overwrite").parquet(tmp)

    src = _replay_cache(spark, sf_dir, "docs_delta_replay", "documents", build)

    schema = "doc_id bigint, text_hash string, source string, crawl_ts timestamp"
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream.withWatermark("crawl_ts", "1 hour").dropDuplicatesWithinWatermark(
        ["text_hash"]
    )

    for base in ("/tmp/gordo_spark_stream/sink", "/tmp/gordo_spark_stream/chk"):
        try:
            for leaf in os.listdir(base):
                if leaf.startswith(f"incdedup-{sf_tag}-p"):
                    pid = leaf.rsplit("-p", 1)[-1]
                    if pid.isdigit() and not _pid_alive(int(pid)):
                        shutil.rmtree(os.path.join(base, leaf), ignore_errors=True)
        except OSError:
            pass
    leaf = f"incdedup-{sf_tag}-p{os.getpid()}"
    sink_dir = f"/tmp/gordo_spark_stream/sink/{leaf}"
    chk_dir = f"/tmp/gordo_spark_stream/chk/{leaf}"
    for d in (sink_dir, chk_dir):
        shutil.rmtree(d, ignore_errors=True)

    hist_path = os.path.join(root, "hist")

    def probe_history(batch_df: DataFrame, batch_id: int) -> None:
        # LOUD single-batch contract (advisory r5): the stream/batch
        # digest-set parity relies on availableNow delivering all DATA
        # in one micro-batch — crawl_ts spans 24h but the watermark is
        # 1h, so if data delivery ever splits (e.g. a maxFilesPerTrigger
        # conf), duplicates landing in batches >1h apart would BOTH
        # survive dropDuplicatesWithinWatermark and silently break
        # parity.  The stateful operator legitimately schedules a
        # trailing NO-DATA batch to advance the watermark and evict
        # state — only a late batch CARRYING ROWS violates the contract.
        if batch_id > 0:
            if batch_df.isEmpty():
                return  # watermark-advance batch: nothing to append
            raise RuntimeError(
                "streaming incremental dedup expects all data in a single "
                f"availableNow micro-batch (batch_id={batch_id} carried rows); "
                "multi-batch delivery breaks the 1h-watermark dedup parity "
                "contract"
            )
        hist = batch_df.sparkSession.read.parquet(hist_path).select("text_hash")
        batch_df.join(hist.hint("SHUFFLE_HASH"), "text_hash", "left_anti").write.mode(
            "append"
        ).parquet(sink_dir)

    spark.createDataFrame([], schema).write.mode("append").parquet(sink_dir)
    from gordo_components_spark.caches import _parquet_rows

    with _stream_shuffle_partitions(
        spark, est_rows=_parquet_rows(sf_dir, "documents")
    ):
        q = (
            deduped.writeStream.foreachBatch(probe_history)
            .trigger(availableNow=True)
            .option("checkpointLocation", chk_dir)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(sink_dir)


def run_streaming_session_agg(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """O35 as a GENUINE streaming query: ``session_window`` under an
    event-time watermark — the one windowing mode whose window bounds are
    data-dependent, so the state store must merge adjacent windows as
    rows arrive and can only finalize a session once the watermark
    passes its close (start/end cannot be known at assignment time, the
    way tumbling/sliding bounds are).  State per machine is bounded by
    the watermark horizon — what makes sessionization viable on an
    unbounded feed.

    availableNow replays the fixture, then a final no-data batch
    advances the watermark to (max event time − delay): sessions closing
    before that horizon are emitted (append mode), later ones are
    legitimately still in state — the parity test
    (tests/test_streaming.py::test_session_window_stream_batch_parity)
    asserts emitted ⊆ batch sessions with bit-equal aggregates AND that
    every watermark-finalized batch session was emitted."""
    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    stream = spark.readStream.schema(_RAW_SCHEMA).parquet(src)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE)").alias(
                "session_value"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(agg, name, est_rows=_events_rows(sf_dir))


def _v100(v: float) -> int:
    """Integer-cents scaling that EXACTLY mirrors Spark SQL's
    ``CAST(round(value * 100) AS BIGINT)`` on doubles: Spark rounds the
    double's SHORTEST decimal repr (BigDecimal.valueOf ⇒ Double.toString)
    with HALF_UP — Python's builtin ``round`` is half-EVEN and would
    diverge from the batch face on exact half-ties (r8 review).
    ``repr(float)`` is the same shortest repr, so Decimal(repr)·HALF_UP
    is bit-identical."""
    import decimal

    return int(
        decimal.Decimal(repr(v * 100)).to_integral_value(
            rounding=decimal.ROUND_HALF_UP
        )
    )


def run_streaming_cusum(
    spark: SparkSession, sf_dir: str, single_batch: bool = False
) -> DataFrame:
    """Streaming CUSUM change-point detector via ``applyInPandasWithState``
    — the serving-side face of ``window_cusum_alerts``: a per-(machine,
    tag) accumulated-excess statistic that SURVIVES across micro-batches
    (state store), alarming when drift above a trained baseline mean
    crosses the threshold.  The baseline is fitted from the train window
    (the drift family's ``_DRIFT_SPLIT_TS``) of the static table — the
    trained-detector + live-stream split a real deployment has — and
    travels as a broadcast variable (machines × tags: group-cardinality
    bounded, shipped once per executor — the bounded-collect contract).

    Semantics mirror the stateful-EWMA face: exact (ts, event_id) order
    within a micro-batch, arrival order across batches (any real
    stream's contract).  ``single_batch=True`` delivers the whole replay
    as one batch, making the run byte-for-byte reproducible against a
    sequential reference — the parity path tests/test_streaming.py
    drives.  State is integer-exact: the Page recurrence runs on
    s = max(0, s + bn·(v100 − k) − bs1) with bigint state (exact while
    |s| < 2⁶³; a 100 TB deployment would widen the state field to a
    string-encoded int, same algebra)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from gordo_components_spark.operators.model_sql import _DRIFT_SPLIT_TS
    from gordo_components_spark.operators.windows import _CUSUM_H100, _CUSUM_K100
    from gordo_components_spark.sources.tables import load_events_in_range

    prepare(spark)
    # Train-window scan via load_events_in_range (round-9 advisory): a
    # literal compare on the DERIVED µs ts cannot reach the parquet scan
    # on the ≤4.0 raw-long branch — the range loader filters the raw
    # column first, so the baseline fold prunes row groups at the source.
    # The bound is the drift family's shared _DRIFT_SPLIT_TS, so the
    # streaming baseline and the batch drift faces cannot drift apart.
    base_rows = (
        load_events_in_range(spark, sf_dir, to_ts=_DRIFT_SPLIT_TS)
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("bn"),
            F.expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)").alias(
                "bs1"
            ),
        )
        .collect()
    )
    # Baseline travels as a BROADCAST VARIABLE, not a closure capture:
    # the dict is bounded by group cardinality (machines × tags — the
    # model-table size, NOT the corpus; a 10⁴-machine × 10²-tag fleet is
    # ~10⁶ entries ≈ tens of MB), and broadcasting ships it once per
    # executor instead of once per task serialization.  At a fleet where
    # even that bound bites, the baseline would become a state-store
    # initial-state load (statefulProcessor initialState) — same algebra.
    baseline_bc = spark.sparkContext.broadcast(
        {(r["user_id"], r["event_type"]): (r["bn"], r["bs1"]) for r in base_rows}
    )
    src = _replay_dir(spark, sf_dir)
    reader = spark.readStream.schema(_RAW_SCHEMA)
    if not single_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(src)

    def update(key, pdfs, state: GroupState):
        bn, bs1 = baseline_bc.value.get((key[0], key[1]), (0, 0))
        if state.exists:
            s, n_seen, n_alerts = state.get
        else:
            s, n_seen, n_alerts = 0, 0, 0
        rows = _group_rows(pdfs)
        if len(rows) and bn:
            # identical fold order via the lexsort permutation (unique
            # composite key) — no full-frame sorted copy per group
            vals = rows["value"].values[_ts_event_order(rows)]
            thr = bn * _CUSUM_H100
            for v in vals:
                d = bn * (_v100(v) - _CUSUM_K100) - bs1
                s = max(0, s + d)
                n_seen += 1
                if s > thr:
                    n_alerts += 1
        elif len(rows):
            n_seen += len(rows)  # cold key: no baseline, count only
        state.update((int(s), int(n_seen), int(n_alerts)))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "event_type": key[1],
                    "cusum": (s / (bn * 100.0)) if bn else None,
                    "n_seen": n_seen,
                    "n_alerts": n_alerts,
                }
            ]
        )

    out = stream.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, event_type string, cusum double, "
            "n_seen bigint, n_alerts bigint"
        ),
        stateStructType="s bigint, n_seen bigint, n_alerts bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stream_cusum_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(
        out,
        name,
        output_mode="update",
        latest_by=(("user_id", "event_type"), "n_seen"),
        est_rows=_events_rows(sf_dir),
        python_stateful=True,
    )


def _med2(sorted_win: list[int]) -> int:
    """Doubled median of a sorted int window — ALWAYS an exact int
    (selection for odd counts, midpoint sum for even), matching
    2 x percentile(..., 0.5) on the batch face; property-ringed in
    tests/test_streaming.py."""
    m = len(sorted_win)
    if m % 2:
        return 2 * sorted_win[m // 2]
    return sorted_win[m // 2 - 1] + sorted_win[m // 2]


def run_streaming_hampel(
    spark: SparkSession, sf_dir: str, single_batch: bool = False
) -> DataFrame:
    """Streaming TRAILING-Hampel despiker via ``applyInPandasWithState``
    — the serving-side sibling of ``window_hampel_outlier``: per machine,
    each reading is tested against the median of its trailing 21-sample
    window with a MAD-robust 3σ fence, state (the last 20 readings and
    their deviations) carried across micro-batches.  Where the batch
    face looks ±10 samples around each point (retrospective cleaning),
    the stream can only look BACK — the standard live-despiking variant.

    Integer-exact: windows hold 2-dp-exact v100 bigints; medians are
    tracked ×2 (med200 = w[k]·2 or w[k−1]+w[k] — always an int), so
    dev200 = |2·v100 − med200| and mad400 reuse the batch face's pure
    bigint fence 10000·dev200 > 22239·mad400 with IDENTICAL constants.
    Flags fire only once the trailing window is full (21 samples), so a
    cold key warms up silently.  State is two ≤20-element bigint arrays
    per machine — bounded regardless of stream length."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    reader = spark.readStream.schema(_RAW_SCHEMA)
    if not single_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(src)

    def update(key, pdfs, state: GroupState):
        if state.exists:
            hv, hd, n_seen, n_flagged = state.get
            hv, hd = list(hv), list(hd)
        else:
            hv, hd, n_seen, n_flagged = [], [], 0, 0
        last_med = None
        last_dev = None
        rows = _group_rows(pdfs)
        if len(rows):
            for v in rows["value"].values[_ts_event_order(rows)]:
                v100 = _v100(v)
                med200 = _med2(sorted(hv + [v100]))
                dev200 = abs(2 * v100 - med200)
                mad400 = _med2(sorted(hd + [dev200]))
                if len(hv) >= 20 and 10000 * dev200 > 22239 * mad400:
                    n_flagged += 1
                n_seen += 1
                hv.append(v100)
                hd.append(dev200)
                del hv[:-20], hd[:-20]
                last_med = med200 / 200.0
                last_dev = dev200 / 200.0
        state.update(
            ([int(x) for x in hv], [int(x) for x in hd], int(n_seen), int(n_flagged))
        )
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_seen": n_seen,
                    "n_flagged": n_flagged,
                    "last_med": last_med,
                    "last_dev": last_dev,
                }
            ]
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, n_seen bigint, n_flagged bigint, "
            "last_med double, last_dev double"
        ),
        stateStructType=(
            "hv array<bigint>, hd array<bigint>, n_seen bigint, n_flagged bigint"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stream_hampel_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(
        out, name, output_mode="update", latest_by=(("user_id",), "n_seen"),
        est_rows=_events_rows(sf_dir), python_stateful=True,
    )


def run_streaming_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming M4 downsampling: the serving face of
    ``agg_m4_downsample`` — first/last/min/max reading per (machine,
    tag, 6 h event-time window) maintained as a GENUINE watermarked
    streaming aggregation (single-batch replay so no window is dropped
    late; first/last ride ``min_by``/``max_by`` over the unique
    (ts, event_id) struct order, exactly the batch face's total
    order).  Batch↔stream parity is asserted in
    tests/test_streaming.py."""
    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    stream = spark.readStream.schema(_RAW_SCHEMA).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", "event_type", F.window("ts", "6 hours").alias("w"))
        .agg(
            F.expr("min_by(value, struct(ts, event_id))").alias("v_first"),
            F.expr("max_by(value, struct(ts, event_id))").alias("v_last"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .select(
            "user_id",
            "event_type",
            F.col("w.start").alias("bucket"),
            "v_first",
            "v_last",
            "v_min",
            "v_max",
            "n",
        )
    )
    name = f"stream_m4_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(agg, name, est_rows=_events_rows(sf_dir))


def run_streaming_twa(
    spark: SparkSession, sf_dir: str, single_batch: bool = False
) -> DataFrame:
    """Streaming time-weighted average via ``applyInPandasWithState`` —
    the serving face of ``agg_time_weighted_avg``: per (machine, tag),
    the trapezoid integral accumulates ACROSS micro-batches (state =
    last reading + exact integer numerator/span), emitting each key's
    running TWA — what a live dashboard's "average so far" must mean
    under irregular sampling.

    Integer-exact state: (last_us, last_v100, num, span_us) — each
    segment adds (v100_prev + v100)·Δµs to num; at the replay's span
    num stays ≤ ~1e17 < 2⁶³ (exact), and the emitted num/span_us ints
    make the batch↔stream parity check in tests/test_streaming.py
    integer-exact (the float twa is derived, not compared).  Order
    contract mirrors the CUSUM/Hampel faces: exact (ts, event_id)
    within a batch, arrival order across batches."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    reader = spark.readStream.schema(_RAW_SCHEMA)
    if not single_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(src)

    def update(key, pdfs, state: GroupState):
        import numpy as np

        if state.exists:
            last_us, last_v, num, span = state.get
        else:
            last_us, last_v, num, span = None, None, 0, 0
        rows = _group_rows(pdfs)
        if len(rows):
            order = _ts_event_order(rows)
            us_arr = (
                rows["ts"].values[order].astype("datetime64[us]").astype("int64")
            )
            # per-element _v100 (the repr-exact half-up contract) over the
            # identically-ordered values; the trapezoid fold itself
            # vectorizes EXACTLY — every term (v_prev + v)·Δµs is the same
            # int64 product the sequential loop added (integer sums are
            # order-free; the docstring's |num| < 2⁶³ invariant bounds the
            # partials the same way it bounded the running total)
            v100 = np.fromiter(
                (_v100(v) for v in rows["value"].values[order]),
                dtype="int64",
                count=len(rows),
            )
            if last_us is not None:
                us_ext = np.concatenate(([last_us], us_arr))
                v_ext = np.concatenate(([last_v], v100))
            else:
                us_ext, v_ext = us_arr, v100
            if len(us_ext) >= 2:
                dus = np.diff(us_ext)
                num += int(np.sum((v_ext[:-1] + v_ext[1:]) * dus))
                span += int(us_ext[-1] - us_ext[0])
            last_us, last_v = int(us_arr[-1]), int(v100[-1])
        state.update((last_us, last_v, int(num), int(span)))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "event_type": key[1],
                    "num": num,
                    "span_us": span,
                    "twa": (num / (200.0 * span)) if span else None,
                }
            ]
        )

    out = stream.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, event_type string, num bigint, span_us bigint,"
            " twa double"
        ),
        stateStructType=(
            "last_us bigint, last_v bigint, num bigint, span_us bigint"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stream_twa_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(
        out, name, output_mode="update",
        latest_by=(("user_id", "event_type"), "span_us"),
        est_rows=_events_rows(sf_dir), python_stateful=True,
    )


def run_streaming_benford(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """Streaming Benford first-digit screen — the live data-quality face
    of ``agg_benford_screen``: per-tag first-significant-digit counts
    maintained as a genuine Structured Streaming aggregation (update
    mode; counts are ORDER-INDEPENDENT, so the multi-batch final state
    equals the batch face EXACTLY — the strongest batch↔stream parity
    in the repo, asserted in tests/test_streaming.py), with the χ²
    conformance verdict recomputed per emission from the same
    compile-time expression chain the batch face uses."""
    from gordo_components_spark.operators.relational_extra import (
        _BENFORD_CHI2,
        _BENFORD_OBS_PAIRS,
    )

    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    reader = spark.readStream.schema(_RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src)
    v = stream.where(F.expr("round(value * 100) >= 1")).select(
        "event_type",
        F.expr(
            "substr(CAST(CAST(round(value * 100) AS BIGINT) AS STRING), 1, 1)"
        ).alias("d"),
    )
    agg = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.expr(e).alias(a) for a, e in _BENFORD_OBS_PAIRS],
    )
    out = agg.select(
        "event_type",
        "n",
        "o1",
        "o9",
        F.expr(_BENFORD_CHI2).alias("chi2"),
        F.expr(f"(({_BENFORD_CHI2}) < 15.507)").alias("conforms"),
    )
    name = f"stream_benford_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(
        out, name, output_mode="update", latest_by=(("event_type",), "n"),
        est_rows=_events_rows(sf_dir),
    )


def run_streaming_bottomk_sample(
    spark: SparkSession, sf_dir: str, k: int = 10, single_batch: bool = False
) -> DataFrame:
    """Streaming uniform sampling via a per-key BOTTOM-K hash sketch in
    ``applyInPandasWithState`` — the mergeable alternative to reservoir
    sampling: state is each tag's k smallest (md5(id), id) pairs, each
    micro-batch folds its rows in and re-truncates to k, and because
    bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) the final
    state is INDEPENDENT of replay slicing and arrival order — the
    batch face ``stream_sample_bottomk`` is reproduced bit-exactly
    (tests/test_streaming.py asserts it).  State is k hex digests + k
    ids per key — fixed-size, the state-store contract at any corpus
    scale."""
    import hashlib

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    reader = spark.readStream.schema(_RAW_SCHEMA)
    if not single_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(src)

    def update(key, pdfs, state: GroupState):
        if state.exists:
            hs, ids, n_seen = state.get
            sketch = list(zip(hs, ids))
        else:
            sketch, n_seen = [], 0
        chunks = list(pdfs)
        rows = pd.concat(chunks) if chunks else pd.DataFrame()
        if len(rows):
            n_seen += len(rows)
            for eid in rows["event_id"]:
                sketch.append(
                    (hashlib.md5(str(int(eid)).encode()).hexdigest(), int(eid))
                )
            sketch = sorted(sketch)[:k]
        state.update(
            ([h for h, _ in sketch], [i for _, i in sketch], int(n_seen))
        )
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "rk": r + 1,
                    "event_id": i,
                    "hid": h,
                    "n_seen": n_seen,
                }
                for r, (h, i) in enumerate(sketch)
            ]
        )

    out = stream.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "event_type string, rk int, event_id bigint, hid string, "
            "n_seen bigint"
        ),
        stateStructType="hs array<string>, ids array<bigint>, n_seen bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stream_bottomk_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(
        out,
        name,
        output_mode="update",
        latest_by=(("event_type", "rk"), "n_seen"),
        est_rows=_events_rows(sf_dir),
    ).select("event_type", "rk", "event_id", "hid")


def run_streaming_manifest_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion into the transactional manifest table — the
    Delta-sink shape: ``readStream → foreachBatch(commit_append)`` with
    ``txn_id = batchId`` so a replayed micro-batch (checkpoint restart)
    re-commits as a NO-OP (exactly-once table contents, Delta's
    txnAppId/txnVersion mechanism; plans/manifest_table.py).  One
    manifest version per micro-batch; the final read unions the batch
    data dirs through the version pointer.

    Parity (tests/test_manifest_table.py): final table contents equal
    the batch read of the same fixture BIT-EXACTLY and the version count
    equals the micro-batch count — content is batching-invariant, which
    is the transactional-sink claim."""
    import shutil

    from gordo_components_spark.plans.manifest_table import ManifestTable

    prepare(spark)
    replay = _replay_dir(spark, sf_dir)
    run_id = uuid.uuid4().hex
    root = f"/tmp/gordo_spark_stream/manifest-sink-{run_id}"
    chk = f"/tmp/gordo_spark_stream/chk/manifest-sink-{run_id}"
    t = ManifestTable(root)
    stream = (
        spark.readStream.schema(_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    try:
        with _stream_shuffle_partitions(spark, est_rows=_events_rows(sf_dir)):
            q = (
                stream.writeStream.foreachBatch(
                    lambda bdf, bid: t.commit_append(bdf, txn_id=f"replay-{bid}")
                )
                .trigger(availableNow=True)
                .option("checkpointLocation", chk)
                .start()
            )
            q.awaitTermination()
        out = (
            t.read(spark)
            .withColumn("table_version", F.lit(t.current_version()).cast("int"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(chk, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
    return out


def run_streaming_countmin(
    spark: SparkSession, sf_dir: str, single_batch: bool = False
) -> DataFrame:
    """Genuine-streaming Count-Min sketch: every arriving event adds 1 to
    its key's cell in each of the 4 hash rows, maintained as a streaming
    groupBy((r, cell)).count() in COMPLETE mode — the sketch is LINEAR
    (cell-wise addition), so the final state is independent of
    micro-batch slicing and arrival order, and bit-equal to the batch
    sketch ``agg_countmin_estimate`` builds from per-key exact counts
    (tests/test_streaming.py asserts cell-wise parity).  State is the
    fixed 4x256 counter array — the state-store contract never grows
    with the corpus."""
    from gordo_components_spark.operators.relational_extra import _cm_cell, _CM_D

    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    reader = spark.readStream.schema(_RAW_SCHEMA)
    if not single_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(src)
    cell = _cm_cell("h", "instr", "r")
    cells = stream.withColumn(
        "h", F.expr("md5(event_type || ':' || CAST(user_id AS STRING))")
    ).select(
        F.explode(
            F.expr(
                "transform(sequence(0, %d), r -> struct(CAST(r AS INT) AS r, %s AS cell))"
                % (_CM_D - 1, cell)
            )
        ).alias("t")
    ).select("t.r", "t.cell")
    sketch = cells.groupBy("r", "cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    name = f"stream_cm_{uuid.uuid4().hex[:8]}"
    return _run_to_memory(
        sketch, name, output_mode="complete", est_rows=_events_rows(sf_dir)
    )


def run_streaming_heavy_hitters(
    spark: SparkSession, sf_dir: str, k: int = 8, single_batch: bool = False
) -> DataFrame:
    """Genuine-streaming Misra–Gries heavy hitters: per event_type, a
    fixed-size k-counter summary of user activity maintained in
    ``applyInPandasWithState`` across micro-batches — the streaming face
    of the two-pass batch miner (``agg_heavy_hitters``'s sketch pass).
    The MG invariant survives merging/slicing: any user whose true count
    exceeds N/k is guaranteed present in the final candidate set, and
    each kept counter understates the true count by at most the total
    decrement mass D (tests/test_streaming.py pins both bounds against
    exact batch counts).  State is ≤ k (user, count) pairs per tag —
    fixed-size at any corpus scale."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    prepare(spark)
    src = _replay_dir(spark, sf_dir)
    reader = spark.readStream.schema(_RAW_SCHEMA)
    if not single_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(src)

    def update(key, pdfs, state: GroupState):
        if state.exists:
            users, counts, n_seen, decr = state.get
            mg = dict(zip(users, counts))
        else:
            mg, n_seen, decr = {}, 0, 0
        chunks = list(pdfs)
        rows = pd.concat(chunks) if chunks else pd.DataFrame()
        if len(rows):
            n_seen += len(rows)
            for uid in rows["user_id"]:
                uid = int(uid)
                if uid in mg:
                    mg[uid] += 1
                elif len(mg) < k:
                    mg[uid] = 1
                else:
                    # decrement-all step: every counter drops by 1
                    decr += 1
                    mg = {u: c - 1 for u, c in mg.items() if c > 1}
        state.update(
            (list(mg.keys()), list(mg.values()), int(n_seen), int(decr))
        )
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "user_id": u,
                    "mg_count": c,
                    "n_seen": n_seen,
                    "n_decrements": decr,
                }
                for u, c in sorted(mg.items())
            ]
        )

    out = stream.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "event_type string, user_id bigint, mg_count bigint, "
            "n_seen bigint, n_decrements bigint"
        ),
        stateStructType=(
            "users array<bigint>, counts array<bigint>, "
            "n_seen bigint, decr bigint"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stream_mg_{uuid.uuid4().hex[:8]}"
    res = _run_to_memory(
        out, name, output_mode="update", est_rows=_events_rows(sf_dir)
    )
    # the FINAL sketch is exactly the last emission per tag (every yield
    # carries the full current sketch stamped with that batch's n_seen);
    # a per-(tag, user) latest filter would resurrect users evicted in
    # later batches, so filter to the max-n_seen emission per tag instead
    return (
        res.withColumn(
            "_mx", F.expr("max(n_seen) OVER (PARTITION BY event_type)")
        )
        .where(F.col("n_seen") == F.col("_mx"))
        .select("event_type", "user_id", "mg_count", "n_seen", "n_decrements")
    )
