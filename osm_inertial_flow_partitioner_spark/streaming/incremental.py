"""Incremental ingest via Structured Streaming.

The reference is pure batch; the graft's resume story is snapshot-based
(plans/checkpoint.py). This module adds the streaming twin for
*continuous* ingestion of new pages: the same extraction expressions run
over ``readStream``, late data bounded by a watermark, per-cell counts
maintained as a windowed streaming aggregate. The tile assignment itself
stays a periodic batch job (bisection is iterative/global); streaming
feeds it staged entities — the standard lambda split for iterative
algorithms over append-only data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import grid_cell
from ..sources.extract import GEO_PATTERN


def stream_pages_from_dir(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """File-source stream of page parquet drops (append-only Iceberg
    stand-in; on a cluster this is spark.readStream.format('iceberg'))."""
    return spark.readStream.schema(schema).parquet(path)


def streaming_entities(pages_stream: DataFrame, res: int = 6) -> DataFrame:
    """Same extraction expressions as the batch path (sources/extract.py)
    — declarative plan reuse is the point."""
    return (
        pages_stream.select(
            "url",
            "warc_ts",
            F.regexp_extract_all(F.col("text"), F.lit(GEO_PATTERN), 0).alias("ms"),
        )
        .filter(F.size("ms") > 0)
        .select("url", "warc_ts", F.posexplode("ms").alias("pos", "m"))
        .select(
            "url",
            "warc_ts",
            F.split(F.regexp_replace("m", "^geo:", ""), ",")[0]
            .cast("double")
            .alias("lat"),
            F.split(F.regexp_replace("m", "^geo:", ""), ",")[1]
            .cast("double")
            .alias("lon"),
        )
        .withColumn("cell", grid_cell(F.col("lat"), F.col("lon"), res))
    )


def windowed_cell_counts(
    entities_stream: DataFrame,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Per-cell windowed counts with late-data watermark — the streaming
    analogue of the per-cell aggregations (A2/A3)."""
    return (
        entities_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "cell")
        .agg(F.count("*").alias("n_entities"))
        .select("win.start", "win.end", "cell", "n_entities")
    )


def run_stream_to_staging(
    entities_stream: DataFrame, staging_dir: str, checkpoint_dir: str, once: bool = True
):
    """Append extracted entities to the staging table consumed by the
    periodic batch tiler."""
    writer = (
        entities_stream.writeStream.format("parquet")
        .option("path", staging_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Custom stateful operator: streaming sessionization
# (applyInPandasWithState) — the streaming twin of
# operators/sessionize.py::sessionize with identical gap semantics.
# ---------------------------------------------------------------------------

SESSION_OUT_SCHEMA = (
    "user_id long, session_id long, start_ts long, end_ts long, n_events long"
)
SESSION_STATE_SCHEMA = "start long, last long, sid long, n long"


def _make_session_fn(gap_sec: int, state_ttl_sec: int):
    import pandas as pd

    cols = ["user_id", "session_id", "start_ts", "end_ts", "n_events"]

    def fn(key, pdf_iter, state):
        user_id = int(key[0])
        out = []
        if state.hasTimedOut:
            start, last, sid, n = state.get
            if n > 0:
                # flush the open session, but KEEP the per-user session
                # counter in a sentinel state (start=-1) so the next
                # session continues the monotone numbering instead of
                # restarting at 0 (duplicate keys downstream). The
                # sentinel itself expires after state_ttl_sec of
                # inactivity — bounded state, numbering survives any
                # quiet gap shorter than the TTL.
                out.append((user_id, sid, start, last, n))
                ttl_ms = (last + gap_sec + state_ttl_sec) * 1000
                if ttl_ms <= state.getCurrentWatermarkMs():
                    # the TTL already elapsed by the time the timeout
                    # fired (user idle > TTL) — expire the counter now;
                    # a timeout timestamp below the watermark is invalid
                    state.remove()
                else:
                    state.update((-1, last, sid, 0))
                    state.setTimeoutTimestamp(ttl_ms)
            else:
                state.remove()
        else:
            ts: list[int] = []
            for pdf in pdf_iter:
                ts.extend(int(x) for x in pdf["ts_long"])
            ts.sort()
            if state.exists:
                start, last, sid, n = state.get
                if start == -1:  # sentinel: counter only, no open session
                    start = last = None
            else:
                start = last = None
                sid, n = -1, 0
            for t in ts:
                if last is None or t - last > gap_sec:
                    if last is not None:
                        out.append((user_id, sid, start, last, n))
                    sid += 1
                    start = t
                    n = 0
                n += 1
                last = t
            state.update((start, last, sid, n))
            # close the open session once event time passes last + gap
            state.setTimeoutTimestamp((last + gap_sec) * 1000)
        yield pd.DataFrame(out, columns=cols)

    return fn


def streaming_sessionize(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    state_ttl_minutes: int = 24 * 60,
) -> DataFrame:
    """Per-user session tracking as a CUSTOM STATEFUL streaming operator
    (applyInPandasWithState, event-time timeout): state carries the open
    session (start, last, index, count); a micro-batch's events extend
    or close it, CLOSED sessions are appended downstream, and the open
    session is flushed when the watermark passes last + gap. After a
    flush the per-user session counter survives in a sentinel state for
    ``state_ttl_minutes`` of event-time inactivity, so session_id stays
    monotone across timeouts (no duplicate (user_id, session_id) keys);
    only after the TTL does the numbering restart at 0.

    Parity scope: replaying a static table IN EVENT-TIME ORDER (e.g. a
    single availableNow batch, or time-ordered micro-batches) yields
    exactly the batch twin's sessions (asserted in tests). An
    out-of-order event that arrives in a LATER micro-batch with
    ts < state.last but above the watermark is absorbed into the open
    session (last moves back), which can differ from the batch global
    sort — the standard streaming trade-off; tighten the watermark to
    bound it."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = events_stream.withWatermark("ts", watermark).select(
        "user_id", F.col("ts").cast("timestamp").cast("long").alias("ts_long"),
        F.col("ts"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_minutes * 60, state_ttl_minutes * 60),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
