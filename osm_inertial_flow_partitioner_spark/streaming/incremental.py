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
