"""Streaming corpus curation: the LLM-pipeline curation stages applied
to a document STREAM — the shape of a continuously-ingesting crawl.

The per-document stages (PII scrub, quality features, language ID,
normalization) are stateless projections, so they attach to a
streaming DataFrame unchanged — the same whole-stage-codegen
expressions as batch, evaluated per micro-batch. The only stateful
stage is exact dedup, which becomes `dropDuplicatesWithinWatermark` on
the normalized-text digest: per-key state is bounded by the watermark
(a re-crawled page dedups against state for the horizon, then ages
out), which is the correct semantic for an unbounded crawl — global
forever-dedup over an infinite stream would need unbounded state; run
the batch `neardup_lsh_between` pass against the accumulated corpus
for that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators import pii
from purpleair_data_logger_spark.operators import text as tx


def curate_stream(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    ts_col: str | None = None,
    dedup_within: str | None = None,
) -> DataFrame:
    """Attach the stateless curation stages to a document stream and
    (optionally) watermark-bounded exact dedup on normalized content.

    Output columns: id, ts (if given), clean_text (PII-scrubbed),
    n_tokens, predicted_lang, lang_score, normalized_md5.
    """
    pred, score = tx.language_vote(text_col)
    cols = [F.col(id_col)]
    if ts_col is not None:
        # Watermarks reject TIMESTAMP_NTZ; naive parquet micros arrive
        # as NTZ, so normalize event time to session-zoned TIMESTAMP.
        cols.append(F.col(ts_col).cast("timestamp").alias(ts_col))
    out = stream_df.select(
        *cols,
        pii.scrub_text(text_col).alias("clean_text"),
        tx.whitespace_token_count(text_col).alias("n_tokens"),
        pred.alias("predicted_lang"),
        score.alias("lang_score"),
        F.md5(tx.normalized_text(text_col)).alias("normalized_md5"),
    )
    if dedup_within is not None:
        if ts_col is None:
            raise ValueError("dedup_within requires ts_col for the watermark")
        out = out.withWatermark(ts_col, dedup_within).dropDuplicatesWithinWatermark(
            ["normalized_md5"]
        )
    return out


def run_curation_stream(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    dedup_within: str = "1 hour",
    max_files_per_trigger: int = 1,
):
    """File-source streaming curation job: parquet-in → curate →
    parquet-out, one micro-batch per input file by default (true
    cross-batch dedup state), availableNow termination."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    curated = curate_stream(
        stream, id_col, text_col, ts_col=ts_col, dedup_within=dedup_within
    )
    return (
        curated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
