"""Streaming incremental near-dup dedup: every arriving micro-batch is
mined against the accumulated corpus's persisted LSH artifacts — the
continuous form of the daily-ingest question "is this crawl already in
the corpus?".

Shape: the base corpus's band index and shingle table are computed
ONCE at stream start (they are `dedup.lsh_banded` / shingle-set
output — in production, persisted bucketed artifacts maintained by the
batch pipeline); each micro-batch then runs
`dedup.neardup_against_index` inside ``foreachBatch``: new-side
signatures + cross-side band equi-join + exact-Jaccard verify, all
candidate-bounded. No streaming state is held — the artifacts ARE the
state, owned batch-side, so a restart resumes from the checkpoint with
nothing to rebuild. Matched pairs land in ``{out}/pairs`` (tagged with
batch_id); documents with no base near-dup land in ``{out}/fresh`` —
the stream of genuinely-new content a continuous curation pipeline
forwards downstream.

Within-stream duplicates (doc A and near-dup A' arriving in different
micro-batches, neither in the base corpus) are out of scope here by
design — that is watermark-bounded exact dedup
(`curation.curate_stream` dedup_within) or the periodic batch LSH
pass; an unbounded cross-batch near-dup index would be unbounded
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators.dedup import (
    lsh_banded,
    neardup_against_index,
    shingles,
)


def build_base_artifacts(
    base_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """(band index, shingle table) for a base corpus, materialized via
    localCheckpoint so the stream never recomputes them per trigger.
    Production equivalent: the bucketed parquet artifacts the batch
    pipeline maintains (tests/test_bucketed.py pins the zero-exchange
    join against the bucketed form)."""
    index = (
        lsh_banded(
            base_df, id_col, text_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            hash_family=hash_family,
        )
        .select(F.col(id_col).alias("base_doc_id"), "band_idx", "band_hash")
        .localCheckpoint()
    )
    sh = (
        base_df.select(
            F.col(id_col).alias("base_doc_id"),
            shingles(text_col, shingle_n).alias("_sh_b"),
        )
        .localCheckpoint()
    )
    return index, sh


def run_incremental_neardup_stream(
    spark,
    source_dir: str,
    base_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
    max_files_per_trigger: int = 1,
):
    """File-source streaming ingest dedup: parquet-in → per-batch
    `neardup_against_index` → pairs + fresh parquet-out, availableNow
    termination. Returns the streaming query handle."""
    index, base_sh = build_base_artifacts(
        base_df, id_col, text_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        hash_family=hash_family,
    )
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _mine_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()  # one signature pass, two sinks
        pairs = neardup_against_index(
            batch_df, index, base_sh, id_col, text_col,
            threshold=threshold, num_hashes=num_hashes, bands=bands,
            shingle_n=shingle_n, hash_family=hash_family,
        ).localCheckpoint()
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            f"{out_dir}/pairs"
        )
        fresh = batch_df.join(
            pairs.select("new_doc_id").distinct(),
            on=batch_df[id_col] == F.col("new_doc_id"),
            how="left_anti",
        )
        fresh.write.mode("append").parquet(f"{out_dir}/fresh")

    return (
        stream.writeStream.foreachBatch(_mine_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def build_prefix_artifacts(
    base_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold_pct: int = 80,
    shingle_n: int | None = 3,
):
    """The EXACT join's base artifacts (`dedup.build_prefix_index`),
    materialized via localCheckpoint so the stream never recomputes
    them per trigger — df table, prefix rows, posting rows, element
    sets, all under the base's frozen df order. Production equivalent:
    bucketed parquet maintained by the batch pipeline."""
    from purpleair_data_logger_spark.operators.dedup import (
        build_prefix_index,
    )

    dft, pref, full, sets = build_prefix_index(
        base_df, id_col, text_col,
        threshold_pct=threshold_pct, shingle_n=shingle_n,
    )
    return (
        dft.localCheckpoint(),
        pref.localCheckpoint(),
        full.localCheckpoint(),
        sets.localCheckpoint(),
    )


def run_incremental_prefix_stream(
    spark,
    source_dir: str,
    base_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_pct: int = 80,
    shingle_n: int | None = 3,
    max_files_per_trigger: int = 1,
):
    """The EXACT streaming ingest dedup — `run_incremental_neardup_
    stream` with provably-complete recall instead of LSH's
    probabilistic recall: per micro-batch,
    `dedup.prefix_filter_against_index` mines the batch against the
    frozen base artifacts (only the new side pays prefix computation);
    matched pairs land in ``{out}/pairs`` tagged with batch_id,
    unmatched documents in ``{out}/fresh``. No streaming state — the
    artifacts ARE the state, owned batch-side. Within-stream near-dups
    stay out of scope exactly as in the LSH form (an unbounded
    cross-batch index would be unbounded state)."""
    from purpleair_data_logger_spark.operators.dedup import (
        prefix_filter_against_index,
    )

    dft, pref, full, sets = build_prefix_artifacts(
        base_df, id_col, text_col,
        threshold_pct=threshold_pct, shingle_n=shingle_n,
    )
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _mine_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()  # one prefix pass, two sinks
        pairs = prefix_filter_against_index(
            batch_df, dft, pref, full, sets, id_col, text_col,
            threshold_pct=threshold_pct, shingle_n=shingle_n,
        ).localCheckpoint()
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{out_dir}/pairs")
        fresh = batch_df.join(
            pairs.select("new_doc_id").distinct(),
            on=batch_df[id_col] == F.col("new_doc_id"),
            how="left_anti",
        )
        fresh.write.mode("append").parquet(f"{out_dir}/fresh")

    return (
        stream.writeStream.foreachBatch(_mine_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
