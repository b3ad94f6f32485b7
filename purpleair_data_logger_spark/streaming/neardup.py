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
    PrefixIndex,
    _prefix_table,
    build_prefix_index,
    lsh_banded,
    neardup_against_index,
    prefix_filter_against_index,
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

    def mine(batch_df: DataFrame) -> DataFrame:
        return neardup_against_index(
            batch_df, index, base_sh, id_col, text_col,
            threshold=threshold, num_hashes=num_hashes, bands=bands,
            shingle_n=shingle_n, hash_family=hash_family,
        )

    return _run_ingest_dedup_stream(
        spark, source_dir, out_dir, checkpoint_dir, mine,
        id_col=id_col, max_files_per_trigger=max_files_per_trigger,
    )




def _run_ingest_dedup_stream(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    mine,
    *,
    id_col: str,
    max_files_per_trigger: int,
):
    """The shared ingest-dedup stream runner (code-review r10: the LSH
    and exact forms differ ONLY in the pairs-mining expression):
    parquet-in → per-batch ``mine(batch_df) -> (new_doc_id,
    base_doc_id, jaccard)`` → batch_id-tagged pairs sink + left-anti
    fresh sink, availableNow termination."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _mine_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()  # one mining pass, two sinks
        pairs = mine(batch_df).localCheckpoint()
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


def build_prefix_artifacts(
    base_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold_pct: int = 80,
    shingle_n: int | None = 3,
) -> PrefixIndex:
    """The EXACT join's base `PrefixIndex`, materialized via
    localCheckpoint so the stream never recomputes it per trigger —
    sets and df table checkpoint FIRST, the prefix table derives from
    the checkpointed pair (one base scan + one df aggregate total,
    not one per artifact — code-review r10). Production equivalent:
    bucketed parquet maintained by the batch pipeline."""
    raw = build_prefix_index(
        base_df, id_col, text_col,
        threshold_pct=threshold_pct, shingle_n=shingle_n,
    )
    sets = raw.sets.localCheckpoint()
    dft = raw.dft.localCheckpoint()
    prefix = _prefix_table(sets, dft, raw.threshold_pct).localCheckpoint()
    return PrefixIndex(
        dft, prefix, sets, raw.threshold_pct, raw.sep, raw.shingle_n
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
    frozen base `PrefixIndex` (only the new side pays prefix
    computation; tokenization/threshold come FROM the index, so they
    cannot mismatch). No streaming state — the artifacts ARE the
    state. Within-stream near-dups stay out of scope exactly as in
    the LSH form (an unbounded cross-batch index would be unbounded
    state)."""
    index = build_prefix_artifacts(
        base_df, id_col, text_col,
        threshold_pct=threshold_pct, shingle_n=shingle_n,
    )

    def mine(batch_df: DataFrame) -> DataFrame:
        return prefix_filter_against_index(
            batch_df, index, id_col, text_col
        )

    return _run_ingest_dedup_stream(
        spark, source_dir, out_dir, checkpoint_dir, mine,
        id_col=id_col, max_files_per_trigger=max_files_per_trigger,
    )
