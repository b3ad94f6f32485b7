"""Sequence packing: assign documents to fixed-token-budget training
sequences.

Pretraining consumes documents concatenated into fixed-length sample
sequences (e.g. 4096 tokens); the pipeline must decide, ahead of
tokenizer-side chopping, which sequence each document starts in and at
what offset. This operator computes that assignment deterministically
and distributed:

* each document lands in a shard by portable hash (``md5 % n_shards``)
  — the shard is the unit of parallelism AND the unit of ordering, so
  no global sort exists anywhere in the plan;
* within a shard, documents are ordered by (hash, id) — a stable,
  engine-portable shuffle of the corpus (hash order ≈ random order,
  which is exactly what training wants);
* a running-sum window over token counts yields each document's start
  offset in the shard's concatenation stream; ``start div budget`` is
  the sequence index the document starts in.

Documents longer than the budget simply span sequences (the usual
pretraining packing semantic — no document is dropped or split here;
the tokenizer consumer slices on sequence boundaries downstream).

Scale: one shuffle on the shard key, one per-shard sort, one window
cumsum — all whole-stage-codegen. Shard count bounds per-task sort
size: at 100 TB with n_shards = O(total_tokens / (budget × 10⁶)) each
task sorts a bounded slice; shards are hash-balanced so no skew. The
reference repo has no analog (SURVEY.md §2 beyond-reference surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators.dedup import md5_long


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    *,
    budget: int,
    n_shards: int = 256,
) -> DataFrame:
    """Assign (shard, start_offset, seq_in_shard) to every document.

    ``seq_in_shard`` is the 0-based index of the ``budget``-token
    sequence (within the shard's concatenation stream) in which the
    document STARTS; ``start_offset`` is its absolute token offset in
    that stream. (shard, seq_in_shard) is the globally-unique sequence
    key.
    """
    key = F.col(id_col)
    h = md5_long(key.cast("string"))
    sharded = df.select(
        key,
        F.col(token_count_col).cast("long").alias("_n_tok"),
        h.alias("_h"),
        (h % n_shards).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("_n_tok").over(w), F.lit(0)).cast("long")
    # Integer floor-div via modulo subtraction: (start - start % b) / b is
    # an exact double (numerator is an exact multiple), so the result
    # hash-matches integer `//` in any engine — plain start/b would round
    # through an inexact double quotient.
    seq = ((start - start % budget) / budget).cast("long")
    return sharded.select(
        id_col,
        "shard",
        start.alias("start_offset"),
        seq.alias("seq_in_shard"),
    )
