"""Corpus lake sink: the final landing layout for a curated training
corpus — hive-partitioned parquet with controlled file counts, the
write side of every `corpus_build_final` / streaming-curation output.

Layout contract:

* **partition directories** on the low-cardinality routing columns a
  training job prunes by (``split``, ``lang``): a reader asking for
  `split='train' AND lang='en'` must touch only that directory
  (partition pruning, pinned in tests);
* **bounded file counts**: the classic failure modes are one giant
  file per partition (one writer task → no read parallelism, no
  write parallelism, a straggler per hot partition) and the
  small-files explosion (every shuffle task writing into every
  directory). The writer repartitions on (partition cols + a salt
  bucket from a stable id hash), so each directory is written by
  ``files_per_partition`` tasks in parallel — a hot partition
  (English train set = most of the corpus) scales its writers by
  configuration, not luck. ``maxRecordsPerFile`` stays as the row
  bound within a writer;
* **deterministic routing**: the salt is a hash of a caller-named id
  column, not ``rand()`` — reruns produce identical file contents,
  which keeps the sink idempotent under overwrite and diffable across
  builds (the `sampling.py` determinism discipline).

ZSTD compression comes from the session default (`session.py`).
Reference context: this generalizes the nine-table sensor store's
date-partitioned layout (`sinks/tables.py`) to the documents side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_corpus(
    df: DataFrame,
    path: str,
    *,
    id_col: str,
    partition_cols: Sequence[str] = ("split", "lang"),
    files_per_partition: int = 4,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a partitioned corpus lake (see module contract)."""
    if files_per_partition < 1:
        raise ValueError("files_per_partition must be >= 1")
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_partition))
    (
        df.repartition(*[F.col(c) for c in partition_cols], salt)
        .write.partitionBy(*partition_cols)
        .option("maxRecordsPerFile", max_records_per_file)
        .mode(mode)
        .parquet(path)
    )


def upsert_partitions(
    df: DataFrame,
    path: str,
    *,
    id_col: str,
    partition_cols: Sequence[str] = ("split", "lang"),
    files_per_partition: int = 4,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Incremental lake rebuild: REPLACE exactly the partitions present
    in ``df``, leave every other directory untouched.

    This is Spark's dynamic partition-overwrite mode, scoped to this
    write (session state restored after): a nightly re-curation of the
    German validation split rewrites ``split=val/lang=de`` only —
    static overwrite mode would silently DELETE the rest of the lake,
    the classic incremental-pipeline footgun. Same salted writer
    parallelism and determinism contract as `write_corpus`.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        write_corpus(
            df,
            path,
            id_col=id_col,
            partition_cols=partition_cols,
            files_per_partition=files_per_partition,
            max_records_per_file=max_records_per_file,
            mode="overwrite",
        )
    finally:
        spark.conf.set(key, prev)


def zorder_key(*cols, bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    or more non-negative integer columns — the multi-dimensional
    clustering key behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.
    Bit ``i`` of column ``j`` lands at position ``i·n + j`` (for two
    columns: x on even bits, y on odd — the classic layout).

    Why it matters at 100 TB: parquet data-skipping prunes row groups
    by per-column min/max. A layout sorted by ONE column gives perfect
    stats on it and useless full-range stats on every other; sorting
    by the interleaved key makes every row group a small
    hyper-rectangle in ALL n dimensions, so predicates on any
    clustered column (or several) skip. The expression is n·bits
    shift/mask/or terms of exact integer codegen — no UDF,
    engine-portable (the DuckDB oracle replays it with the same
    ``>> & <<`` arithmetic).

    Contract: inputs must already be quantized to ``[0, 2^bits)``
    (rank, hash-bucket, or scaled value — the caller owns the
    quantizer, because a data-dependent min/max scan is a separate
    pass). Bits above ``bits`` are masked off. ``n·bits ≤ 63`` keeps
    the key in a positive int64; resolution trades off against
    dimension count (16 bits × 2 cols, 10 bits × 6 cols, …).
    """
    n = len(cols)
    if n < 2:
        raise ValueError(f"zorder_key needs >= 2 columns, got {n}")
    if not 1 <= bits or n * bits > 63:
        raise ValueError(
            f"n*bits must be in [2, 63], got {n} cols x {bits} bits"
        )
    casted = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(casted):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return key


def zorder_key_sql(*cols: str, bits: int = 16) -> str:
    """The DuckDB/ANSI replica of `zorder_key` for oracle SQL."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + j})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    zorder_cols: Sequence[str],
    bits: int = 16,
    target_rows_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write the frame clustered by the Morton key of two or more
    quantized columns: a range-partition + in-partition sort on the
    key (`repartitionByRange` samples the key distribution, so files
    are balanced even when the key space is sparse), giving every file
    AND row group tight min/max on every clustered dimension. The read
    side needs nothing special — plain parquet data-skipping does the
    pruning.
    """
    zk = zorder_key(*zorder_cols, bits=bits)
    n_files = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    (
        df.withColumn("_zk", zk)
        .repartitionByRange(n_files, "_zk")
        .sortWithinPartitions("_zk")
        .drop("_zk")
        .write.option("maxRecordsPerFile", target_rows_per_file)
        .mode(mode)
        .parquet(path)
    )


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a corpus lake; partition columns come back as columns and
    predicates on them prune directories (asserted in tests)."""
    return spark.read.parquet(path)


def diff_corpus(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str,
    *,
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """What changed between two corpus builds: (id, change) with
    change in {'added', 'removed', 'changed'} (+ 'unchanged' only when
    ``include_unchanged=True``) — the deterministic-layout promise of
    this module ("diffable across builds") made executable, and the
    driver of incremental retraining / cache invalidation decisions:
    re-embed and re-pack exactly the added ∪ changed set, retire the
    removed set.

    ``compare_cols`` defaults to every column the two sides share
    (minus the id), compared null-safely — a doc counts as 'changed'
    only when some compared column is DISTINCT FROM its old value, so
    NULL→NULL is unchanged and NULL→value is changed, both engines'
    IS DISTINCT FROM semantics.

    100 TB shape: one full-outer equi-join on the id — with both
    snapshots written by `write_corpus` (deterministic routing), store
    them bucketed on the id and the join plans with zero exchanges;
    output is O(changes), never O(corpus) (unless
    ``include_unchanged``, the audit path). Ids are assumed unique per
    side (the corpus PK); duplicate ids fan out exactly as a SQL FULL
    JOIN would."""
    common = set(old_df.columns) & set(new_df.columns) - {id_col}
    cols = (
        list(compare_cols) if compare_cols is not None else sorted(common)
    )
    missing = [c for c in cols if c not in common]
    if missing:
        raise ValueError(
            f"compare_cols {missing} not present on both sides"
        )
    o = old_df.select(
        F.col(id_col).alias("_id"),
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new_df.select(
        F.col(id_col).alias("_id"),
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    j = o.join(n, "_id", "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(F.col("_id").alias(id_col), change.alias("change"))
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
