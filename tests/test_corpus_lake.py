"""Corpus lake sink: partition layout, bounded per-directory file
counts, deterministic rerun output, and reader-side partition
pruning."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from purpleair_data_logger_spark.plans import explain as E
from purpleair_data_logger_spark.sinks import corpus_lake


def _corpus(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, "train")
        .when(F.col("id") % 10 < 9, "val")
        .otherwise("test")
        .alias("split"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )


def test_layout_file_bounds_and_roundtrip(spark, tmp_path):
    out = str(tmp_path / "lake")
    df = _corpus(spark)
    corpus_lake.write_corpus(
        df, out, id_col="doc_id", files_per_partition=3
    )
    # hive layout on both routing columns
    dirs = sorted(
        os.path.relpath(p, out)
        for p in glob.glob(os.path.join(out, "split=*", "lang=*"))
    )
    assert dirs == [
        "split=test/lang=de", "split=test/lang=en",
        "split=train/lang=de", "split=train/lang=en",
        "split=val/lang=de", "split=val/lang=en",
    ]
    # every directory written by <= files_per_partition tasks
    for d in dirs:
        files = glob.glob(os.path.join(out, d, "*.parquet"))
        assert 1 <= len(files) <= 3, d
    # content round-trips
    back = corpus_lake.read_corpus(spark, out)
    assert back.count() == 400
    assert {r["doc_id"] for r in back.filter("split = 'val'").collect()} == {
        r["doc_id"] for r in df.filter("split = 'val'").collect()
    }


def test_rerun_is_byte_deterministic(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _corpus(spark)
    for out in (a, b):
        corpus_lake.write_corpus(df, out, id_col="doc_id", files_per_partition=2)
    # same rows land in the same salt bucket both times: per-directory
    # row-count multisets match exactly (hash salt, not rand())
    def sizes(root):
        return sorted(
            (os.path.relpath(os.path.dirname(p), root), os.path.getsize(p))
            for p in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
        )

    assert sizes(a) == sizes(b)


def test_reader_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "lake")
    corpus_lake.write_corpus(
        _corpus(spark), out, id_col="doc_id", files_per_partition=2
    )
    df = corpus_lake.read_corpus(spark, out).filter(
        (F.col("split") == "train") & (F.col("lang") == "en")
    )
    plan = E.formatted_plan(df)
    assert "PartitionFilters" in plan
    assert "split" in plan.split("PartitionFilters", 1)[1][:200]
    # pruning is real: only the one directory's files are scanned
    assert df.count() == spark.read.parquet(out).filter(
        "split = 'train' and lang = 'en'"
    ).count()


def test_leakage_safe_split_lands_in_lake(spark, sf_dir, tmp_path):
    """End-to-end: the leakage-safe split assignment joins back to the
    documents and lands in the lake partitioned by (split, lang) — the
    final hop of the corpus build."""
    from purpleair_data_logger_spark import catalog
    from purpleair_data_logger_spark.io import load_table

    assigned = catalog.all_queries()["leakage_safe_split"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    final = assigned.join(docs, "doc_id").select(
        "doc_id", "split", "lang", "text"
    )
    out = str(tmp_path / "lake")
    corpus_lake.write_corpus(final, out, id_col="doc_id", files_per_partition=2)
    back = corpus_lake.read_corpus(spark, out)
    assert back.count() == final.count()
    # near-dup clusters never straddle splits, and the lake preserves that
    assert (
        back.select("split").distinct().count()
        == final.select("split").distinct().count()
    )


def test_upsert_partitions_replaces_only_present_dirs(spark, tmp_path):
    """Dynamic partition overwrite: rewriting one (split, lang) slice
    must not delete the rest of the lake (the static-overwrite
    footgun)."""
    out = str(tmp_path / "lake")
    corpus_lake.write_corpus(
        _corpus(spark), out, id_col="doc_id", files_per_partition=2
    )
    before = corpus_lake.read_corpus(spark, out)
    n_total = before.count()
    n_val_de = before.filter("split = 'val' and lang = 'de'").count()
    assert 0 < n_val_de < n_total

    patch = (
        _corpus(spark)
        .filter("split = 'val' and lang = 'de'")
        .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
    )
    corpus_lake.upsert_partitions(patch, out, id_col="doc_id", files_per_partition=2)

    after = corpus_lake.read_corpus(spark, out)
    assert after.count() == n_total  # nothing else deleted
    patched = after.filter("split = 'val' and lang = 'de'")
    assert patched.count() == n_val_de
    assert patched.filter(F.col("text").endswith("v2")).count() == n_val_de
    assert after.filter(
        "split = 'train' and not text like '%v2'"
    ).count() == before.filter("split = 'train'").count()
    # overwrite-mode restored afterwards
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        != "dynamic"
    )


def _python_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(i, (i * 37) % 65536, (i * 101) % 65536) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = df.select(
        "id", "x", "y", corpus_lake.zorder_key("x", "y").alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _python_morton(r["x"], r["y"])


def test_zorder_key_masks_high_bits_and_validates(spark):
    import pytest

    df = spark.createDataFrame([(1, 65536 + 3, 5)], "id long, x long, y long")
    (r,) = df.select(corpus_lake.zorder_key("x", "y").alias("z")).collect()
    assert r["z"] == _python_morton(3, 5)  # bit 16 masked off
    with pytest.raises(ValueError):
        corpus_lake.zorder_key("x", "y", bits=0)
    with pytest.raises(ValueError):
        corpus_lake.zorder_key("x", "y", bits=32)


def test_zordered_layout_skips_on_both_dimensions(spark, tmp_path):
    """The point of the layout: every parquet row group is a tight
    hyper-rectangle in BOTH columns. Compare against an x-sorted
    layout, whose row groups have tight x stats but full-range y
    stats — data-skipping on y predicates would read everything."""
    import pyarrow.parquet as pq

    n = 64
    rows = [(i * n + j, i, j) for i in range(n) for j in range(n)]
    df = spark.createDataFrame(rows, "id long, x long, y long").coalesce(1)

    z_path = str(tmp_path / "zorder")
    # This test pins a PHYSICAL-LAYOUT property whose granularity is
    # file count (write_zordered derives it from shuffle partitions,
    # = 2 in the fast test session): pin 16 range partitions so the
    # row-group stats assertions below measure the clustering, not the
    # session's partition default. Restored after the write.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        corpus_lake.write_zordered(df, z_path, zorder_cols=("x", "y"), bits=6)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    x_path = str(tmp_path / "xsort")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(x_path)
    )

    full_range = n - 1

    def y_spreads(path):
        spreads = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(2).statistics
                spreads.append(st.max - st.min)
        return spreads

    # x-sorted: row groups span (nearly) the full y range — y
    # predicates skip nothing.
    xs = y_spreads(x_path)
    assert max(xs) >= full_range - 1
    # z-ordered: the typical row group is confined to a small y
    # window (an unaligned range partition may straddle a Morton
    # quadrant boundary, so bound the MEAN, not the max).
    zs = y_spreads(z_path)
    assert sum(zs) / len(zs) <= full_range / 2
    assert sum(zs) / len(zs) < sum(xs) / len(xs) / 2


def test_zorder_key_three_dimensions(spark):
    def ref(vals, bits, n):
        z = 0
        for i in range(bits):
            for j in range(n):
                z |= ((vals[j] >> i) & 1) << (i * n + j)
        return z

    rows = [
        (i, (i * 37) % 1024, (i * 101) % 1024, (i * 7) % 1024)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long, w long")
    out = df.select(
        "x", "y", "w",
        corpus_lake.zorder_key("x", "y", "w", bits=10).alias("z"),
    ).collect()
    for r in out:
        assert r["z"] == ref((r["x"], r["y"], r["w"]), 10, 3)
    # n*bits > 63 rejected
    import pytest

    with pytest.raises(ValueError):
        corpus_lake.zorder_key("x", "y", "w", bits=22)
    with pytest.raises(ValueError):
        corpus_lake.zorder_key("x")


def test_diff_corpus_null_safe_and_flags(spark):
    """diff_corpus classifies added/removed/changed with null-safe
    column comparison (NULL->NULL unchanged, NULL->value changed) and
    NULL ids never misclassify (presence flags, not id-null checks);
    include_unchanged opts into the audit path; unknown compare_cols
    refuse by name."""
    import pytest

    from purpleair_data_logger_spark.sinks.corpus_lake import diff_corpus

    old = spark.createDataFrame(
        [
            (1, "a", "x"),
            (2, None, "x"),
            (3, "c", "x"),
            (4, "d", "x"),
            (None, "e", "x"),
        ],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [
            (1, "a", "x"),      # unchanged
            (2, None, "x"),     # unchanged (NULL == NULL null-safely)
            (3, None, "x"),     # changed (value -> NULL)
            (5, "f", "x"),      # added
            (None, "g", "x"),   # added (NULL id, present only via flag)
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        (r["doc_id"], r["change"])
        for r in diff_corpus(old, new, "doc_id").collect()
    }
    assert got == {
        (3, "changed"),
        (4, "removed"),
        (None, "removed"),
        (5, "added"),
        (None, "added"),
    }
    with_unchanged = {
        (r["doc_id"], r["change"])
        for r in diff_corpus(
            old, new, "doc_id", include_unchanged=True
        ).collect()
    }
    assert (1, "unchanged") in with_unchanged
    assert (2, "unchanged") in with_unchanged  # null-safe equality
    # restricting compare_cols ignores other columns' drift
    only_lang = diff_corpus(old, new, "doc_id", compare_cols=["lang"])
    assert {
        (r["doc_id"], r["change"]) for r in only_lang.collect()
    } == {(4, "removed"), (None, "removed"), (5, "added"), (None, "added")}
    with pytest.raises(ValueError, match="nope"):
        diff_corpus(old, new, "doc_id", compare_cols=["nope"])
