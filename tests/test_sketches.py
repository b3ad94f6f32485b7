"""Count-Min sketch (`operators/sketches.py`): the one-sided error
invariant (estimate never below truth), the merge algebra
(sketch(A ∪ B) == merge(sketch(A), sketch(B)) EXACTLY), absent-key
behavior, weighted counts, and partitioning invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from purpleair_data_logger_spark.operators import sketches as sk

WORDS = (
    ["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 7 + ["delta"] * 3
    + [f"tail{i}" for i in range(200)]  # long tail to force collisions
)


@pytest.fixture(scope="module")
def toks(spark):
    return spark.createDataFrame([(w,) for w in WORDS], "tok string")


def _est(spark, sketch, keys, **kw):
    kdf = spark.createDataFrame([(k,) for k in keys], "tok string")
    return {
        r["tok"]: r["n_est"]
        for r in sk.countmin_estimate(sketch, kdf, "tok", **kw).collect()
    }


def test_estimate_never_below_truth(spark, toks):
    # Tiny width => heavy collisions => overestimates, never under.
    sketch = sk.countmin_table(toks, "tok", width=16, depth=3)
    truth = {w: WORDS.count(w) for w in set(WORDS)}
    got = _est(spark, sketch, list(truth), width=16, depth=3)
    assert set(got) == set(truth)
    assert all(got[w] >= truth[w] for w in truth)
    # total mass bound: no single estimate exceeds the full stream
    assert all(v <= len(WORDS) for v in got.values())


def test_wide_sketch_is_exact_here(spark, toks):
    # width >> distinct keys: collisions vanish, estimates are exact.
    sketch = sk.countmin_table(toks, "tok", width=4096, depth=4)
    got = _est(spark, sketch, ["alpha", "beta", "gamma", "delta"],
               width=4096, depth=4)
    assert got == {"alpha": 50, "beta": 20, "gamma": 7, "delta": 3}


def test_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(w,) for w in WORDS[:100]], "tok string")
    b = spark.createDataFrame([(w,) for w in WORDS[100:]], "tok string")
    toks = a.unionByName(b)
    sk_a = sk.countmin_table(a, "tok", width=64, depth=3)
    sk_b = sk.countmin_table(b, "tok", width=64, depth=3)
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sk.countmin_merge(sk_a, sk_b).collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sk.countmin_table(toks, "tok", width=64, depth=3).collect()
    }
    assert merged == whole


def test_absent_key_estimates_zero_or_collision(spark, toks):
    sketch = sk.countmin_table(toks, "tok", width=4096, depth=4)
    got = _est(spark, sketch, ["never-seen-key"], width=4096, depth=4)
    # wide sketch: almost surely all 4 cells untouched -> 0; the
    # contract is only >= 0 and <= collision mass, but at this width
    # the planted vocabulary cannot fill 4 independent cells
    assert got["never-seen-key"] == 0


def test_weighted_counts(spark):
    df = spark.createDataFrame(
        [("x", 5), ("x", 7), ("y", 1)], "tok string, w long"
    )
    sketch = sk.countmin_table(df, "tok", width=1024, depth=4, weight_col="w")
    got = _est(spark, sketch, ["x", "y"], width=1024, depth=4)
    assert got == {"x": 12, "y": 1}


def test_partitioning_invariance(spark, toks):
    s1 = sk.countmin_table(toks.repartition(1), "tok", width=64, depth=3)
    s7 = sk.countmin_table(toks.repartition(7), "tok", width=64, depth=3)
    as_map = lambda df: {
        (r["row"], r["bucket"]): r["cnt"] for r in df.collect()
    }
    assert as_map(s1) == as_map(s7)


def test_null_keys_carry_no_observation(spark):
    df = spark.createDataFrame([("x",), (None,), ("x",)], "tok string")
    sketch = sk.countmin_table(df, "tok", width=256, depth=2)
    total = sketch.agg(F.sum("cnt")).collect()[0][0]
    assert total == 2 * 2  # two non-null rows x two sketch rows


def test_streaming_countmin_matches_batch(spark, tmp_path):
    """The streaming mirror is the SAME sketch: after ingesting two
    micro-batches, the engine-maintained cells equal the batch
    `countmin_table` over the union exactly (cells add — no disorder
    contract), and a point query against the streamed snapshot gives
    identical estimates."""
    from purpleair_data_logger_spark.streaming.countmin import countmin_stream

    b1 = [(w,) for w in WORDS[:150]]
    b2 = [(w,) for w in WORDS[150:]]
    src = str(tmp_path / "cms_src")
    for rows in (b1, b2):
        (
            spark.createDataFrame(rows, "tok string")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = countmin_stream(stream, "tok", width=64, depth=3)
    q = (
        out.writeStream.format("memory")
        .queryName("cms_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_cells").collect()
    }
    toks = spark.createDataFrame([(w,) for w in WORDS], "tok string")
    batch = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sk.countmin_table(toks, "tok", width=64, depth=3).collect()
    }
    assert streamed == batch
    # point queries against the streamed snapshot match the batch path
    snap = spark.createDataFrame(
        [(row, b, c) for (row, b), c in streamed.items()],
        "row int, bucket long, cnt long",
    )
    keys = ["alpha", "beta", "gamma", "delta"]
    est_stream = _est(spark, snap, keys, width=64, depth=3)
    est_batch = _est(
        spark, sk.countmin_table(toks, "tok", width=64, depth=3), keys,
        width=64, depth=3,
    )
    assert est_stream == est_batch


def test_negative_weight_raises(spark):
    """ADVICE r9: the never-below-truth guarantee requires w >= 0 —
    a negative weight must raise at scan time, not silently poison
    every estimate the sketch ever serves."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [("x", 5), ("y", -1)], "tok string, w long"
    )
    sketch = sk.countmin_table(df, "tok", width=64, depth=2, weight_col="w")
    with _pytest.raises(Exception, match="negative weight"):
        sketch.collect()
