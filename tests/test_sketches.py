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


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def valdf(spark):
    # two keys; values are a deterministic shuffle of 0..N-1 so every
    # true percentile is known exactly
    rows = [("a", i, float((i * 7919) % 4000)) for i in range(4000)]
    rows += [("b", 10_000 + i, float(i)) for i in range(37)]  # < k group
    return spark.createDataFrame(rows, "k string, id long, v double")


def test_bottomk_priority_matches_python_and_jvm(spark):
    """The three hash-family members agree: JVM md5_long('bk|'+id),
    the Python replica the streaming mirror uses, and (transitively,
    via the oracled catalog row) DuckDB's nibble parse."""
    from purpleair_data_logger_spark.operators.sketches import (
        _bottomk_priority,
    )
    from purpleair_data_logger_spark.streaming.quantile import (
        bottomk_priority_py,
    )

    ids = [0, 1, 42, 987654321, 2**40]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    jvm = {
        r["id"]: r["h"]
        for r in df.select("id", _bottomk_priority("id").alias("h")).collect()
    }
    assert jvm == {i: bottomk_priority_py(i) for i in ids}


def test_bottomk_sample_partition_invariant_and_pure_python_match(
    spark, valdf
):
    """Sample membership is a pure function of row identity: any
    repartitioning gives the SAME rows, and an independent pure-Python
    bottom-k over the same data picks the identical set."""
    from purpleair_data_logger_spark.streaming.quantile import (
        bottomk_priority_py,
    )

    def run(df):
        return {
            (r["k"], r["id"])
            for r in sk.bottomk_sample(
                df, ["k"], "id", value_col="v", k=64
            ).collect()
        }

    s1 = run(valdf)
    s2 = run(valdf.repartition(17, "v"))
    assert s1 == s2
    rows = valdf.collect()
    expect = set()
    for key in ("a", "b"):
        grp = [(bottomk_priority_py(r["id"]), r["id"]) for r in rows
               if r["k"] == key]
        expect |= {(key, i) for _, i in sorted(grp)[:64]}
    assert s1 == expect


def test_bottomk_merge_of_disjoint_partials_equals_whole(spark, valdf):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) for disjoint
    halves — the global-hash merge algebra, bit-exact."""
    a = valdf.filter(F.col("id") % 2 == 0)
    b = valdf.filter(F.col("id") % 2 == 1)
    sa = sk.bottomk_sample(a, ["k"], "id", value_col="v", k=64)
    sb = sk.bottomk_sample(b, ["k"], "id", value_col="v", k=64)
    merged = {
        (r["k"], r["id"])
        for r in sk.bottomk_merge(
            sa, sb, key_cols=["k"], id_col="id", value_col="v", k=64
        ).collect()
    }
    whole = {
        (r["k"], r["id"])
        for r in sk.bottomk_sample(
            valdf, ["k"], "id", value_col="v", k=64
        ).collect()
    }
    assert merged == whole


def test_bottomk_quantiles_error_bound_and_small_group_exactness(
    spark, valdf
):
    """k=256 over 4000 known-rank values: every estimate lands within
    ±10 percentage points of its target rank (3σ of the binomial
    sampling error ≈ 9.4pp). The 37-row group is SMALLER than k, so
    its sample is the whole group and estimates are EXACT order
    statistics."""
    est = {
        (r["k"], r["q_pct"]): (r["n_sample"], r["est_value"])
        for r in sk.bottomk_quantiles(
            valdf, ["k"], "v", "id", k=256, q_pcts=(10, 50, 90, 99)
        ).collect()
    }
    for q in (10, 50, 90, 99):
        n, v = est[("a", q)]
        assert n == 256
        true_rank_pp = (v + 1) / 4000 * 100  # v values are 0..3999 ranks
        assert abs(true_rank_pp - q) <= 10, (q, v, true_rank_pp)
        n, v = est[("b", q)]
        assert n == 37
        assert v == float((q * 36) // 100)  # exact: sample == group


def test_bottomk_quantiles_rejects_bad_percent(spark, valdf):
    with pytest.raises(ValueError, match="integer percents"):
        sk.bottomk_quantiles(valdf, ["k"], "v", "id", q_pcts=(10, 101))


def test_streaming_quantiles_match_batch_bit_exact(spark, tmp_path):
    """The mirror's final snapshot equals the batch sketch EXACTLY:
    membership is a pure function of row identity, so after any
    arrival order / batch split the state is the batch sample of the
    rows seen. Also checks mid-stream snapshots are the batch answer
    over their own prefix."""
    from purpleair_data_logger_spark.streaming.quantile import (
        quantiles_by_group,
    )

    rows = [("a", i, float((i * 131) % 500)) for i in range(500)]
    rows += [("b", 1000 + i, float(i * i % 97)) for i in range(80)]
    src = str(tmp_path / "q_src")
    half = len(rows) // 2
    for chunk in (rows[:half], rows[half:]):
        (
            spark.createDataFrame(chunk, "k string, id long, v double")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    stream = (
        spark.readStream.schema("k string, id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = quantiles_by_group(stream, "k", "id", "v", k=64)
    q = (
        out.writeStream.format("memory")
        .queryName("bk_quant")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    emitted = spark.sql("SELECT * FROM bk_quant").collect()
    # latest snapshot per key = rows at max(rows_seen)
    latest = {}
    for r in emitted:
        cur = latest.get((r["k"], r["q_pct"]))
        if cur is None or r["rows_seen"] > cur[0]:
            latest[(r["k"], r["q_pct"])] = (
                r["rows_seen"], r["n_sample"], r["est_value"],
            )
    full = spark.createDataFrame(rows, "k string, id long, v double")
    batch = {
        (r["k"], r["q_pct"]): (r["n_sample"], r["est_value"])
        for r in sk.bottomk_quantiles(full, ["k"], "v", "id", k=64).collect()
    }
    assert {kq: (n, v) for kq, (_, n, v) in latest.items()} == batch
    # every mid-stream emission is the batch answer over its prefix:
    # rows arrive in list order, so rows_seen identifies the prefix
    by_key_order = {"a": [r for r in rows if r[0] == "a"],
                    "b": [r for r in rows if r[0] == "b"]}
    for r in emitted:
        prefix = by_key_order[r["k"]][: r["rows_seen"]]
        pdf = spark.createDataFrame(prefix, "k string, id long, v double")
        want = {
            (x["q_pct"]): (x["n_sample"], x["est_value"])
            for x in sk.bottomk_quantiles(
                pdf, ["k"], "v", "id", k=64
            ).collect()
        }
        assert want[r["q_pct"]] == (r["n_sample"], r["est_value"])
