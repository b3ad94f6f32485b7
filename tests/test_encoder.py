"""Embedding-generation stage (`operators/encoder.py`): stub parity
against independent arithmetic, chunk/mean-pool semantics, the NULL
contract, partitioning invariance, and the injectable-model seam."""

from __future__ import annotations

import hashlib
import math

import pytest

from purpleair_data_logger_spark.operators import encoder as enc


def _py_embed(text: str, dim: int = 16, chunk_chars: int = 128):
    """Independent reference: same chunk -> sha256 -> mean-pool
    pipeline, written plainly."""
    nch = max(1, math.ceil(len(text) / chunk_chars))
    sums = [0] * dim
    for c in range(nch):
        d = hashlib.sha256(
            text[c * chunk_chars : (c + 1) * chunk_chars].encode("utf-8")
        ).digest()
        for i in range(dim):
            sums[i] += d[i]
    return nch, [s / (255 * nch) for s in sums]


def test_stub_parity_and_pooling(spark):
    """Single-chunk and multi-chunk docs both match the independent
    reference; a multi-chunk embedding is genuinely the mean over its
    chunk vectors (not the first chunk's)."""
    short = "hello world"
    long = "abc" * 200  # 600 chars -> 5 chunks of 128
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in enc.encode_documents(
            df, "doc_id", "text", dim=16, encoder=enc.fake_encoder
        ).collect()
    }
    for doc_id, text in ((1, short), (2, long)):
        nch, ref = _py_embed(text)
        assert out[doc_id]["n_chunks"] == nch
        got = out[doc_id]["embedding"]
        assert len(got) == 16
        assert all(abs(g - r) < 1e-6 for g, r in zip(got, ref))
    # multi-chunk pooling differs from chunk-0 alone
    chunk0 = [b / 255.0 for b in hashlib.sha256(long[:128].encode()).digest()[:16]]
    assert any(abs(g - c0) > 1e-4 for g, c0 in zip(out[2]["embedding"], chunk0))


def test_null_text_contract(spark):
    """NULL text carries no observation: NULL n_chunks + NULL
    embedding (sha256(NULL)-propagation, the repo NULL contract);
    the empty string still encodes (one chunk of '')."""
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in enc.encode_documents(
            df, "doc_id", "text", encoder=enc.fake_encoder
        ).collect()
    }
    assert rows[1]["n_chunks"] is None and rows[1]["embedding"] is None
    assert rows[2]["n_chunks"] == 1
    ref = [b / 255.0 for b in hashlib.sha256(b"").digest()[:16]]
    assert all(abs(g - r) < 1e-6 for g, r in zip(rows[2]["embedding"], ref))


def test_partitioning_invariance(spark):
    """Chunking + pooling happen per row inside the worker, so the
    result is independent of partitioning (bit-equal floats: each is
    one division of exact integers)."""
    docs = [(i, f"document number {i} " * (i % 7 + 1)) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    run = lambda d: {
        r["doc_id"]: (r["n_chunks"], tuple(r["embedding"]))
        for r in enc.encode_documents(
            d, "doc_id", "text", encoder=enc.fake_encoder
        ).collect()
    }
    assert run(df.repartition(1)) == run(df.repartition(13))


def test_real_encoder_seam_raises(spark):
    """The production entry point is a clearly-marked stub: default
    encoder raises NotImplementedError instead of fabricating
    vectors."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(Exception, match="NotImplementedError|model runtime"):
        enc.encode_documents(df, "doc_id", "text").collect()


def test_dim_and_chunk_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_chars"):
        enc.encode_documents(df, "doc_id", "text", chunk_chars=0)
    with pytest.raises(ValueError, match="dim must be positive"):
        enc.encode_documents(df, "doc_id", "text", dim=0)
    with pytest.raises(Exception, match="dim <= 32"):
        enc.encode_documents(
            df, "doc_id", "text", dim=33, encoder=enc.fake_encoder
        ).collect()
