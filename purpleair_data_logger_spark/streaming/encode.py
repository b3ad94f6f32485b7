"""Streaming mirror of the embedding-generation stage.

A continuously-ingesting crawl wants its embeddings generated AS the
documents arrive, not in a nightly batch over the accumulated corpus.
`operators/encoder.py::encode_documents` is a stateless Arrow
projection (chunk → encode → mean-pool inside one `mapInPandas`, no
shuffle, no state), so it attaches to a streaming DataFrame
UNCHANGED — the same physical operator evaluates per micro-batch, no
watermark needed, any trigger. This module exists to make that
contract explicit and pinned: `encode_stream` is the streaming entry
point, and `tests/test_storage_streaming.py` pins bit-exact
batch≡streaming parity (each output float is one division of exact
integers, so equality is exact, not approximate).

Scale shape: identical to batch — per-micro-batch cost is one Arrow
pass over the new documents only; nothing accumulates.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from purpleair_data_logger_spark.operators import encoder as enc


def encode_stream(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = enc.DEFAULT_DIM,
    chunk_chars: int = enc.DEFAULT_CHUNK_CHARS,
    encoder: Callable[[str, int], list[int]] = enc.encode_text,
) -> DataFrame:
    """Attach the chunk→encode→mean-pool stage to a document stream.

    Exactly `encode_documents` — stateless, so batch and streaming
    share one code path and cannot drift. Returns (doc_id, n_chunks,
    embedding) rows in append mode.
    """
    return enc.encode_documents(
        stream_df,
        id_col,
        text_col,
        dim=dim,
        chunk_chars=chunk_chars,
        encoder=encoder,
    )


def encode_stream_incremental(
    stream_df: DataFrame,
    done_ids: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = enc.DEFAULT_DIM,
    chunk_chars: int = enc.DEFAULT_CHUNK_CHARS,
    encoder: Callable[[str, int], list[int]] = enc.encode_text,
) -> DataFrame:
    """Steady-state streaming encode: per micro-batch, drop documents
    whose id already appears in the STATIC already-encoded set
    (``done_ids``: one column named ``id_col``), then run the Arrow
    encode stage on the remainder — the streaming mirror of
    `catalog.document_embeddings_incremental`, built on Spark's
    stream-static LEFT ANTI join (the `streaming/neardup.py`
    against-precomputed-artifact discipline: the accumulated corpus is
    never re-encoded, each trigger pays only for its new rows).

    Scale shape: the anti-join prunes BEFORE the Python worker sees a
    row, so model cost is per-new-document; the static side is loaded
    once per micro-batch plan (persist it bucketed/broadcastable when
    it fits). No watermark needed — the operator holds no state."""
    todo = stream_df.join(done_ids.select(id_col), on=id_col, how="left_anti")
    # delegate to encode_stream (not encode_documents directly) so the
    # module's one-code-path promise holds for the incremental shape too
    return encode_stream(
        todo,
        id_col,
        text_col,
        dim=dim,
        chunk_chars=chunk_chars,
        encoder=encoder,
    )
