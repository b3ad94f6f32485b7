"""Embedding-generation stage: batched text -> vector encoder.

The corpus→embeddings edge of the ANN ladder (r9 VERDICT #8): every
`operators/similarity.py` rung consumes an ``embedding array<float>``
column, and this module is the first-class operator that PRODUCES it
from a document table. The Spark-side contract is the real thing —
one `mapInPandas` Arrow stage per partition, chunk-then-pool
semantics, fixed-width output schema — while the actual model forward
pass is STUBBED on the `operators/multimodal.py` decoder precedent:
no inference runtime ships in this container, so `encode_text` raises
``NotImplementedError`` unless given the deterministic fake encoder,
which tests and the catalog use (and whose arithmetic the DuckDB
oracle replays exactly).

Encoder semantics (what a real sentence-transformer deployment does):

* a document longer than the model's context window is split into
  fixed-size character chunks (``chunk_chars``);
* each chunk is encoded independently;
* the document vector is the MEAN-POOL over its chunk vectors.

Design for 100 TB:

* the whole stage is ONE Arrow pass — chunking and pooling happen
  inside the Python worker per row, so a document NEVER explodes into
  shuffled chunk rows (plan-pinned: one MapInPandas, zero Exchange);
* per-batch Python cost is amortized via Arrow transfer;
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds worker
  memory however wide the corpus;
* pooling arithmetic is kept in INTEGER space until one final
  division (sum of per-chunk byte features / (255 * n_chunks)), so
  the float32 output is a single division of exact integers — the
  gate query recovers the integer numerators exactly and DuckDB
  replays them bit-for-bit;
* NULL text carries no observation: NULL embedding, NULL n_chunks
  (the repo-wide NULL contract — matching SQL's sha256(NULL) = NULL
  propagation instead of silently encoding the empty string).
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 16
DEFAULT_CHUNK_CHARS = 128


def fake_encoder(chunk: str, dim: int) -> list[int]:
    """Deterministic stand-in for a model forward pass: the first
    ``dim`` bytes of sha256(utf-8(chunk)) as integer features in
    [0, 255]. Same (chunk -> fixed-width vector) signature a real
    encoder plugs into; the DuckDB oracle replays it from the hex
    digest. ``dim`` must be <= 32 (sha256 emits 32 bytes)."""
    if dim > 32:
        raise ValueError(f"fake_encoder supports dim <= 32, got {dim}")
    digest = hashlib.sha256(chunk.encode("utf-8")).digest()
    return list(digest[:dim])


def encode_text(chunk: str, dim: int) -> list[int]:
    """Real encoder entry point — STUB: no inference runtime here."""
    raise NotImplementedError(
        "text encoding requires a model runtime, not present in this "
        "container; pass encoder=fake_encoder for the deterministic "
        "test path"
    )


def embedding_schema(dim: int) -> T.StructType:
    # doc_id is declared NULLABLE on purpose (r10 self-review): the
    # operator passes ids through untouched, so a NULL id in the input
    # yields a NULL id in the output — declaring it non-null would let
    # the optimizer elide null-aware handling downstream and turn a
    # data problem into silent wrong results. Filter ids upstream (the
    # catalog query does).
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("n_chunks", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
    )


def encode_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = DEFAULT_DIM,
    chunk_chars: int = DEFAULT_CHUNK_CHARS,
    encoder: Callable[[str, int], list[int]] = encode_text,
) -> DataFrame:
    """Chunk, encode, and mean-pool every document into one
    ``embedding array<float>`` row — the input shape every ANN rung in
    `operators/similarity.py` consumes.

    One `mapInPandas` Arrow stage: chunking (``chunk_chars``-character
    windows, one chunk minimum so the empty string still encodes) and
    mean-pooling both happen inside the worker per row — no chunk-row
    explode, no shuffle. Pooling sums the per-chunk integer features
    and divides ONCE by ``255 * n_chunks``, so each output float is a
    single division of exact integers (bit-stable across partitionings
    and replayable by the DuckDB oracle). The encoder is injectable:
    production plugs a model runtime, tests plug `fake_encoder`.
    """
    if chunk_chars <= 0:
        raise ValueError(f"chunk_chars must be positive, got {chunk_chars}")
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("_text"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_chunks: list[int | None] = []
            pooled: list[list[float] | None] = []
            for text in pdf["_text"]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    n_chunks.append(None)
                    pooled.append(None)
                    continue
                nch = max(1, math.ceil(len(text) / chunk_chars))
                sums = [0] * dim
                for c in range(nch):
                    feats = encoder(
                        text[c * chunk_chars : (c + 1) * chunk_chars], dim
                    )
                    for i, b in enumerate(feats):
                        sums[i] += b
                denom = 255 * nch
                n_chunks.append(nch)
                pooled.append([s / denom for s in sums])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chunks": pd.array(n_chunks, dtype="Int64"),
                    "embedding": pooled,
                }
            )

    return src.mapInPandas(run, schema=embedding_schema(dim))
