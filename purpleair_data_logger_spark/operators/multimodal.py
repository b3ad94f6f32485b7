"""Multimodal column operators: opaque binary payloads + typed metadata.

North-star surface for image/audio/video columns in a training-data
pipeline (BASELINE.json). The Spark-side contract is the real thing —
schemas, Arrow batch shapes, `mapInPandas` partitioning — while the
actual media decode is STUBBED: the decode libraries (PIL/ffmpeg/…)
are not in this container, so `decode_image` raises
``NotImplementedError`` unless given the deterministic fake decoder,
which tests and the catalog use.

Design for 100 TB:

* media bytes stay an opaque ``binary`` column next to typed metadata
  (``media_type``, ``n_bytes``, checksum) — never exploded into rows;
* per-batch Python cost is amortized via `mapInPandas` over Arrow
  batches (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
  memory per batch);
* feature extraction emits fixed-width vectors (array<float>) feeding
  straight into `operators.similarity` ANN.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from purpleair_data_logger_spark.materialize import materialize_once

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media-shaped frame from a text table (test/demo path):
    payload = utf-8 bytes, media_type tagged 'text/plain'."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def payload_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata projection — JVM-side only, no Python.

    ``n_bytes`` via octet length, integrity checksum via md5. This is
    the cheap pass that runs over all 100 TB; decode runs only on the
    (filtered) slice that needs it.
    """
    return df.select(
        "media_id",
        "media_type",
        F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
    )


def fake_decoder(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a real media decoder: derives a fixed
    8-dim feature vector from the payload digest. Replaces PIL/ffmpeg
    in this container; same signature a real decoder plugs into."""
    digest = hashlib.sha256(payload or b"").digest()
    feats = [b / 255.0 for b in digest[:8]]
    return {"width": digest[8] % 64 + 1, "height": digest[9] % 64 + 1, "features": feats}


def decode_image(payload: bytes, media_type: str) -> dict:
    """Real decoder entry point — STUB: decode libs absent here."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg, not present in this container; "
        "pass decoder=fake_decoder for the deterministic test path"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_features(
    df: DataFrame,
    *,
    decoder: Callable[[bytes, str], dict] = decode_image,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode + featurize via `mapInPandas` over Arrow batches.

    One Python worker pass per partition, vectorized transfer both
    ways; emits `FEATURE_SCHEMA` rows 1:1 with inputs. The decoder is
    injectable: production plugs a real media decoder, tests plug
    `fake_decoder`.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _none = {"width": None, "height": None, "features": None}
        for pdf in batches:
            # NULL payload contract (fuzz-found, r6): nothing to
            # decode -> NULL width/height/features, matching SQL NULL
            # propagation (sha256(NULL) = NULL) instead of silently
            # decoding the empty payload.
            decoded = [
                decoder(p, mt) if p is not None else _none
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array(
                        [d["width"] for d in decoded], dtype="Int32"
                    ),
                    "height": pd.array(
                        [d["height"] for d in decoded], dtype="Int32"
                    ),
                    "features": [d["features"] for d in decoded],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_offset", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)


def extract_video_frames(payload: bytes, media_type: str, frame_size: int, n_frames: int):
    """Real frame extraction entry point — STUB: container parsing
    (ffmpeg) absent here; pass frame_extractor=fake_frame_extractor."""
    raise NotImplementedError(
        "frame extraction requires ffmpeg, not present in this container; "
        "pass frame_extractor=fake_frame_extractor for the deterministic path"
    )


def fake_frame_extractor(
    payload: bytes, media_type: str, frame_size: int, n_frames: int
) -> list[tuple[int, int, str]]:
    """Deterministic stand-in for container-aware frame extraction:
    treats the payload as a stream of fixed-size pseudo-frames and
    samples ``n_frames`` evenly by stride. Returns (frame_idx,
    byte_offset, md5-of-frame-bytes) tuples — the same (offset, bytes)
    contract a real demuxer plugs into."""
    data = payload or b""
    n_avail = max(len(data) // frame_size, 1)
    m = min(n_frames, n_avail)
    stride = n_avail // m
    out = []
    for k in range(m):
        off = k * stride * frame_size
        fb = data[off : off + frame_size]
        out.append((k, off, hashlib.md5(fb).hexdigest()))
    return out


def sample_frames(
    df: DataFrame,
    *,
    frame_size: int = 64,
    n_frames: int = 4,
    frame_extractor: Callable = extract_video_frames,
) -> DataFrame:
    """Frame sampling over video-shaped binary columns: one OUTPUT ROW
    PER SAMPLED FRAME via `mapInPandas` — the 1:N batch shape (unlike
    `extract_features`' 1:1), which is the part worth getting right on
    Spark: the explode happens inside the Arrow batch, so a 2 GB video
    row never round-trips per frame, and downstream per-frame ops
    (dedup on frame_md5, featurize, ANN) are plain DataFrame stages."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, digs = [], [], [], []
            for mid, p, mt in zip(pdf["media_id"], pdf["payload"], pdf["media_type"]):
                if p is None:
                    # NULL payload: no media, no frames (fuzz r6)
                    continue
                for k, off, dig in frame_extractor(p, mt, frame_size, n_frames):
                    ids.append(mid)
                    idxs.append(k)
                    offs.append(off)
                    digs.append(dig)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                    "frame_md5": pd.Series(digs, dtype=object),
                }
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("bands", T.ArrayType(T.IntegerType()), True),
    ]
)

#: Average-hash geometry: 64 "pixels" → 64 bits → 8 bands of 8 bits.
#: Bands double as the LSH keys (see `phash_neardup_pairs`), so the
#: pigeonhole recall contract below depends on these two constants.
PHASH_PIXELS = 64
PHASH_BANDS = 8


def thumbnail_image(payload: bytes, media_type: str, n_pixels: int) -> list:
    """Real thumbnailer entry point — STUB: a production deployment
    decodes the image (PIL/ffmpeg keyframe) and downsamples to an
    ``n_pixels`` grayscale strip, the classic aHash preprocessing.
    Decode libs absent here; pass thumbnailer=fake_thumbnailer."""
    raise NotImplementedError(
        "perceptual-hash thumbnailing requires PIL/ffmpeg, not present in "
        "this container; pass thumbnailer=fake_thumbnailer for the "
        "deterministic test path"
    )


def fake_thumbnailer(payload: bytes, media_type: str, n_pixels: int) -> list:
    """Deterministic stand-in for decode+downsample: the payload's
    utf-8 code points sampled at ``n_pixels`` strided positions — a
    LOCALITY-PRESERVING fake (unlike `fake_decoder`'s digest, which
    avalanches): a small substitution edit to the payload moves only
    the sampled positions it touches, so perceptually-near payloads
    land Hamming-near, which is the property the real decoder has and
    the near-dup rung needs. Same (payload, media_type, n) → pixel
    list contract a real thumbnailer plugs into."""
    s = (payload or b"").decode("utf-8", errors="replace")
    n = len(s)
    if n == 0:
        return [0] * n_pixels
    return [ord(s[(k * n) // n_pixels]) for k in range(n_pixels)]


def perceptual_hash(
    df: DataFrame,
    *,
    thumbnailer: Callable[[bytes, str, int], list] = thumbnail_image,
    n_pixels: int = PHASH_PIXELS,
    n_bands: int = PHASH_BANDS,
) -> DataFrame:
    """Average-hash (aHash) perceptual signature via `mapInPandas`:
    thumbnail → bit k = (pixel_k · n_pixels ≥ Σ pixels), integer-exact
    (no float mean), packed little-endian into ``n_bands`` byte-sized
    band values. The bands ARE the LSH keys downstream. NULL payload →
    NULL bands (SQL NULL propagation; such rows can never be
    candidates). 1:1 with inputs, one Arrow pass, O(n_pixels)/row."""
    if n_pixels % n_bands != 0:
        raise ValueError(f"n_pixels {n_pixels} not divisible by n_bands {n_bands}")
    width = n_pixels // n_bands

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, mt in zip(pdf["payload"], pdf["media_type"]):
                if p is None:
                    out.append(None)
                    continue
                px = thumbnailer(p, mt, n_pixels)
                tot = sum(px)
                bits = [1 if v * n_pixels >= tot else 0 for v in px]
                out.append(
                    [
                        sum(bits[b * width + j] << j for j in range(width))
                        for b in range(n_bands)
                    ]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "bands": out})

    return df.mapInPandas(run, schema=PHASH_SCHEMA)


def phash_neardup_pairs(
    df: DataFrame,
    *,
    thumbnailer: Callable[[bytes, str, int], list] = thumbnail_image,
    max_hamming: int = 6,
    max_bucket_size: int | None = None,
    n_pixels: int = PHASH_PIXELS,
    n_bands: int = PHASH_BANDS,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over a media column — the
    multimodal rung of the dedup ladder (VERDICT r12 missing #3),
    reusing the banded-LSH discipline of `operators.dedup`:

    1. `perceptual_hash` signatures (one Arrow stage);
    2. band equi-join candidates — each band value is an LSH bucket
       key, so candidate cost is collision-bounded, NEVER all-pairs;
       ``max_bucket_size`` applies `dedup.keep_buckets_within_cap`
       (the degenerate-boilerplate cap, e.g. blank images) before the
       self-join, bounding the worst bucket to cap·(cap−1)/2;
    3. verify candidates by exact Hamming distance over the packed
       bands (JVM-side ``zip_with``/``bit_count``, no Python).

    RECALL CONTRACT (pigeonhole): a pair with Hamming distance
    < ``n_bands`` differs in fewer bits than there are bands, so at
    least one band matches exactly and the pair IS a candidate —
    recall 1 for every pair with distance ≤ n_bands−1 (absent the
    cap, whose drops are the documented boilerplate trade). The
    default ``max_hamming=6`` sits inside that guarantee.

    100 TB pattern: the signature plan is referenced three times
    (band explode + both verify sides), and Spark recomputes shared
    subplans — so at scale compute `perceptual_hash` ONCE, persist it
    (the signature table is ~40 bytes/row, the persistable artifact of
    the `dedup.lsh_banded` convention), and pass it as ``signatures``
    so the real decoder runs exactly once per payload. ``df`` may then
    be None; the default recompute path is for small/one-shot corpora.

    Returns (media_id_1, media_id_2, hamming), id_1 < id_2.
    """
    from purpleair_data_logger_spark.operators.dedup import (
        keep_buckets_within_cap,
    )

    ph = (
        signatures
        if signatures is not None
        else perceptual_hash(
            df, thumbnailer=thumbnailer, n_pixels=n_pixels, n_bands=n_bands
        )
    ).filter(F.col("bands").isNotNull())
    # Materialize the signature table once (r13, guide §1.2/§2.4): it
    # is referenced three times below (band explode + both verify
    # sides), and Spark compiles shared subplans into each consumer —
    # the decode+hash Arrow stage ran 3x. A lazy materialization stores
    # the ~40 B/row signatures at first use; all three consumers scan
    # the stored rows. Same trade as `dedup.minhash_lsh_candidates`'s
    # band index; at real scale persist the table and pass
    # ``signatures`` instead (docstring above).
    ph = materialize_once(ph)
    long = ph.select(
        "media_id", F.posexplode("bands").alias("band_idx", "band_val")
    )
    if max_bucket_size is not None:
        long = keep_buckets_within_cap(
            long, max_bucket_size, keys=("band_idx", "band_val")
        )
    a, b = long.alias("a"), long.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_id_1"),
            F.col("b.media_id").alias("media_id_2"),
        )
        .distinct()
    )
    h1 = ph.select(
        F.col("media_id").alias("media_id_1"), F.col("bands").alias("_b1")
    )
    h2 = ph.select(
        F.col("media_id").alias("media_id_2"), F.col("bands").alias("_b2")
    )
    hamming = F.aggregate(
        F.zip_with("_b1", "_b2", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x.cast("int"),
    ).cast("int")
    return (
        cands.join(h1, "media_id_1")
        .join(h2, "media_id_2")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= int(max_hamming))
        .select("media_id_1", "media_id_2", "hamming")
    )


def phash_index(
    df: DataFrame,
    *,
    thumbnailer: Callable[[bytes, str, int], list] = thumbnail_image,
    n_pixels: int = PHASH_PIXELS,
    n_bands: int = PHASH_BANDS,
) -> tuple[DataFrame, DataFrame]:
    """(band index, signature table) for a media corpus — the
    persistable artifacts of the cross-side phash forms, the
    multimodal analog of `dedup.lsh_banded` output + shingle table:

    * index: (base_media_id, band_idx, band_val) — persist bucketed on
      the band key so every ingest's candidate join plans with zero
      base-side exchanges;
    * sigs: (base_media_id, _b_base array<int>) — the packed bands for
      Hamming verify, ~40 bytes/row, persist bucketed on the id.

    Banding is per-row content hashing (no corpus-global state like
    the prefix index's frozen df order), so appending new rows to both
    artifacts IS the rebuild — append ≡ rebuild holds by construction.
    """
    sigs = materialize_once(
        perceptual_hash(
            df, thumbnailer=thumbnailer, n_pixels=n_pixels, n_bands=n_bands
        )
        .filter(F.col("bands").isNotNull())
        .select(
            F.col("media_id").alias("base_media_id"),
            F.col("bands").alias("_b_base"),
        )
        # Materialize once (r13): the index below derives from sigs, so
        # consumers of the (index, sigs) pair otherwise run the
        # decode+hash Arrow stage once per artifact. Lazy, so callers
        # that persist the artifacts still control when it runs.
    )
    index = sigs.select(
        "base_media_id", F.posexplode("_b_base").alias("band_idx", "band_val")
    )
    return index, sigs


def phash_against_index(
    new_df: DataFrame,
    base_index: DataFrame,
    base_sigs: DataFrame,
    *,
    thumbnailer: Callable[[bytes, str, int], list] = thumbnail_image,
    max_hamming: int = 6,
    max_base_bucket_size: int | None = None,
    n_pixels: int = PHASH_PIXELS,
    n_bands: int = PHASH_BANDS,
) -> DataFrame:
    """Perceptual-hash near-dups of a NEW media batch against
    PRECOMPUTED base-corpus artifacts (`phash_index` output) — the
    steady-state multimodal ingest shape ("is this image already in
    the corpus?"), the analog of `dedup.neardup_against_index`. Only
    the new batch pays decode+signature cost; candidates are the
    cross-side band collisions (never new×new, base×base, or
    all-pairs); verify is exact Hamming over the packed bands,
    JVM-side. Same pigeonhole recall contract as
    `phash_neardup_pairs`: distance < n_bands shares a band.

    ``max_base_bucket_size`` drops over-cap BASE buckets (blank-image
    families) before the cross-side join — the cross-side form of the
    degenerate-bucket ceiling; in steady state cap the persisted index
    once at build/append time instead of per ingest.

    Returns (new_media_id, base_media_id, hamming); self-pairs (same
    id on both sides) are excluded.
    """
    from purpleair_data_logger_spark.operators.dedup import (
        keep_buckets_within_cap,
    )

    ph_new = materialize_once(
        perceptual_hash(
            new_df, thumbnailer=thumbnailer, n_pixels=n_pixels, n_bands=n_bands
        )
        .filter(F.col("bands").isNotNull())
        # Materialize once (r13): referenced by both the band explode
        # and the Hamming-verify fetch — see `phash_neardup_pairs`.
    )
    bn = ph_new.select(
        F.col("media_id").alias("new_media_id"),
        F.posexplode("bands").alias("band_idx", "band_val"),
    )
    if max_base_bucket_size is not None:
        base_index = keep_buckets_within_cap(
            base_index, max_base_bucket_size, keys=("band_idx", "band_val")
        )
    cands = (
        bn.join(base_index, on=["band_idx", "band_val"])
        .filter(F.col("new_media_id") != F.col("base_media_id"))
        .select("new_media_id", "base_media_id")
        .distinct()
    )
    hn = ph_new.select(
        F.col("media_id").alias("new_media_id"), F.col("bands").alias("_b_new")
    )
    hamming = F.aggregate(
        F.zip_with(
            "_b_new", "_b_base", lambda x, y: F.bit_count(x.bitwiseXOR(y))
        ),
        F.lit(0),
        lambda acc, x: acc + x.cast("int"),
    ).cast("int")
    return (
        cands.join(hn, "new_media_id")
        .join(base_sigs, "base_media_id")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= int(max_hamming))
        .select("new_media_id", "base_media_id", "hamming")
    )


def phash_neardup_between(
    new_df: DataFrame,
    base_df: DataFrame,
    *,
    thumbnailer: Callable[[bytes, str, int], list] = thumbnail_image,
    max_hamming: int = 6,
    max_base_bucket_size: int | None = None,
    n_pixels: int = PHASH_PIXELS,
    n_bands: int = PHASH_BANDS,
) -> DataFrame:
    """`phash_against_index` with the base artifacts computed inline —
    the one-shot incremental form (the analog of
    `dedup.neardup_lsh_between`). In steady state persist the
    artifacts with `phash_index` and call `phash_against_index` so the
    base corpus is never re-decoded."""
    base_index, base_sigs = phash_index(
        base_df, thumbnailer=thumbnailer, n_pixels=n_pixels, n_bands=n_bands
    )
    return phash_against_index(
        new_df, base_index, base_sigs,
        thumbnailer=thumbnailer, max_hamming=max_hamming,
        max_base_bucket_size=max_base_bucket_size,
        n_pixels=n_pixels, n_bands=n_bands,
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_image(payload: bytes, media_type: str, width: int, height: int) -> bytes:
    """Real resize entry point — STUB: PIL absent here; pass
    resizer=fake_resizer."""
    raise NotImplementedError(
        "image resize requires PIL, not present in this container; "
        "pass resizer=fake_resizer for the deterministic path"
    )


def fake_resizer(payload: bytes, media_type: str, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resampler: width×height bytes
    derived by re-keying the payload digest (same output-size contract
    a real resizer satisfies)."""
    need = width * height
    out = bytearray()
    block = hashlib.sha256(payload or b"").digest()
    while len(out) < need:
        out.extend(block)
        block = hashlib.sha256(block).digest()
    return bytes(out[:need])


def resize_media(
    df: DataFrame,
    *,
    width: int,
    height: int,
    resizer: Callable = resize_image,
) -> DataFrame:
    """Batch resize via `mapInPandas` (1:1): emits the resized binary
    payload + target dims, ready for re-featurizing or storage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    # NULL payload resizes to NULL (fuzz r6): SQL
                    # NULL propagation, not a resample of b""
                    "payload": [
                        resizer(p, mt, width, height) if p is not None else None
                        for p, mt in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)
