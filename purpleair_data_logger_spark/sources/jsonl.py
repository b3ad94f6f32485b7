"""JSONL corpus ingestion with corrupt-record quarantine routing.

The document side of a training-data pipeline arrives as newline-
delimited JSON (Common-Crawl-derived dumps, API exports) where some
fraction of lines is truncated, mis-encoded, or schema-drifted. The
failure policy a 100 TB ingest needs is none of Spark's three stock
modes: FAILFAST kills a day-long job on one bad line, DROPMALFORMED
silently loses data, and plain PERMISSIVE leaves nulls you can't
audit. This source reads PERMISSIVE **with the corrupt line captured**
and splits the stream into a clean frame and a quarantine frame, so
the bad 0.01 % lands in its own sink with the raw line preserved for
replay instead of vanishing or poisoning the run.

Scale shape: `spark.read.json` with an EXPLICIT schema — never
inference, which is a full extra pass over 100 TB before the real one
— is a streaming line scan that splits by file block; the clean/
quarantine split is one cached scan filtered two ways (predicate on
the corrupt column, both frames column-pruned). gzip JSONL is
unsplittable (one task per file — re-shard upstream or prefer zstd
parquet landings); that caveat is the operator's doc contract, not a
runtime surprise.

No reference analog (the reference ingests from a REST API); this is
the north-star source-format surface for the documents table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: Schema of the documents table (TESTDATA.md: doc_id, text, lang,
#: source, n_chars) as its JSONL landing format.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@dataclass(frozen=True)
class JsonlRead:
    clean: DataFrame
    quarantine: DataFrame  # (raw_line, input_file) for audit + replay


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    *,
    require: tuple[str, ...] = (),
) -> JsonlRead:
    """Read JSONL into (clean, quarantine) frames.

    A line is quarantined if it fails to parse (PERMISSIVE captured it
    in ``_corrupt_record``) OR if any column named in ``require`` is
    null after parsing — the schema-drift case where a line is valid
    JSON but missing the fields downstream operators key on (a null
    doc_id would silently fall out of every join).

    Both frames derive from one scan; Spark requires the captured-
    corrupt column to be referenced only after a materializing step,
    so the split caches the parsed frame (at scale: checkpoint to the
    landing zone instead — same contract, durable).
    """
    full_schema = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .withColumn("_input_file", F.input_file_name())
        .cache()
    )
    bad = F.col(CORRUPT_COL).isNotNull()
    for col in require:
        bad = bad | F.col(col).isNull()
    clean = parsed.filter(~bad).select(*[f.name for f in schema.fields])
    quarantine = parsed.filter(bad).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct(*[f.name for f in schema.fields]))).alias(
            "raw_line"
        ),
        F.col("_input_file").alias("input_file"),
    )
    return JsonlRead(clean=clean, quarantine=quarantine)
