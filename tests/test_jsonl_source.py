"""JSONL source: corrupt lines and schema-drifted lines route to the
quarantine frame with the raw line preserved; clean rows parse with
the explicit schema (no inference pass)."""

from __future__ import annotations

import pytest

from purpleair_data_logger_spark.sources import jsonl


@pytest.fixture()
def jsonl_dir(tmp_path):
    good = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "src0", "n_chars": 11}',
        '{"doc_id": 2, "text": "hallo welt", "lang": "de", "source": "src1", "n_chars": 10}',
    ]
    bad_parse = '{"doc_id": 3, "text": "tru'
    drifted = '{"text": "no id here", "lang": "en", "source": "src2"}'
    (tmp_path / "part-0.jsonl").write_text(
        "\n".join([good[0], bad_parse, good[1], drifted]) + "\n"
    )
    return str(tmp_path)


def test_clean_and_quarantine_split(spark, jsonl_dir):
    rd = jsonl.read_jsonl(spark, jsonl_dir, require=("doc_id", "text"))
    clean = {r["doc_id"]: r for r in rd.clean.collect()}
    assert set(clean) == {1, 2}
    assert clean[1]["text"] == "hello world"
    assert rd.clean.columns == ["doc_id", "text", "lang", "source", "n_chars"]

    quarantined = rd.quarantine.collect()
    assert len(quarantined) == 2
    raws = sorted(r["raw_line"] for r in quarantined)
    # the truncated line is preserved verbatim for replay
    assert any(r.endswith('"tru') for r in raws)
    # the drifted (valid-JSON, missing doc_id) line is auditable too
    assert any("no id here" in r for r in raws)
    assert all(r["input_file"].endswith("part-0.jsonl") for r in quarantined)


def test_without_require_only_parse_failures_quarantine(spark, jsonl_dir):
    rd = jsonl.read_jsonl(spark, jsonl_dir)
    assert rd.clean.count() == 3  # drifted line is clean when ids not required
    assert rd.quarantine.count() == 1


def test_explicit_schema_no_inference_pass(spark, jsonl_dir):
    rd = jsonl.read_jsonl(spark, jsonl_dir)
    # schema comes from the declaration, not the data
    assert [f.simpleString() for f in rd.clean.schema.fields] == [
        "doc_id:bigint",
        "text:string",
        "lang:string",
        "source:string",
        "n_chars:bigint",
    ]
