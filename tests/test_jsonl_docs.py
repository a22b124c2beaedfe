"""JSONL ingestion with quarantine (sources/jsonl_docs.py): good rows
parse to the declared schema, malformed lines land in rejects with
their raw text, nothing is silently dropped."""

from __future__ import annotations

from factory_inspectors_db_etl_spark.sources.jsonl_docs import read_jsonl_docs


def test_jsonl_quarantine_split(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}',
        'this is not json at all',
        '{"doc_id": 2, "text": "zweite zeile", "lang": "de", "source": "web"}',
        '{"doc_id": 3, "text": "truncated...',
        '{"doc_id": 4, "text": "ok", "lang": "en", "source": "pdf"}',
    ]
    p.write_text("\n".join(lines) + "\n")

    out = read_jsonl_docs(spark, str(p))
    docs = out["docs"].collect()
    rejects = out["rejects"].collect()

    assert sorted(r.doc_id for r in docs) == [1, 2, 4]
    assert {r.lang for r in docs} == {"en", "de"}
    assert len(rejects) == 2
    raws = sorted(r.raw_line for r in rejects)  # 't' < '{' in ASCII
    assert raws[0] == "this is not json at all"
    assert raws[1].startswith('{"doc_id": 3')
    assert all(r.source_file.endswith("docs.jsonl") for r in rejects)
    # conservation: every input line is accounted for exactly once
    assert len(docs) + len(rejects) == len(lines)


def test_jsonl_roundtrip_documents_table(spark, sf_dir, tmp_path):
    """The synthetic documents table written as JSONL reads back
    row-identical through the quarantine reader (zero rejects)."""
    from pyspark.sql import functions as F

    from factory_inspectors_db_etl_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    out_dir = str(tmp_path / "docs_jsonl")
    d.write.json(out_dir)
    back = read_jsonl_docs(spark, out_dir)
    assert back["rejects"].count() == 0
    got = back["docs"].select("doc_id", "text", "lang", "source")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, d.collect()))
