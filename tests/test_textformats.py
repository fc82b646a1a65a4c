"""JSONL/CSV bulk sources: pinned schema, malformed-row side channel,
and hand-off into the splitter pipeline."""

from __future__ import annotations

import json

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators import splitter
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import textformats as TF

DOCS = [
    {"doc_id": 1, "text": "alpha beta gamma", "lang": "en", "source": "a",
     "meta": {"k": "v"}},
    {"doc_id": 2, "text": "uno dos tres", "lang": "es", "source": "b",
     "meta": {}},
]


def test_jsonl_good_and_bad_split(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [json.dumps(d) for d in DOCS] + ['{"doc_id": broken', "not json at all"]
    p.write_text("\n".join(lines) + "\n")

    good, bad = TF.read_jsonl_documents(spark, str(p))
    g = {r["doc_id"]: r for r in good.collect()}
    assert set(g) == {1, 2}
    assert g[1]["meta"] == {"k": "v"}
    assert bad.count() == 2


def test_jsonl_feeds_splitter(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    long_text = " ".join(f"tok{i}" for i in range(100))
    p.write_text(json.dumps({"doc_id": 7, "text": long_text, "lang": "en",
                             "source": "s", "meta": {}}) + "\n")
    good, _ = TF.read_jsonl_documents(spark, str(p))
    chunks = splitter.split_documents(good, text_col="text", id_col="doc_id",
                                      size=80, overlap=16)
    rows = chunks.orderBy("chunk_index").collect()
    assert len(rows) > 1
    assert all(len(r["page_content"]) <= 80 for r in rows)
    assert rows[0]["total_chunks"] == len(rows)


def test_csv_good_and_bad_split(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source\n"
        "1,hello world,en,a\n"
        "not_a_number,oops,en,b\n"
        "3,third doc,fr,c\n"
    )
    good, bad = TF.read_csv_documents(spark, str(p))
    ids = sorted(r["doc_id"] for r in good.collect())
    assert ids == [1, 3]
    assert bad.count() == 1
