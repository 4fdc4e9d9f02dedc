"""Unit tests for oov_rate and corpus_datasheet — hand-built corpora
where vocabulary membership and duplicate structure are known."""

from __future__ import annotations

from gbif_filter_python_spark.operators.corpus import corpus_datasheet, oov_rate


def test_oov_rate_known_vocab(spark):
    # vocab_size=2 -> top terms by (freq desc, term): 'aa' (4), 'bb' (2).
    docs = spark.createDataFrame(
        [
            (1, "aa aa bb zz"),
            (2, "aa bb cc"),
            (3, "aa"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in oov_rate(docs, vocab_size=2).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1
    assert out[1]["oov_rate"] == 0.25
    assert out[2]["n_oov"] == 1  # cc
    assert out[3]["n_oov"] == 0 and out[3]["oov_rate"] == 0.0


def test_oov_rate_empty_docs_absent(spark):
    docs = spark.createDataFrame(
        [(1, "aa"), (2, "   "), (3, "")], ["doc_id", "text"]
    )
    ids = {r["doc_id"] for r in oov_rate(docs, vocab_size=10).collect()}
    assert ids == {1}


def test_corpus_datasheet_dup_and_lang_mix(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello World", "en", "a"),
            (2, "hello   world!", "en", "a"),  # normalized dup of 1
            (3, "bonjour", "fr", "a"),
            (4, "unique text", "en", "b"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    out = {r["src"]: r for r in corpus_datasheet(docs).collect()}
    a = out["a"]
    assert a["n_docs"] == 3 and a["n_distinct_texts"] == 2
    assert a["dup_rate"] == round(1 - 2 / 3, 6)
    assert a["pct_en"] == round(2 / 3, 4)
    assert a["total_tokens"] == 2 + 2 + 1
    b = out["b"]
    assert b["n_docs"] == 1 and b["dup_rate"] == 0.0 and b["avg_tokens"] == 2.0
