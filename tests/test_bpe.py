"""BPE trainer/encoder tests: exact differential parity against the
independent pure-Python reference implementation (the standard
Sennrich-style trainer over a word-count dict, now shared with the
bpe_learn/bpe_token_counts oracle queries as operators.bpe.ref_learn_bpe),
plus scale-shape and determinism checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gbif_filter_python_spark.operators.bpe import (
    _encode_word_py,
    bpe_token_counts,
    learn_bpe_merges,
    ref_learn_bpe as _ref_learn,
    ref_words as _ref_words,
)


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs, quick!",
    "lowered lower lowest low slower slowest slow",
    "new newer newest news renew renewal",
    "the the the thesis theory there then them",
]


class TestLearnBpeMerges:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
        )

    def test_matches_pure_python_reference(self, spark, docs):
        got = learn_bpe_merges(docs, n_merges=12)
        want = _ref_learn(TEXTS, n_merges=12)
        assert got == want
        assert len(got) == 12  # corpus is rich enough for all 12

    def test_min_count_stops_early(self, spark):
        docs = spark.createDataFrame([(1, "ab ab xz")], "doc_id long, text string")
        got = learn_bpe_merges(docs, n_merges=10, min_count=2)
        # only 'ab' appears twice; 'xz' pairs once
        assert got == [("a", "b", 2)]

    def test_chained_merge_left_to_right(self, spark):
        # 'aaa': merge (a,a) applies left-to-right non-overlapping →
        # ['aa','a'], so the next best pair is ('aa','a')
        docs = spark.createDataFrame(
            [(1, "aaa aaa aaa")], "doc_id long, text string"
        )
        got = learn_bpe_merges(docs, n_merges=2, min_count=2)
        assert got[0][:2] == ("a", "a")
        assert got[1][:2] == ("aa", "a")

    def test_deterministic_across_partitionings(self, spark, docs):
        a = learn_bpe_merges(docs, n_merges=8)
        b = learn_bpe_merges(docs.repartition(7), n_merges=8)
        assert a == b

    def test_sample_target_at_or_above_corpus_is_identity(self, spark, docs):
        """The scale path must be a no-op when the corpus is already at
        or under the target — gate-scale results cannot change."""
        full = learn_bpe_merges(docs, n_merges=8)
        assert learn_bpe_merges(docs, n_merges=8,
                                sample_target_docs=len(TEXTS)) == full
        assert learn_bpe_merges(docs, n_merges=8,
                                sample_target_docs=10_000) == full

    def test_sampled_training_equals_training_on_the_hash_sample(
        self, spark, docs
    ):
        """Differential: sample_target_docs=k must train on EXACTLY the
        deterministic md5 hash-sample (sample_by_hash, salt
        'bpe-train') — same merges as handing the trainer that sample
        directly, and deterministic across partitionings."""
        from gbif_filter_python_spark.operators.corpus import sample_by_hash

        target = 3
        explicit = sample_by_hash(
            docs, "doc_id", target / len(TEXTS), seed_salt="bpe-train"
        )
        n_kept = explicit.count()
        assert 0 < n_kept < len(TEXTS), n_kept  # sample is proper
        got = learn_bpe_merges(docs, n_merges=8, sample_target_docs=target)
        want = learn_bpe_merges(explicit, n_merges=8)
        assert got == want
        assert got == learn_bpe_merges(
            docs.repartition(5), n_merges=8, sample_target_docs=target
        )
        # and the sampled merges match the pure-Python reference run
        # on the sampled texts (parity holds through the scale path)
        kept_texts = [
            TEXTS[r["doc_id"]] for r in explicit.select("doc_id").collect()
        ]
        assert got == _ref_learn(kept_texts, n_merges=8)


class TestBpeTokenCounts:
    def test_counts_match_reference_encoding(self, spark):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
        )
        merges = learn_bpe_merges(docs, n_merges=10)
        ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}
        got = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in bpe_token_counts(docs, merges).collect()
        }
        for i, t in enumerate(TEXTS):
            words = _ref_words(t)
            want_tokens = sum(len(_encode_word_py(w, ranks)) for w in words)
            assert got[i] == (len(words), want_tokens), (i, got[i])

    def test_no_merges_means_char_count(self, spark):
        docs = spark.createDataFrame([(1, "abc de")], "doc_id long, text string")
        row = bpe_token_counts(docs, []).collect()[0]
        assert row["n_words"] == 2 and row["n_bpe_tokens"] == 5
