"""BM25 + reciprocal-rank-fusion retrieval (operators/ranking.py).

Known-value BM25 math against an independent pure-Python computation,
ranking semantics (rare terms dominate, self-retrieval wins), and RRF
fusion arithmetic including single-list membership.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gbif_filter_python_spark.operators.ranking import (
    bm25_scores,
    bm25_top_docs,
    rrf_fuse,
)

DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "cherry cherry cherry durian"),
    (3, "apple durian"),
]


def _py_bm25(query_terms, k1=1.2, b=0.75):
    """Independent reference computation over DOCS."""
    toks = {d: t.split() for d, t in DOCS}
    n = float(len(toks))
    dl = {d: len(w) for d, w in toks.items()}
    avgdl = sum(dl.values()) / n
    df: dict[str, int] = {}
    for w in toks.values():
        for t in set(w):
            df[t] = df.get(t, 0) + 1
    out: dict[int, float] = {}
    for d, w in toks.items():
        s = 0.0
        for t in set(query_terms):
            tf = w.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            c = idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * dl[d] / avgdl)
            )
            s += round(c, 6)
        if s:
            out[d] = round(s, 6)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


class TestBm25:
    def test_known_values_match_reference(self, spark, docs_df):
        probes = spark.createDataFrame(
            [(100, "apple cherry")], ["query_id", "text"]
        )
        got = {
            r.doc_id: r.bm25
            for r in bm25_scores(docs_df, probes).collect()
        }
        want = _py_bm25(["apple", "cherry"])
        assert got == pytest.approx(want, abs=2e-6)

    def test_self_retrieval_ranks_first(self, spark, docs_df):
        probes = docs_df.select(
            F.col("doc_id").alias("query_id"), "text"
        )
        top1 = (
            bm25_top_docs(docs_df, probes, k=1)
            .select("query_id", "doc_id")
            .collect()
        )
        # Every doc is its own best match on this corpus (no doc is a
        # strict superset of another's term profile).
        assert {r.query_id: r.doc_id for r in top1} == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_rare_term_outweighs_common(self, spark, docs_df):
        # 'durian' (df=2) should pull docs 2,3 above docs lacking it
        # for a pure-durian query; docs without the term score nothing.
        probes = spark.createDataFrame([(9, "durian")], ["query_id", "text"])
        rows = bm25_scores(docs_df, probes).collect()
        assert {r.doc_id for r in rows} == {2, 3}

    def test_blank_and_unknown_query_terms_score_nothing(self, spark, docs_df):
        probes = spark.createDataFrame(
            [(1, "zzz qqq"), (2, "   ")], ["query_id", "text"]
        )
        assert bm25_scores(docs_df, probes).count() == 0


class TestRrf:
    def test_fusion_math_and_membership(self, spark):
        a = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2)], ["query_id", "doc_id", "rank"]
        )
        b = spark.createDataFrame(
            [(1, 11, 1), (1, 12, 2)], ["query_id", "doc_id", "rank"]
        )
        rows = {
            r.doc_id: r
            for r in rrf_fuse([a, b], k=60).collect()
        }
        assert rows[11].rrf == pytest.approx(1 / 61 + 1 / 62, abs=1e-9)
        assert rows[10].rrf == pytest.approx(1 / 61, abs=1e-9)
        assert rows[12].rrf == pytest.approx(1 / 62, abs=1e-9)
        assert (rows[11].n_lists, rows[10].n_lists, rows[12].n_lists) == (
            2,
            1,
            1,
        )
        # Both-lists doc leads; the two single-list docs order by the
        # reciprocal of their rank, tie-broken by id.
        assert [rows[d].rank for d in (11, 10, 12)] == [1, 2, 3]

    def test_top_truncation_and_empty_input(self, spark):
        a = spark.createDataFrame(
            [(1, i, i) for i in range(1, 6)], ["query_id", "doc_id", "rank"]
        )
        assert rrf_fuse([a], top=2).count() == 2
        with pytest.raises(ValueError):
            rrf_fuse([])


class TestRetrievalMetrics:
    def test_known_metrics(self, spark):
        from gbif_filter_python_spark.operators.ranking import (
            retrieval_metrics,
        )

        results = spark.createDataFrame(
            [
                # q1: relevant docs at ranks 2 and 5
                (1, 101, 1), (1, 102, 2), (1, 103, 3), (1, 104, 4),
                (1, 105, 5),
                # q2: no relevant in top-k
                (2, 201, 1), (2, 202, 2),
                # q3: relevant at rank 1, but more rel docs exist
                (3, 301, 1), (3, 302, 2),
            ],
            "query_id int, doc_id int, rank int",
        )
        qrels = spark.createDataFrame(
            [(1, 102), (1, 105), (1, 999), (2, 999), (3, 301), (3, 888),
             (3, 777)],
            "query_id int, doc_id int",
        )
        out = {
            r["query_id"]: r
            for r in retrieval_metrics(results, qrels, k=5).collect()
        }
        q1 = out[1]
        assert q1["n_rel"] == 3 and q1["n_hits"] == 2
        assert q1["precision_at_k"] == 0.4
        assert abs(q1["recall_at_k"] - 2 / 3) < 1e-6
        assert q1["rr_at_k"] == 0.5
        q2 = out[2]
        assert q2["n_hits"] == 0 and q2["rr_at_k"] == 0.0
        assert q2["recall_at_k"] == 0.0
        q3 = out[3]
        assert q3["rr_at_k"] == 1.0
        assert abs(q3["recall_at_k"] - 1 / 3) < 1e-6

    def test_cutoff_excludes_deeper_hits(self, spark):
        from gbif_filter_python_spark.operators.ranking import (
            retrieval_metrics,
        )

        results = spark.createDataFrame(
            [(1, 11, 1), (1, 22, 7)], "query_id int, doc_id int, rank int"
        )
        qrels = spark.createDataFrame([(1, 22)], "query_id int, doc_id int")
        out = retrieval_metrics(results, qrels, k=5).first()
        assert out["n_hits"] == 0 and out["rr_at_k"] == 0.0


class TestRbo:
    def _rank_df(self, spark, data):
        return spark.createDataFrame(
            data, "query_id long, doc_id long, rank int"
        )

    def test_identical_rankings_closed_form(self, spark):
        """Conjoint identical lists truncated at depth D score
        (1-p)*sum p^(d-1) = 1 - p^D exactly."""
        from gbif_filter_python_spark.operators.ranking import rbo_overlap

        a = self._rank_df(
            spark, [(1, d, r) for r, d in enumerate(range(100, 110), 1)]
        )
        got = rbo_overlap(a, a, p=0.9, depth=10).first()
        assert got["n_common"] == 10
        assert got["rbo"] == round(1 - 0.9 ** 10, 6)

    def test_disjoint_rankings_zero_not_dropped(self, spark):
        from gbif_filter_python_spark.operators.ranking import rbo_overlap

        a = self._rank_df(spark, [(1, 1, 1), (1, 2, 2)])
        b = self._rank_df(spark, [(1, 8, 1), (1, 9, 2)])
        got = rbo_overlap(a, b, p=0.9, depth=10).first()
        assert got["n_common"] == 0 and got["rbo"] == 0.0

    def test_matches_per_depth_brute_force(self, spark):
        """The closed-form tail-weight reformulation must equal the
        definitional per-depth prefix-intersection sum."""
        from gbif_filter_python_spark.operators.ranking import rbo_overlap

        ra = {1: [5, 3, 9, 7, 1], 2: [10, 11, 12]}
        rb = {1: [3, 5, 7, 2, 9], 2: [12, 13, 10]}
        p, depth = 0.8, 4
        a = self._rank_df(
            spark,
            [(q, d, r) for q, ds in ra.items()
             for r, d in enumerate(ds, 1)],
        )
        b = self._rank_df(
            spark,
            [(q, d, r) for q, ds in rb.items()
             for r, d in enumerate(ds, 1)],
        )
        got = {r["query_id"]: r["rbo"]
               for r in rbo_overlap(a, b, p=p, depth=depth).collect()}
        for q in ra:
            brute = (1 - p) * sum(
                p ** (d - 1)
                * len(set(ra[q][:d]) & set(rb[q][:d])) / d
                for d in range(1, depth + 1)
            )
            assert got[q] == round(brute, 6)

    def test_validation(self, spark):
        import pytest as _p

        from gbif_filter_python_spark.operators.ranking import rbo_overlap

        a = self._rank_df(spark, [(1, 1, 1)])
        with _p.raises(ValueError, match="p must"):
            rbo_overlap(a, a, p=1.0)
        with _p.raises(ValueError, match="depth"):
            rbo_overlap(a, a, depth=0)


class TestNdcgAtK:
    def test_perfect_vs_inverted_order(self, spark):
        from gbif_filter_python_spark.operators.ranking import ndcg_at_k

        qrels = spark.createDataFrame(
            [(1, 10, 3), (1, 11, 2), (1, 12, 1)],
            "query_id long, doc_id long, rel int",
        )
        perfect = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id long, doc_id long, rank int",
        )
        inverted = spark.createDataFrame(
            [(1, 12, 1), (1, 11, 2), (1, 10, 3)],
            "query_id long, doc_id long, rank int",
        )
        (p,) = ndcg_at_k(perfect, qrels, k=10).collect()
        (i,) = ndcg_at_k(inverted, qrels, k=10).collect()
        assert p["ndcg_at_k"] == 1.0
        import math

        idcg = 7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
        dcg_inv = 1 / math.log2(2) + 3 / math.log2(3) + 7 / math.log2(4)
        assert abs(p["idcg_at_k"] - idcg) < 1e-6
        assert abs(i["ndcg_at_k"] - dcg_inv / idcg) < 1e-6
        # binary P/R couldn't separate these two rankings; nDCG must
        assert i["ndcg_at_k"] < p["ndcg_at_k"]

    def test_no_hits_scores_zero_and_k_cutoff(self, spark):
        from gbif_filter_python_spark.operators.ranking import ndcg_at_k

        qrels = spark.createDataFrame(
            [(1, 10, 2), (2, 20, 3)],
            "query_id long, doc_id long, rel int",
        )
        res = spark.createDataFrame(
            [(1, 99, 1), (2, 20, 4)],
            "query_id long, doc_id long, rank int",
        )
        out = {r["query_id"]: r for r in ndcg_at_k(res, qrels, k=3).collect()}
        assert out[1]["dcg_at_k"] == 0.0
        assert out[1]["ndcg_at_k"] == 0.0
        # query 2's only hit is at rank 4 > k → also zero
        assert out[2]["ndcg_at_k"] == 0.0

    def test_zero_rel_grade_contributes_nothing(self, spark):
        from gbif_filter_python_spark.operators.ranking import ndcg_at_k

        qrels = spark.createDataFrame(
            [(1, 10, 0), (1, 11, 1)],
            "query_id long, doc_id long, rel int",
        )
        res = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2)],
            "query_id long, doc_id long, rank int",
        )
        (r,) = ndcg_at_k(res, qrels, k=10).collect()
        import math

        # gain(rel=0) = 0; only doc 11 at rank 2 counts
        assert abs(r["dcg_at_k"] - 1 / math.log2(3)) < 1e-6
        assert abs(r["idcg_at_k"] - 1 / math.log2(2)) < 1e-6
