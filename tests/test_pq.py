"""Product quantization (operators/similarity.py PQ block).

Invariant/differential tests backing the rows-reduced pq_search
oracle: deterministic training, monotone Lloyd distortion, code-shape
contracts, ADC-vs-exact agreement on planted structure, and the
rerank stage recovering exact order on its shortlist.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gbif_filter_python_spark.operators.similarity import (
    brute_force_topk,
    pq_encode,
    pq_search,
    pq_topk,
    pq_train,
)


def _vectors(spark, n=120, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    # two well-separated gaussian blobs + noise dims
    rows = []
    for i in range(n):
        center = 1.0 if i % 2 == 0 else -1.0
        v = rng.normal(center, 0.3, dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestPQTrain:
    def test_deterministic_across_runs(self, spark):
        df = _vectors(spark)
        b1, h1 = pq_train(df, m=4, ksub=8, max_iter=4)
        b2, h2 = pq_train(df, m=4, ksub=8, max_iter=4)
        assert b1 == b2 and h1 == h2

    def test_distortion_monotone_nonincreasing(self, spark):
        df = _vectors(spark)
        _, hist = pq_train(df, m=4, ksub=8, max_iter=6)
        assert all(a >= b - 1e-9 for a, b in zip(hist, hist[1:]))

    def test_shape_and_validation(self, spark):
        df = _vectors(spark, dim=16)
        books, _ = pq_train(df, m=4, ksub=8, max_iter=2)
        arr = np.asarray(books)
        assert arr.shape == (4, 8, 4)
        with pytest.raises(ValueError, match="not divisible"):
            pq_train(df, m=5, ksub=8)
        with pytest.raises(ValueError, match="only"):
            pq_train(df.limit(3), m=4, ksub=8)


class TestPQEncode:
    def test_codes_in_range_and_true_norm(self, spark):
        df = _vectors(spark)
        books, _ = pq_train(df, m=4, ksub=8, max_iter=3)
        enc = pq_encode(df, books).collect()
        assert len(enc) == df.count()
        raw = {r.vec_id: r.embedding for r in df.collect()}
        for r in enc:
            assert len(r.codes) == 4
            assert all(0 <= c < 8 for c in r.codes)
            assert r.norm == pytest.approx(
                float(np.linalg.norm(raw[r.vec_id])), rel=1e-9
            )

    def test_reconstruction_separates_planted_blobs(self, spark):
        # docs from blob A must decode closer to A's centroid region
        df = _vectors(spark)
        books, _ = pq_train(df, m=4, ksub=8, max_iter=6)
        b = np.asarray(books)
        enc = {r.vec_id: r.codes for r in pq_encode(df, books).collect()}
        raw = {r.vec_id: np.array(r.embedding) for r in df.collect()}
        errs = []
        for vid, codes in enc.items():
            recon = np.concatenate([b[s][codes[s]] for s in range(4)])
            errs.append(
                np.linalg.norm(recon - raw[vid])
                / max(np.linalg.norm(raw[vid]), 1e-12)
            )
        # quantization error well below the blob separation
        assert float(np.mean(errs)) < 0.5


class TestPQSearch:
    def test_adc_topk_matches_blob_structure(self, spark):
        df = _vectors(spark)
        books, _ = pq_train(df, m=4, ksub=8, max_iter=6)
        enc = pq_encode(df, books)
        q = df.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        got = pq_topk(enc, q, books, k=11).filter(
            "vec_id != query_id"
        ).collect()
        # query 0 is blob-even, query 1 blob-odd: neighbors must share
        # the blob (same parity) overwhelmingly
        for qid in (0, 1):
            neigh = [r.vec_id for r in got if r.query_id == qid][:10]
            same = sum(1 for v in neigh if v % 2 == qid % 2)
            assert same >= 9

    def test_rerank_recall_beats_pure_adc(self, spark):
        df = _vectors(spark)
        books, _ = pq_train(df, m=4, ksub=8, max_iter=6)
        q = df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        truth = {
            (r.query_id, r.vec_id)
            for r in brute_force_topk(df, q, k=11)
            .filter("vec_id != query_id")
            .collect()
        }

        def recall(res):
            hits = sum(1 for r in res if (r.query_id, r.vec_id) in truth)
            return hits / len(truth)

        adc = (
            pq_topk(pq_encode(df, books), q, books, k=11)
            .filter("vec_id != query_id")
            .collect()
        )
        rr = (
            pq_search(df, q, books, k=11, shortlist_mult=5)
            .filter("vec_id != query_id")
            .collect()
        )
        assert recall(rr) >= recall(adc)
        assert recall(rr) >= 0.8

    def test_rerank_scores_are_exact_cosine(self, spark):
        df = _vectors(spark)
        books, _ = pq_train(df, m=4, ksub=8, max_iter=4)
        q = df.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        got = pq_search(df, q, books, k=5, shortlist_mult=5).collect()
        raw = {r.vec_id: np.array(r.embedding) for r in df.collect()}
        qv = raw[0]
        for r in got:
            exact = float(
                np.dot(qv, raw[r.vec_id])
                / (np.linalg.norm(qv) * np.linalg.norm(raw[r.vec_id]))
            )
            assert r.cosine == pytest.approx(exact, abs=1e-9)


class TestKcenterCoreset:
    def _vecs(self, n=40, dim=6):
        # deterministic spread-out vectors with one far outlier
        rows = []
        for i in range(n):
            v = [((i * 31 + j * 17) % 97) / 97.0 for j in range(dim)]
            rows.append((i, v))
        rows.append((n, [50.0] * dim))  # the obvious first pick
        return rows

    def test_bit_exact_vs_replay(self, spark):
        from gbif_filter_python_spark.operators.similarity import (
            kcenter_coreset,
            ref_kcenter,
        )

        rows = self._vecs()
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        got = [
            (r["step"], r["vec_id"], r["radius"])
            for r in kcenter_coreset(df, k=6).orderBy("step").collect()
        ]
        assert got == ref_kcenter(rows, 6)
        # seed is the lowest id; the outlier is picked first after it
        assert got[0] == (0, 0, 0.0)
        assert got[1][1] == rows[-1][0]
        # covering-radius trace is non-increasing after the first pick
        radii = [g[2] for g in got[1:]]
        assert all(a >= b for a, b in zip(radii, radii[1:]))

    def test_k_one_and_validation(self, spark):
        import pytest as _p

        from gbif_filter_python_spark.operators.similarity import (
            kcenter_coreset,
        )

        df = spark.createDataFrame(
            [(3, [1.0]), (7, [2.0])], "vec_id long, embedding array<double>"
        )
        out = kcenter_coreset(df, k=1).collect()
        assert [(r["step"], r["vec_id"], r["radius"]) for r in out] == [
            (0, 3, 0.0)
        ]
        with _p.raises(ValueError, match="k must"):
            kcenter_coreset(df, k=0)


class TestIvfPqSearch:
    """IVF-PQ composite (ivf_pq_search): probe restriction, full-probe
    equivalence with pq_search, and exact-cosine rerank output."""

    def _centroids(self, spark, df):
        # two blob-mean centroids from the planted even/odd structure
        return (
            df.withColumn("label", (F.col("vec_id") % 2).cast("int"))
            .select("label", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("label", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("label")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid_vec")
            )
            .select(F.col("label").alias("centroid_id"), "centroid_vec")
        )

    def test_full_probe_equals_pq_search(self, spark):
        from gbif_filter_python_spark.operators.similarity import (
            ivf_pq_search,
        )

        df = _vectors(spark)
        cen = self._centroids(spark, df)
        books, _ = pq_train(df, m=4, ksub=8, max_iter=4)
        queries = df.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        # n_probe = |lists|: every list scanned -> the ADC shortlist
        # and the reranked top-k must match plain pq_search exactly
        composite = {
            (r["query_id"], r["vec_id"], r["rank"])
            for r in ivf_pq_search(
                df, queries, cen, books, k=5, n_probe=2,
                shortlist_mult=4,
            ).collect()
        }
        flat = {
            (r["query_id"], r["vec_id"], r["rank"])
            for r in pq_search(
                df, queries, books, k=5, shortlist_mult=4
            ).collect()
        }
        assert composite == flat and len(composite) > 0

    def test_single_probe_restricts_to_probed_list(self, spark):
        from gbif_filter_python_spark.operators.similarity import (
            ivf_assign,
            ivf_pq_search,
        )

        df = _vectors(spark)
        cen = self._centroids(spark, df)
        books, _ = pq_train(df, m=4, ksub=8, max_iter=4)
        queries = df.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        assigned = {
            r["vec_id"]: r["centroid_id"]
            for r in ivf_assign(df, cen).select(
                "vec_id", "centroid_id"
            ).collect()
        }
        got = ivf_pq_search(
            df, queries, cen, books, k=5, n_probe=1, shortlist_mult=4
        ).collect()
        assert len(got) > 0
        for r in got:
            # the planted blobs align with parity; a 1-probe search
            # from query q must only return vectors from q's own list
            assert assigned[r["vec_id"]] == assigned[r["query_id"]], r

    def test_recall_floor_and_exact_rerank_scores(self, spark):
        from gbif_filter_python_spark.operators.similarity import (
            ivf_pq_search,
        )
        from gbif_filter_python_spark.functions.vectors import (
            cosine_similarity,
        )

        df = _vectors(spark)
        cen = self._centroids(spark, df)
        books, _ = pq_train(df, m=4, ksub=8, max_iter=4)
        queries = df.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        got = ivf_pq_search(
            df, queries, cen, books, k=6, n_probe=1, shortlist_mult=6
        )
        rows = got.collect()
        truth = {
            (r["query_id"], r["vec_id"])
            for r in brute_force_topk(df, queries, k=6).collect()
        }
        hits = sum(1 for r in rows if (r["query_id"], r["vec_id"]) in truth)
        assert hits / len(rows) >= 0.5  # blobs are easy; floor is lax
        # rerank scores are EXACT cosine of the raw vectors
        vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
        for r in rows:
            q = np.array(vecs[r["query_id"]])
            v = np.array(vecs[r["vec_id"]])
            want = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
            assert abs(r["cosine"] - want) < 1e-9
