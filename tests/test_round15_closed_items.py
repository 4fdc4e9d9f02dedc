"""Proof tests closing VERDICT r14 items 3 and 4 — the two
"measure it, and if equivalence is impossible, document the proof and
close the item" audits. Both are pure-Python (no Spark): each pins a
concrete counterexample showing the proposed optimization cannot
preserve declared-query output, so the current shapes stay.

Item 3 — bpe_learn batching: applying the snapshot's top-k merges per
count pass diverges from sequential BPE, because a merge (a) creates
NEW pairs (x, ab)/(ab, y) that did not exist in the snapshot and can
out-count the snapshot's #2, and (b) consumes the occurrences backing
other snapshot pairs, leaving them stale. The counterexample makes
the sequential trainer's 2nd merge a pair the batch could not have
selected (it did not exist when counts were taken).

Item 4 — kmeans/pq Lloyd fusion: a fused assign+partial-sum pandas
UDF changes double-summation order; the 9dp centroid rounding does
NOT absorb that, because a mean can land within one ulp of a 9dp
rounding boundary — two valid summation orders then round to
different models, and the next iteration's assignment diverges.
"""

from __future__ import annotations

import numpy as np

from gbif_filter_python_spark.operators.bpe import ref_learn_bpe


def _batched_ref_learn_bpe(texts, n_merges, batch=2, min_count=2):
    """The proposed batched trainer: recompute pair counts once per
    batch, apply the snapshot's top-``batch`` non-stale merges."""
    import collections

    from gbif_filter_python_spark.operators.bpe import ref_words

    counts = collections.Counter(
        w for t in texts for w in ref_words(t)
    )
    segs = {w: list(w) for w in counts}
    merges = []

    def apply(a, b):
        for w, syms in segs.items():
            out, prev = [], None
            for x in syms:
                if prev == a and x == b:
                    out.append(a + b)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            segs[w] = out

    while len(merges) < n_merges:
        pair_counts = collections.Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += counts[w]
        if not pair_counts:
            break
        ranked = sorted(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        took = 0
        for (a, b), n in ranked:
            if took >= batch or len(merges) >= n_merges:
                break
            if n < min_count:
                return merges
            merges.append((a, b, n))
            apply(a, b)
            took += 1
        if took == 0:
            break
    return merges


def test_bpe_batched_merges_diverge_from_sequential():
    """VERDICT r14 item 3 counterexample. Corpus: 'x a b y' ×10 and
    'c d' ×9. Snapshot counts: (a,b)=10, (x,a)=10, (b,y)=10, (c,d)=9;
    tie-break picks (a,b) first. Sequential merge 2 is then (ab,y)=10
    — a pair that did NOT exist in the snapshot. A batch of 2 from
    the snapshot instead applies (b,y) (stale: zero occurrences left
    after (a,b) consumed every b). Identical-output batching is
    therefore impossible without per-merge count recomputation, which
    IS the sequential algorithm — the one-aggregation-job-per-merge
    floor stands."""
    texts = ["x a b y"] * 10 + ["c d"] * 9
    # ref_words normalizes per WORD; craft words whose characters are
    # the symbols: use 'xaby' and 'cd' as single words instead
    texts = ["xaby"] * 10 + ["cd"] * 9
    seq = ref_learn_bpe(texts, n_merges=2)
    bat = _batched_ref_learn_bpe(texts, n_merges=2, batch=2)
    assert seq[0] == ("a", "b", 10)
    assert seq[1] == ("ab", "y", 10)  # born from merge 1
    assert bat[0] == ("a", "b", 10)
    assert bat[1] != seq[1], (seq, bat)
    # the batch's second merge was stale at apply time: the snapshot
    # said 10, but after merge 1 its true count is 0
    assert bat[1][0] == "b" and bat[1][1] == "y"


def test_lloyd_9dp_rounding_does_not_absorb_summation_order():
    """VERDICT r14 item 4 disproof. kmeans_fit rounds centroid means
    to 9dp for cross-partitioning reproducibility; a fused
    assign+partial-sum UDF would sum cluster members in a different
    order than the current posexplode + JVM hash aggregation.
    Concrete witness: a 3-member cluster (tiny clusters are routine
    in Lloyd) with unit-range components and catastrophic
    cancellation whose mean sits within one ulp of a 9dp rounding
    boundary — two valid summation orders round to DIFFERENT
    centroids (6.99e-07 vs 6.98e-07), so the fused model is not the
    declared model and the fusion is off the table (the 9dp round
    pins ONE evaluation order for reproducibility; it is not an
    order-independence guarantee)."""
    a = 0.5000006771328125
    b = -0.8631878140271159
    c = 0.3631892323943034
    assert all(abs(x) <= 1.0 for x in (a, b, c))  # legit components
    mean_ab_c = ((a + b) + c) / 3  # e.g. partition layout [a b][c]
    mean_ac_b = ((a + c) + b) / 3  # e.g. partition layout [a c][b]
    assert round(mean_ab_c, 9) != round(mean_ac_b, 9), (
        mean_ab_c,
        mean_ac_b,
    )
    # numpy reductions over the two layouts disagree the same way
    m1 = float(np.add.reduce(np.array([a, b, c]))) / 3
    m2 = float(np.add.reduce(np.array([a, c, b]))) / 3
    assert round(m1, 9) != round(m2, 9)
