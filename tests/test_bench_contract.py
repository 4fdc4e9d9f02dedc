"""Mechanical bench-accounting contracts (VERDICT r9 items 2 & 3).

These tests make two previously-informal rules enforceable:

1. The headline set definition in ``bench.py`` must match its own
   documentation: the documented non-headline lines (escape hatches,
   O(n²) verification baselines) are disjoint from the curated
   BENCH_QUERIES list, exist in the registry (so they ARE still
   timed), and every curated name resolves to a registry query.

2. "Every op added in round N must appear in round N's sf10 ladder
   artifact" — r9 laddered the r8 ops but none of its own six, which
   is exactly how the quadratic twonn/hubness shapes shipped without
   a scale witness. The additions of the current round are computed
   mechanically (registry keys minus the previous round's committed
   full-registry correctness key set) and must each appear in some
   ``BENCH_sf10*_r{N}.json``. Run the sf10 ladder BEFORE the
   end-of-round pytest gate — this test is the forcing function.
"""

from __future__ import annotations

import glob
import json
import os

import bench
import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_non_headline_disjoint_from_curated():
    overlap = set(bench.NON_HEADLINE) & set(bench.BENCH_QUERIES)
    assert not overlap, (
        f"{overlap} are documented as non-headline but appear in the "
        "curated BENCH_QUERIES list — the headline definition no "
        "longer matches its documentation"
    )


def test_non_headline_still_timed_and_curated_resolvable():
    reg = set(entrymod.queries())
    assert set(bench.NON_HEADLINE) <= reg
    assert set(bench.BENCH_QUERIES) <= reg
    # the sweep covers the WHOLE registry (non-headline included)
    assert set(bench.bench_query_names()) == reg


def test_every_new_op_this_round_has_an_sf10_ladder_row():
    n = entrymod.CURRENT_ROUND
    prev = os.path.join(REPO, f"CORRECTNESS_LOCAL_r{n - 1:02d}.json")
    if not os.path.exists(prev):
        return  # round 1 shape: nothing to diff against
    with open(prev) as fh:
        prev_keys = set(json.load(fh))
    additions = sorted(set(entrymod.queries()) - prev_keys)
    if not additions:
        return
    laddered: set[str] = set()
    for path in glob.glob(os.path.join(REPO, f"BENCH_sf10*_r{n:02d}.json")):
        with open(path) as fh:
            art = json.load(fh)
        laddered.update(art.get("queries", {}))
        for rung_map in art.get("timings", {}).values():
            laddered.update(rung_map)
    missing = [q for q in additions if q not in laddered]
    assert not missing, (
        f"round {n} added {missing} to the registry without an sf10 "
        f"ladder row (BENCH_sf10*_r{n:02d}.json) — run "
        "tools/bench_scale.py on them before the end-of-round pytest "
        "gate (VERDICT r9 item 2: unladdered new ops are how the "
        "quadratic twonn/hubness shapes shipped)"
    )


def test_batch_chain_is_a_refinement_chain():
    """VERDICT r10 item 5's fix rests on one algebraic fact: every
    element of bench._BATCH_CHAIN divides the next, so md5 % new_n
    exactly REFINES md5 % old_n and a query's co-residents only ever
    shrink as the registry grows. Lock it mechanically."""
    chain = bench._BATCH_CHAIN
    assert chain[0] == 6  # the r8-r10 historical base — never change
    for a, b in zip(chain, chain[1:]):
        assert b % a == 0, (a, b)


def test_n_batches_bounds_every_batch_and_is_chain_member():
    n = bench.n_batches()
    assert n in bench._BATCH_CHAIN
    names = bench.bench_query_names()
    from collections import Counter

    counts = Counter(bench.batch_of(q, n) for q in names)
    assert max(counts.values()) <= bench.MAX_BATCH_QUERIES


def test_refinement_preserves_old_coresidency():
    """Any two queries sharing a batch at n_batches() also shared one
    at EVERY smaller chain element — the cross-round comparability
    guarantee stated in the module docstring."""
    n = bench.n_batches()
    names = bench.bench_query_names()[:40]
    smaller = [c for c in bench._BATCH_CHAIN if c < n]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if bench.batch_of(a, n) == bench.batch_of(b, n):
                for c in smaller:
                    assert bench.batch_of(a, c) == bench.batch_of(b, c)


def test_superlinear_ladder_lines_carry_named_cause_notes():
    """VERDICT r11 item 2: the sf10 ladder contract is ANNOTATED
    ladders — any line whose sf10/sf0.1 ratio exceeds 3x (a 100x data
    step, so 3x is generously sub-linear) must carry a non-empty
    ``notes[query]`` string naming the cause, or super-linear shapes
    ship with a timing nobody has to explain (r9/r10 annotated every
    such line; r11's artifacts initially regressed to bare numbers).
    Applies from round 11 on so historical artifacts stay untouched."""
    for path in glob.glob(os.path.join(REPO, "BENCH_sf10*_r*.json")):
        base = os.path.basename(path)
        round_no = int(base.rsplit("_r", 1)[1].split(".")[0])
        if round_no < 11:
            continue
        with open(path) as fh:
            art = json.load(fh)
        t = art.get("timings", {})
        if "sf0.1" not in t or "sf10" not in t:
            continue
        notes = art.get("notes", {})
        missing = []
        for q, v01 in t["sf0.1"].items():
            v10 = t["sf10"].get(q)
            if v10 is None or not v01 or v01 <= 0:
                continue
            if v10 / v01 > 3 and not str(notes.get(q, "")).strip():
                missing.append((q, round(v10 / v01, 1)))
        assert not missing, (
            f"{base}: ladder lines {missing} scale >3x from sf0.1 to "
            "sf10 but have no named-cause entry in the artifact's "
            "'notes' dict — annotate (sub-linear-vs-data? known "
            "shape? regression?) before committing the artifact"
        )
