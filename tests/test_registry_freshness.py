"""Registry ↔ CORRECTNESS_LOCAL artifact freshness gate
(VERDICT r6 item 9): the tool's pure logic, its artifact selection,
and — as CI-of-record — that the COMMITTED latest artifact actually
covers the live registry (so adding/renaming a query without
re-running tools/check_correctness.py fails the suite, not just the
end-of-round checklist)."""

from __future__ import annotations

import json

from tools.check_registry_freshness import (
    diff_artifact,
    latest_local_artifact,
    main as freshness_main,
    red_rows,
)

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}


def test_diff_names_both_directions():
    d = diff_artifact({"a", "b", "stale"}, {"a", "b", "new"})
    assert d["missing_from_artifact"] == ["new"]
    assert d["orphaned_in_artifact"] == ["stale"]
    clean = diff_artifact({"a"}, {"a"})
    assert clean == {"missing_from_artifact": [],
                     "orphaned_in_artifact": []}


def test_red_rows_flags_err_and_false_but_not_absent_flags():
    art = {
        "ok": dict(GREEN),
        "erred": {**GREEN, "err": "Boom"},
        "hash_off": {**GREEN, "hash_match": False},
        # rows-only queries omit hash/schema flags — still green
        "rows_only": {"rows_match": True, "err": None},
    }
    assert red_rows(art) == ["erred", "hash_off"]


def test_latest_artifact_numeric_not_lexicographic(tmp_path):
    for n in (2, 9, 10):
        (tmp_path / f"CORRECTNESS_LOCAL_r{n:02d}.json").write_text("{}")
    got = latest_local_artifact(str(tmp_path))
    assert got.endswith("CORRECTNESS_LOCAL_r10.json")
    assert latest_local_artifact(str(tmp_path / "empty")) is None


def test_main_exit_codes(tmp_path, capsys):
    import __spark_entry__ as entrymod

    names = list(entrymod._registry())
    fresh = tmp_path / "fresh.json"
    fresh.write_text(json.dumps({n: GREEN for n in names}))
    assert freshness_main([str(fresh)]) == 0
    assert "FRESH" in capsys.readouterr().out

    stale = tmp_path / "stale.json"
    stale.write_text(json.dumps(
        {n: GREEN for n in names[:-1]} | {"ghost_query": GREEN}
    ))
    assert freshness_main([str(stale)]) == 1
    out = capsys.readouterr().out
    assert names[-1] in out and "ghost_query" in out

    assert freshness_main([str(tmp_path / "absent.json")]) == 1


def test_committed_artifact_is_fresh_and_green():
    """CI-of-record: the latest committed CORRECTNESS_LOCAL_r*.json
    must cover the live registry exactly, all rows green. When this
    fails you added/renamed a query — rerun
    ``python -u tools/check_correctness.py --json
    CORRECTNESS_LOCAL_r0N.json`` and commit the artifact with the
    query (the r6 discipline)."""
    import __spark_entry__ as entrymod

    path = latest_local_artifact()
    assert path, "no committed CORRECTNESS_LOCAL artifact"
    with open(path) as fh:
        artifact = json.load(fh)
    d = diff_artifact(set(artifact), set(entrymod._registry()))
    assert d["missing_from_artifact"] == [], d
    assert d["orphaned_in_artifact"] == [], d
    assert red_rows(artifact) == []
