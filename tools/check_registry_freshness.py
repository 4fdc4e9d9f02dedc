"""Registry ↔ correctness-artifact freshness gate (VERDICT r6 item 9).

The registry doubled in two rounds; a rename/addition that isn't
re-run through ``tools/check_correctness.py`` would silently orphan a
green row (the artifact would still LOOK all-green while no longer
covering ``queries()``). This tool is part of the end-of-round
CI-of-record sequence: it asserts the committed full-registry
artifact's key set EQUALS the live ``__spark_entry__.queries()`` key
set, and that every row in it is green.

Usage::

    python tools/check_registry_freshness.py [ARTIFACT.json]

With no argument it picks the highest-numbered
``CORRECTNESS_LOCAL_r*.json`` in the repo root. Exit 0 = fresh and
green; exit 1 = stale (named diffs printed) or red rows.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_local_artifact(repo: str = REPO) -> str | None:
    """Highest round number wins; ``CORRECTNESS_LOCAL_r10`` must beat
    ``r9`` (lexicographic glob order would not)."""
    paths = glob.glob(os.path.join(repo, "CORRECTNESS_LOCAL_r*.json"))
    best, best_n = None, -1
    for p in paths:
        m = re.search(r"_r0*(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    return best


def diff_artifact(artifact_keys: set[str], registry_keys: set[str]) -> dict:
    """Pure comparison — separated from I/O so it's unit-testable."""
    return {
        "missing_from_artifact": sorted(registry_keys - artifact_keys),
        "orphaned_in_artifact": sorted(artifact_keys - registry_keys),
    }


def red_rows(artifact: dict) -> list[str]:
    """Rows that are not fully green (err, or any *_match flag False;
    rows-only queries legitimately omit hash/schema flags — absent
    flags don't count against them, explicit False does)."""
    bad = []
    for name, row in artifact.items():
        if row.get("err"):
            bad.append(name)
            continue
        if any(
            row.get(k) is False
            for k in ("rows_match", "schema_match", "hash_match")
        ):
            bad.append(name)
    return sorted(bad)


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    path = args[0] if args else latest_local_artifact()
    if not path or not os.path.exists(path):
        print(f"no CORRECTNESS_LOCAL artifact found ({path!r})")
        return 1
    with open(path) as fh:
        artifact = json.load(fh)

    import __spark_entry__ as entrymod

    registry = set(entrymod._registry())
    diffs = diff_artifact(set(artifact), registry)
    bad = red_rows(artifact)
    ok = not diffs["missing_from_artifact"] and not diffs[
        "orphaned_in_artifact"
    ] and not bad
    if diffs["missing_from_artifact"]:
        print(
            f"STALE: {len(diffs['missing_from_artifact'])} registry "
            f"queries missing from {os.path.basename(path)}: "
            + ", ".join(diffs["missing_from_artifact"])
        )
    if diffs["orphaned_in_artifact"]:
        print(
            f"STALE: {len(diffs['orphaned_in_artifact'])} artifact rows "
            "no longer in the registry: "
            + ", ".join(diffs["orphaned_in_artifact"])
        )
    if bad:
        print(f"RED: {len(bad)} non-green rows: " + ", ".join(bad))
    if ok:
        print(
            f"FRESH: {os.path.basename(path)} covers all "
            f"{len(registry)} registry queries, all green"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
