"""Physical-plan inspection — make plan quality testable.

The 100 TB design rules (SURVEY.md §4.3, repo brief) are assertions
about *plans*, not results: filters must reach the parquet scan
(PushedFilters), small dims must broadcast, hot expressions must stay
inside WholeStageCodegen, and nothing should go cartesian. These
helpers expose those properties so tests/benchmarks can enforce them
instead of eyeballing ``df.explain()``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (PySpark only prints it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    text = explain_str(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of FORCED broadcast hints in the analyzed logical plan.

    Counts ``ResolvedHint`` nodes — i.e. explicit ``F.broadcast(...)``
    calls — not broadcasts AQE/Catalyst choose on their own. The scale
    rule under test: a hint is only allowed on sides whose size is
    bounded by a dimension (|taxonomy|), never on sides that scale with
    the caller's input cardinality.
    """
    plan = df._jdf.queryExecution().analyzed().toString()  # type: ignore[attr-defined]
    return plan.count("ResolvedHint")


def codegen_stage_count(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", explain_str(df, "simple")))


def assert_no_cartesian(df: DataFrame) -> None:
    """Raise if the plan contains a cartesian/broadcast-nested-loop
    join that is NOT an intentional small-side crossJoin."""
    text = explain_str(df, "simple")
    if "CartesianProduct" in text:
        raise AssertionError("plan contains CartesianProduct:\n" + text)
