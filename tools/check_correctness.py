"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
row-count + schema + order-insensitive value-hash against its
``oracle_sql()`` DuckDB twin. Usage:

    python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from gbif_filter_python_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows → hashable."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(lambda v: repr(v) if isinstance(v, (list, tuple)) else v)
        if str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[us]")
        if col.dtype == "float32":
            df[c] = col.astype("float64")
    df = df.astype(object).where(pd.notnull(df), None)
    rows = sorted(repr(tuple(r)) for r in df.itertuples(index=False, name=None))
    return rows


def value_hash(rows: list[str]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
    return h.hexdigest()


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    only = set(args)
    results: dict[str, dict] = {}
    spark = get_spark(app_name="correctness-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc()
            failures += 1
            results[name] = {"err": "spark_raised"}
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(sdf)} rows)")
            if len(sdf) == 0:
                print(f"WARN  {name}: zero rows")
            results[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(sdf),
                "oracle_rows": None, "err": "no_oracle",
            }
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: oracle SQL raised")
            traceback.print_exc()
            failures += 1
            results[name] = {"err": "oracle_raised"}
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"schema spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
            )
        if not problems:
            hs, ho = value_hash(canon(sdf)), value_hash(canon(odf))
            if hs != ho:
                problems.append("value-hash mismatch")
                srows, orows = canon(sdf), canon(odf)
                sset, oset = set(srows), set(orows)
                diff_s = list(sset - oset)[:3]
                diff_o = list(oset - sset)[:3]
                if diff_s:
                    problems.append(f"spark-only rows: {diff_s}")
                if diff_o:
                    problems.append(f"oracle-only rows: {diff_o}")
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"PASS  {name} ({len(sdf)} rows)")
        results[name] = {
            "rows_match": len(sdf) == len(odf),
            "schema_match": sorted(sdf.columns) == sorted(odf.columns),
            "hash_match": not problems,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "err": "; ".join(problems) if problems else None,
        }
    spark.stop()
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_path}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
