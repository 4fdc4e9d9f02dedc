"""Isolated fresh-JVM timing for a handful of registry queries.

The bisect companion to ``bench.py``: the sharded sweep answers "how
fast is the whole registry", this answers "how fast is THIS query with
nothing else in the JVM" — the discriminator between a code regression
and batch-composition noise (the r7 co-residency lesson, pinned in
``BENCH_GBIF_ISOLATED_r07.json``).

Usage::

    python tools/bench_isolated.py --repo /root/repo \
        --out BENCH_ISOLATED.json minhash_dedup_components [more...]

Each query gets its own CHILD process (fresh JVM), which runs the
harness warmup, one untimed warm pass of the query, a GC, then
``--repeats`` timed passes. ``--repo`` points at the code under test
(a git worktree of an older commit works), so an A/B is two
invocations differing only in ``--repo``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _child(repo: str, name: str, sf_dir: str, repeats: int) -> None:
    sys.path.insert(0, repo)
    os.chdir(repo)
    import __spark_entry__ as entrymod
    from gbif_filter_python_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-isolated-{name}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()

    fn = entrymod.queries()[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    print(json.dumps({"name": name, "times": times}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--child-name", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child_name:
        _child(args.repo, args.child_name, args.sf_dir, args.repeats)
        return

    results = {}
    for name in args.names:
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                name,
                "--repo",
                args.repo,
                "--sf-dir",
                args.sf_dir,
                "--repeats",
                str(args.repeats),
                "--child-name",
                name,
            ],
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            results[name] = {"error": proc.stderr[-500:]}
        else:
            results[name] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(name, results[name], flush=True)
    payload = {
        "repo": args.repo,
        "sf_dir": args.sf_dir,
        "repeats": args.repeats,
        "results": results,
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)


if __name__ == "__main__":
    main()
