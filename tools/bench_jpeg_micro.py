"""Codec-level JPEG decode A/B (round 13, VERDICT r12 item 4).

The r12 verdict asked for >= 2x on jpeg_features at sf10, premised on
the per-MCU Huffman walk being that query's floor. Measured reality at
the query's 8-12 px fixture scale: the 120-image codec work is ~100 ms
against a ~1.5-2 s query wall — Spark orchestration (mapInPandas jobs,
joins, the driver-side replay collect) dominates, so NO codec change
can 2x that query. This tool therefore measures the codec itself,
HEAD vs a reference commit's worktree, same fixed payloads, fresh
subprocess per tree — the same isolated-A/B adjudication shape as
tools/bench_isolated.py, minus Spark.

Usage:
    python tools/bench_jpeg_micro.py --ref-tree /path/to/r12-worktree \
        --out BENCH_JPEG_MICRO_r13.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Runs inside each tree: decode fixed deterministic payloads, print
#: one JSON line of per-shape ms/image (min-of-N wall over the set).
_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from gbif_filter_python_spark.multimodal.binary_ops import (
    encode_jpeg, decode_jpeg_bytes, _fake_pixels,
)
import numpy as np

shapes = {}
# jpeg_features fixture shape: 120 tiny images, mixed quality/DRI
tiny = [
    encode_jpeg(
        _fake_pixels(str(i).encode(), 8 + i % 5),
        quality=80 + i % 16,
        restart_interval=i % 2,
    )
    for i in range(120)
]
# production web-corpus shapes
mid = [
    encode_jpeg(_fake_pixels(f"m{i}".encode(), 64), quality=85)
    for i in range(30)
]
big_img = np.tile(_fake_pixels(b"b", 64), (4, 4))
big = [encode_jpeg(big_img, quality=85, restart_interval=8 * (i % 2))
       for i in range(4)]
shapes_list = [
    ("tiny_8_12px_x120", tiny, 5),
    ("mid_64px_x30", mid, 5),
    ("big_256px_x4", big, 5),
]
# optional progressive payload (javax.imageio-written by the caller;
# see tests/test_jpeg_jvm_crossval.py for the generator) — exercises
# the _JpegBitReader + prog-scan path, not the inlined sequential walk
import os
if os.path.exists("/tmp/prog128.jpg"):
    shapes_list.append(
        ("progressive_128px_x5",
         [open("/tmp/prog128.jpg", "rb").read()] * 5, 5)
    )

for name, payloads, reps in shapes_list:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for p in payloads:
            decode_jpeg_bytes(p)
        best = min(best, time.perf_counter() - t0)
    shapes[name] = round(best / len(payloads) * 1000, 4)  # ms/image
print(json.dumps(shapes))
"""


def run_tree(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, tree],
        capture_output=True,
        text=True,
        check=True,
        cwd=tree,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-tree", required=True)
    ap.add_argument("--ref-label", default="ref")
    ap.add_argument("--out", default="BENCH_JPEG_MICRO_r13.json")
    args = ap.parse_args()

    head = run_tree(REPO)
    ref = run_tree(args.ref_tree)
    ratios = {
        k: round(ref[k] / head[k], 2)
        for k in head
        if k in ref and head[k] > 0
    }
    payload = {
        "metric": "jpeg_decode_ms_per_image",
        "unit": "ms",
        "head": head,
        args.ref_label: ref,
        "speedup_ref_over_head": ratios,
        "note": (
            "fresh subprocess per tree, identical deterministic "
            "payloads, min-of-5; pure codec wall, no Spark"
        ),
    }
    with open(os.path.join(REPO, args.out), "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
