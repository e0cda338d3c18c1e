"""Controlled re-measurement of the two attack-throughput numbers whose
committed history disagreed (VERDICT r4 weak #1/#2):

  * nerfail_deepfool_iters_per_s_4x800sq — BENCH_r04 recorded 0.104 while
    tools/deepfool_vbatch_sweep.json and BENCH_r03 recorded ~0.47 for the
    same bench.bench_deepfool call.
  * attack_nerfail_s_iters_per_s_8x800sq — 1.566 (r02) → 1.397 (r03/r04).

Runs each bench N times back-to-back in ONE fresh process on an otherwise
idle chip and reports every sample, so the JSON shows the sustained rate
AND the spread a single driver-captured sample can land in. Writes
tools/bench_reconcile.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def main(n: int = 3) -> None:
    out = {"when": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
           "protocol": (
               "fresh process, idle chip, N back-to-back calls of the "
               "same bench functions the driver runs; each call is "
               "itself best-of-3 timed walks after a warmup"
           )}
    out["attack_nerfail_s_iters_per_s_8x800sq"] = [
        round(bench.bench_attack(), 3) for _ in range(n)
    ]
    out["nerfail_deepfool_iters_per_s_4x800sq"] = [
        round(bench.bench_deepfool(n_views=4), 3) for _ in range(n)
    ]
    path = os.path.join(os.path.dirname(__file__), "bench_reconcile.json")
    json.dump(out, open(path, "w"), indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
