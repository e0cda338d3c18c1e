"""Decompose the per-view cost of the 300-view table build (VERDICT r4
next #8): host view prep (rays + shading + coord map) vs the Pallas k-NN
call (which itself contains host-side candidate bucketing + the TPU
kernels). Run after phase=tables so S.npy exists; uses 3 probe views.

Writes tools/knn_timing.json — the evidence for how much of the
~N s/view build is hidden by the prefetch overlap (host prep) and how
much is the kNN floor.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CACHE = os.environ.get("REHEARSAL_CACHE", "/tmp/rehearsal_tables")


def main(n_probe: int = 3, H: int = 800) -> None:
    from nerfail_tpu.data.synthetic import _shade, analytic_coord_map
    from nerfail_tpu.ops.rays import get_rays_np
    from nerfail_tpu.ops.pallas.knn_kernel import (
        KnnPrep, KnnQueryPlan, knn_pallas,
    )

    sys.path.insert(0, os.path.dirname(__file__))
    from full_rehearsal import _scene

    S = np.load(os.path.join(CACHE, "S.npy"))
    K, poses = _scene(300, H)
    t0 = time.perf_counter()
    prep = KnnPrep(S)
    t_prep_index = time.perf_counter() - t0

    host_s, plan_s, knn_s = [], [], []
    # warm the compiled-kernel cache on view 10, then probe fresh views
    for v in [10] + list(range(200, 200 + n_probe)):
        t0 = time.perf_counter()
        o, d = get_rays_np(H, H, K, poses[v])
        _shade(o.reshape(-1, 3), d.reshape(-1, 3)).reshape(H, H, 4)
        cm = analytic_coord_map(poses[v], H, H, K)
        t1 = time.perf_counter()
        plan = KnnQueryPlan(cm.reshape(-1, 3), prep, k=8)
        t2 = time.perf_counter()
        knn_pallas(plan=plan)
        t3 = time.perf_counter()
        if v != 10:
            host_s.append(round(t1 - t0, 2))
            plan_s.append(round(t2 - t1, 2))
            knn_s.append(round(t3 - t2, 2))
    out = {
        "when": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "H": H, "M": int(S.shape[0]),
        "prep_index_s": round(t_prep_index, 2),
        "host_view_prep_s": host_s,
        "plan_build_s": plan_s,
        "knn_execute_s": knn_s,
        "note": (
            "host_view_prep_s + plan_build_s run in the build's prefetch "
            "thread (hidden behind device time since the r5 KnnQueryPlan "
            "split); knn_execute_s (device kernel calls + top-k merges) "
            "is the per-view floor of the overlapped build"
        ),
    }
    json.dump(out, open(os.path.join(
        os.path.dirname(__file__), "knn_timing.json"), "w"), indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
