"""Finish a rehearsal whose attack completed but whose final ASR eval
crashed (r5: 6 GB of pinned scatter plans + the eval's eager forwards
exhausted HBM — run_attack now clears the plan cache first). Loads the
saved best tensor and the partial report, runs the reference acceptance
pass (model_test.py:359-377 analogue) in a fresh process, and writes the
completed report with `final_eval_rerun` marking the recovery.

    python tools/finish_eval.py method=nerfail n_views=300
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import full_rehearsal as fr


def main(method="nerfail", n_views=300, H=800):
    path = fr.REPORT_NERFAIL if method == "nerfail" else fr.REPORT
    report = json.load(open(path))
    assert report["method"] == method and report["n_views"] == n_views
    assert report.get("partial"), "report is already complete"

    npz = os.path.join(fr.CACHE, f"delta_best_{method}_{n_views}.npz")
    if not os.path.exists(npz):
        npz = os.path.join(fr.CACHE, f"delta_best_{method}.npz")
    saved = np.load(npz)
    delta, best_acc = saved["delta"], float(saved["best_attack_acc"])

    (meta, ori_imgs, weights, idx, delta0, labels, logits_fn,
     perf_only) = fr._load_setup(n_views, H)
    assert not perf_only
    from nerfail_tpu.config import AttackConfig

    cfg = AttackConfig(eps=32.0)
    epoch_log = report["epoch_log"]
    report["attack_total_s"] = report.pop("attack_total_s_so_far")
    report["epoch_time_s"] = [round(e["time_s"], 1) for e in epoch_log]
    report["plan_host_gb"] = epoch_log[-1]["plan_host_gb"]
    report["plan_pinned_gb"] = epoch_log[-1]["plan_pinned_gb"]
    report["best_attack_acc"] = best_acc
    report["delta_abs_max"] = float(np.abs(delta[..., :3]).max())
    report["final_eval"] = fr._final_asr_eval(
        delta, weights, idx, np.asarray(ori_imgs), labels, logits_fn, cfg
    )
    report["final_hbm_gb"] = fr.device_mem_gb()
    report["final_eval_rerun"] = True   # eval ran in this follow-up process
    report.pop("partial")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["final_eval"], indent=2))
    print(f"[finish_eval] report completed at {path}")


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = v if k == "method" else int(v)
    main(**kw)
