"""Full-resolution trained-classifier ASR driver on the TPU — the big
sibling of tests/test_asr.py (which proves the same acceptance semantics
at 64² on CPU).

Drives the rehearsal phases end to end at full reference resolution:

  1. 800² neighbor tables from analytic box-scene geometry (Pallas k-NN),
  2. inception trained to high val accuracy on the 8 box classes,
  3. the flagship NeRFail/DeepFool attack (m1/m2 control plane, planned
     Pallas jacobian engine) against class 0,
  4. the reference acceptance pass (model_test.py:359-377): ASR over all
     views + e/L2/L0/PSNR perturbation stats.

    python tools/asr_demo.py                 # 60 views, ~1 h on one v5e
    python tools/asr_demo.py n_views=300 epochs=3   # rehearsal scale

Exits non-zero if the trained classifier fails to recognize the clean
scene (clean_acc < 0.8) or the attack fails (ASR < 0.9) — the same bars
tests/test_asr.py asserts. Writes tools/asr_demo_report.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import full_rehearsal as fr

REPORT = os.path.join(os.path.dirname(__file__), "asr_demo_report.json")


def main(n_views=60, H=800, epochs=3, view_batch=4, df_max_iter=50):
    fr.build_tables(n_views, H)
    fr.train_rehearsal_classifier(H=H)
    report = fr.run_attack(
        "nerfail", n_views, H, epochs=epochs, view_batch=view_batch,
        df_max_iter=df_max_iter, report_path=REPORT,
    )
    fe = report["final_eval"]
    print(f"[asr_demo] clean_acc={fe['clean_acc']:.3f} "
          f"asr={fe['asr']:.3f} e_max={fe['e_max']:.1f}")
    if fe["clean_acc"] < 0.8:
        sys.exit(f"classifier too weak: clean_acc={fe['clean_acc']}")
    if fe["asr"] < 0.9:
        sys.exit(f"attack failed: asr={fe['asr']}")
    print("[asr_demo] PASS")


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = int(v)
    main(**kw)
