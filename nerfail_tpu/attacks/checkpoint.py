"""Mid-attack checkpoint/resume for the 100-epoch attack engines.

The reference saves only FINAL attack artifacts (perturbation PNGs at
attack_NeRFail.py:508-512, the UAP tensor at attack_UAP_2D.py:363) — a
crash at epoch 97 of a 100-epoch × 300-view DeepFool run loses everything.
On preemptible TPUs resumable attack state is a first-class obligation
(SURVEY.md §5 checkpoint bullet), the analogue of the reference's NeRF
auto-resume (run_nerf.py:216-233).

State is one atomically-replaced .npz: the perturbation arrays plus a JSON
blob carrying the host-side control-plane scalars (epoch counters, m1
bisection bounds, m2, best attack acc) and the epoch history.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

_META_KEY = "__meta_json__"


def save_attack_state(
    path: str, arrays: Dict[str, np.ndarray], meta: Dict[str, Any]
) -> str:
    """Atomically persist attack state: named arrays + JSON-able meta."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            **{_META_KEY: np.frombuffer(
                json.dumps(meta).encode(), dtype=np.uint8
            )},
            **{k: np.asarray(v) for k, v in arrays.items()},
        )
    os.replace(tmp, path)
    return path


def load_attack_state(
    path: str,
) -> Optional[Tuple[Dict[str, np.ndarray], Dict[str, Any]]]:
    """Load attack state saved by `save_attack_state`; None if absent."""
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        meta = json.loads(bytes(data[_META_KEY].tobytes()).decode())
        arrays = {k: data[k] for k in data.files if k != _META_KEY}
    return arrays, meta


def clear_attack_state(path: Optional[str]) -> None:
    """Remove a finished run's in-flight state (final artifacts supersede
    it; a stale checkpoint would make the next run resume a done attack)."""
    if path and os.path.exists(path):
        os.remove(path)
