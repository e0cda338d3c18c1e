"""Device-mesh construction.

The reference has zero distributed machinery (SURVEY.md §2.6) — every
parallel feature here is TPU-native by design:

  axis "data"  — rays / pixels / views (embarrassingly parallel in the
                 renderer; the attack all-reduces perturbation grads)
  axis "model" — the MLP hidden width (tensor parallel; 256 splits
                 cleanly across 2/4/8 chips at 128-lane granularity)

On a multi-host pod slice the data axis should span DCN and the model
axis stay within a host's ICI domain, which is what `mesh_utils`
produces when given the (data, model) order.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, model_parallel: Optional[int] = None
                   ) -> Tuple[int, int]:
    """(data, model) factors for n devices. Model axis defaults to the
    largest power of two ≤ min(n, 4) that divides n — 256-wide layers tile
    onto ≤4 chips at 128-lane granularity without padding waste."""
    if model_parallel is None:
        model_parallel = 1
        for cand in (2, 4):
            if n_devices % cand == 0 and cand <= n_devices:
                model_parallel = cand
    assert n_devices % model_parallel == 0
    return n_devices // model_parallel, model_parallel


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    dp, tp = mesh_shape_for(n, model_parallel)
    try:
        dev_array = mesh_utils.create_device_mesh((dp, tp), devices[:n])
    except Exception:
        dev_array = np.array(devices[:n]).reshape(dp, tp)
    return Mesh(dev_array, tuple(axis_names))
