"""Checkpoint save/resume.

Replaces the reference's torch.save tarball-per-10k-steps + scan-for-latest
resume (run_nerf.py:216-233,808-816) with msgpack pytree snapshots. File
naming keeps the reference's zero-padded step convention so experiment
tooling can reason about progress the same way.
"""

from __future__ import annotations

import os
import re
from typing import Any, List, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: Any) -> str:
    """Serialize a pytree (arrays + ints) to `path` (msgpack)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, state
    )
    blob = serialization.to_bytes(host_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (same pytree shape)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def latest_checkpoint(logdir: str, suffix: str = ".ckpt") -> Optional[str]:
    """Latest step-numbered checkpoint in a directory (reference scans for
    '*.tar' and takes the last — run_nerf.py:216-224)."""
    if not os.path.isdir(logdir):
        return None
    pat = re.compile(r"^(\d+)" + re.escape(suffix) + "$")
    found: List[tuple] = []
    for name in os.listdir(logdir):
        m = pat.match(name)
        if m:
            found.append((int(m.group(1)), name))
    if not found:
        return None
    found.sort()
    return os.path.join(logdir, found[-1][1])


def checkpoint_path(logdir: str, step: int, suffix: str = ".ckpt") -> str:
    return os.path.join(logdir, f"{step:06d}{suffix}")
