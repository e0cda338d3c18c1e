"""Fourier positional encoding.

Same math as the reference `Embedder` (run_nerf_helpers.py:15-67): identity
concat with sin/cos at frequencies 2^0 .. 2^(L-1) (log-sampled) applied
per input dimension, laid out as

    [x, sin(x·f0), cos(x·f0), sin(x·f1), cos(x·f1), ...]

(each block is `d`-dim) so encoded feature order matches the reference for
parity tests. Implemented as one broadcast multiply + sin/cos + reshape —
a single VPU-friendly fusion rather than the reference's list of lambdas.
"""

from __future__ import annotations

import jax.numpy as jnp


def encoder_output_dim(d: int, num_freqs: int, include_input: bool = True) -> int:
    return d * (2 * num_freqs + (1 if include_input else 0))


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Encode [..., d] → [..., d·(1+2·num_freqs)].

    With num_freqs=10, d=3 → 63 channels; num_freqs=4 → 27 (viewdirs).
    """
    if num_freqs == 0:
        return x
    if log_sampling:
        freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(
            1.0, 2.0 ** (num_freqs - 1), num_freqs, dtype=x.dtype
        )
    xb = x[..., None, :] * freqs[:, None]                 # [..., F, d]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)  # [..., F, 2d]
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
