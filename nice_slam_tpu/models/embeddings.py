"""Positional embeddings for the decoder MLPs.

Functional parity targets:
  * Gaussian Fourier features: /root/reference/src/conv_onet/models/decoder.py:7-30
    (learnable B in R^{3x93}, scale 25, output sin(x @ B))
  * NeRF positional encoding:  decoder.py:33-67
    (multires 10 log-spaced for color, 5 linear-spaced otherwise; includes
    the raw input)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_fourier_b(key: jax.Array, in_dim: int = 3, mapping_size: int = 93,
                   scale: float = 25.0) -> jnp.ndarray:
    """Random projection matrix B ~ N(0, scale^2), learnable parameter."""
    return jax.random.normal(key, (in_dim, mapping_size)) * scale


def fourier_embed(b_matrix: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """sin(p @ B): [N, 3] -> [N, mapping_size]."""
    return jnp.sin(p @ b_matrix)


def nerf_embed_dim(multires: int) -> int:
    return multires * 6 + 3


def nerf_embed(p: jnp.ndarray, multires: int, log_sampling: bool
               ) -> jnp.ndarray:
    """NeRF frequency encoding, [N, 3] -> [N, multires*6+3].

    Frequency bands are 2^linspace(0, multires-1) when log_sampling else
    linspace(1, 2^(multires-1)); output order is
    [p, sin(p f0), cos(p f0), sin(p f1), ...] matching the reference loop.
    """
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, multires - 1, multires)
    else:
        freqs = np.linspace(2.0 ** 0.0, 2.0 ** (multires - 1), multires)
    outs = [p]
    for f in freqs:
        outs.append(jnp.sin(p * f))
        outs.append(jnp.cos(p * f))
    return jnp.concatenate(outs, axis=-1)
