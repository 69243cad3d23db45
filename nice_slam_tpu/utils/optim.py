"""Adam with runtime per-group learning rates and gradient masks.

The reference drives torch.optim.Adam with lr=0 placeholder param groups and
rewrites `param_groups[i]['lr']` every iteration according to the mapping
stage schedule (Mapper.py:457-518).  Moments keep accumulating while lr==0,
and a fresh optimizer is created per tracked frame / per mapping call — so
there is no cross-frame moment state.

This module reproduces that semantics functionally: `lr` is a *traced* pytree
prefix (one scalar per top-level group), so one compiled program covers the
whole stage schedule; an optional 0/1 mask pytree freezes entries (the
frustum feature selection, Mapper.py:391-414) by zeroing their gradients —
frozen entries then provably receive zero update and zero moments, identical
to not being in the optimizer at all.

Defaults are torch's: betas (0.9, 0.999), eps 1e-8, bias correction on.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any
    nu: Any
    count: jnp.ndarray


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(params: Any, grads: Any, state: AdamState, lr: Any,
                *, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                mask: Any = None) -> tuple[Any, AdamState]:
    """One Adam step.

    Args:
      lr: a scalar, or a pytree-prefix of `params` (e.g. a dict with one
        scalar per parameter group) — may be traced values.
      mask: optional pytree-prefix of 0/1 arrays multiplying the gradients.
    Returns:
      (new_params, new_state).
    """
    if mask is not None:
        grads = _apply_prefix(jnp.multiply, grads, mask)

    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

    def step(p, m, v, lr_leaf):
        m_hat = m / c1
        v_hat = v / c2
        return p - lr_leaf * m_hat / (jnp.sqrt(v_hat) + eps)

    new_params = _tree_map_with_prefix(step, params, mu, nu, lr)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def _is_leaf_like(x: Any) -> bool:
    return not isinstance(x, (dict, list, tuple))


def _apply_prefix(fn, full: Any, prefix: Any) -> Any:
    expanded = _expand(prefix, full)
    return jax.tree.map(fn, full, expanded)


def _expand(prefix: Any, full: Any) -> Any:
    """Broadcast a pytree prefix against the structure of `full`."""
    if _is_leaf_like(prefix) or isinstance(prefix, jnp.ndarray):
        return jax.tree.map(lambda _: prefix, full)
    if isinstance(prefix, dict):
        assert isinstance(full, dict), (prefix, type(full))
        return {k: _expand(prefix[k] if k in prefix else prefix, full[k])
                for k in full}
    if isinstance(prefix, (list, tuple)):
        return type(prefix)(_expand(p, f) for p, f in zip(prefix, full))
    raise TypeError(type(prefix))


def _tree_map_with_prefix(step, params, mu, nu, lr):
    lr_full = _expand(lr, params)
    return jax.tree.map(step, params, mu, nu, lr_full)
