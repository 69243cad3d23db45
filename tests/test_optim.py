"""Adam parity vs torch.optim.Adam (the reference's optimizer) including
per-group learning rates and gradient masks."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from nice_slam_tpu.utils.optim import adam_init, adam_update


def test_matches_torch_adam():
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(8,)).astype(np.float32)
    a = rng.normal(size=(8,)).astype(np.float32)

    xt = torch.tensor(x0, requires_grad=True)
    at = torch.tensor(a)
    opt = torch.optim.Adam([xt], lr=0.01)

    xj = jnp.asarray(x0)
    st = adam_init(xj)

    for _ in range(25):
        opt.zero_grad()
        loss = ((xt - at) ** 2).sum()
        loss.backward()
        opt.step()

        g = jax.grad(lambda x: jnp.sum((x - jnp.asarray(a)) ** 2))(xj)
        xj, st = adam_update(xj, g, st, 0.01)

    np.testing.assert_allclose(np.asarray(xj), xt.detach().numpy(),
                               atol=1e-5)


def test_group_lrs_and_mask():
    params = {'a': jnp.ones(4), 'b': jnp.ones(4)}
    grads = {'a': jnp.full((4,), 2.0), 'b': jnp.full((4,), 2.0)}
    st = adam_init(params)
    lr = {'a': 0.1, 'b': 0.0}
    mask = {'a': jnp.array([1.0, 1.0, 0.0, 0.0]), 'b': 1.0}
    new, st = adam_update(params, grads, st, lr, mask=mask)
    # b: lr 0 -> unchanged
    np.testing.assert_allclose(np.asarray(new['b']), 1.0)
    # a: masked entries unchanged, others stepped by ~lr (bias-corrected)
    np.testing.assert_allclose(np.asarray(new['a'][2:]), 1.0)
    assert np.all(np.asarray(new['a'][:2]) < 1.0)


def test_mask_keeps_moments_zero():
    """A masked entry must behave as if absent from the optimizer: after
    unmasking (not done here) it would start from zero moments, matching the
    reference's scatter-back of only selected features."""
    params = jnp.ones(2)
    st = adam_init(params)
    for _ in range(3):
        params, st = adam_update(params, jnp.ones(2), st, 0.1,
                                 mask=jnp.array([1.0, 0.0]))
    assert float(st.mu[1]) == 0.0 and float(st.nu[1]) == 0.0
    np.testing.assert_allclose(float(params[1]), 1.0)


def test_lr_zero_accumulates_moments():
    """lr=0 must still accumulate moments (the reference's stage schedule
    relies on this: lr-0 groups keep their Adam statistics warm)."""
    params = jnp.ones(2)
    st = adam_init(params)
    params, st = adam_update(params, jnp.ones(2), st, 0.0)
    np.testing.assert_allclose(np.asarray(params), 1.0)
    assert float(st.mu[0]) > 0.0
