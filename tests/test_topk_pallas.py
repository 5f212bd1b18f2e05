"""Pallas top-k CBSR kernel vs lax.top_k (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxk_tpu.ops.topk_pallas import _topk_pallas_raw, topk_cbsr_pallas
from maxk_tpu.sparse.cbsr import cbsr_densify, maxk_cbsr, CBSR


def _densify_pair(vals, sel, d):
    return np.asarray(cbsr_densify(CBSR(values=vals, selector=sel), d))


@pytest.mark.parametrize("k", [1, 8, 32])
@pytest.mark.parametrize("v,d", [(64, 256), (200, 256), (64, 128)])
def test_topk_matches_lax(k, v, d):
    rng = np.random.default_rng(k + v)
    x = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    vals, sel = _topk_pallas_raw(x, k, True)
    ref = maxk_cbsr(x, k)
    # compare via densified form (order differs by design)
    np.testing.assert_allclose(
        _densify_pair(vals, sel, d),
        _densify_pair(ref.values, ref.selector, d),
        atol=1e-6,
    )
    # selector strictly increasing per row (column order, unique)
    s = np.asarray(sel)
    assert np.all(np.diff(s, axis=1) > 0)


def test_topk_with_ties():
    x = jnp.asarray(
        np.array([[1.0] * 8 + [0.0] * 8, [2.0, 2.0, 2.0, 2.0] + [-1.0] * 12]),
        jnp.float32,
    )
    vals, sel = _topk_pallas_raw(x, 3, True)
    v = np.asarray(vals)
    np.testing.assert_allclose(v[0], [1, 1, 1])
    np.testing.assert_allclose(v[1], [2, 2, 2])
    # exactly k selections, within-row unique columns
    assert np.unique(np.asarray(sel)[0]).size == 3


def test_topk_negative_values():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 256)) - 5.0, jnp.float32)  # all < 0
    vals, sel = _topk_pallas_raw(x, 4, True)
    ref = maxk_cbsr(x, 4)
    np.testing.assert_allclose(
        _densify_pair(vals, sel, 256),
        _densify_pair(ref.values, ref.selector, 256),
        atol=1e-6,
    )


@pytest.mark.parametrize("k", [1, 8, 32])
@pytest.mark.parametrize("v,d", [(64, 256), (200, 256), (64, 128)])
def test_mask_matches_cbsr_densify(k, v, d):
    from maxk_tpu.ops.topk_pallas import _mask_pallas_raw

    rng = np.random.default_rng(k + v + 7)
    x = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    y, take = _mask_pallas_raw(x, k, True)
    ref = maxk_cbsr(x, k)
    np.testing.assert_allclose(
        np.asarray(y), _densify_pair(ref.values, ref.selector, d), atol=1e-6
    )
    # mask is 0/1 with exactly k survivors per row (tie-aware)
    t = np.asarray(take, np.float32)
    assert set(np.unique(t)) <= {0.0, 1.0}
    np.testing.assert_array_equal(t.sum(axis=1), k)


def test_mask_ties_exactly_k():
    from maxk_tpu.ops.topk_pallas import _mask_pallas_raw

    x = jnp.asarray(
        np.array([[1.0] * 8 + [0.0] * 8, [2.0] * 4 + [-1.0] * 12]),
        jnp.float32,
    )
    y, take = _mask_pallas_raw(x, 3, True)
    np.testing.assert_array_equal(np.asarray(take).sum(axis=1), 3)
    np.testing.assert_allclose(np.asarray(y).sum(axis=1), [3.0, 6.0])


def test_mask_grad_routes_to_selected():
    from maxk_tpu.ops.topk_pallas import maxk_mask_pallas

    import maxk_tpu.ops.topk_pallas as tp

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    k = 8

    def f_mask(x):
        return jnp.sum(maxk_mask_pallas(x, k) ** 2)

    def f_ref(x):
        c = maxk_cbsr(x, k)
        return jnp.sum(cbsr_densify(c, 256) ** 2)

    orig = tp._mask_pallas_raw
    tp._mask_pallas_raw = lambda x, k, interpret=False: orig(x, k, True)
    try:
        gx = jax.grad(f_mask)(x)
    finally:
        tp._mask_pallas_raw = orig
    gref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gref), atol=1e-5)


def test_topk_grad_matches_lax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    k = 8

    def f_pallas(x):
        vals, sel = topk_cbsr_pallas(x, k)
        return jnp.sum(vals**2)

    def f_lax(x):
        cbsr = maxk_cbsr(x, k)
        return jnp.sum(cbsr.values**2)

    # interpret path: call raw with interpret inside custom_vjp is fine on
    # CPU only via interpret flag; patch module constant for the test
    import maxk_tpu.ops.topk_pallas as tp

    orig = tp._topk_pallas_raw
    tp._topk_pallas_raw = lambda x, k, interpret=False: orig(x, k, True)
    try:
        gx = jax.grad(f_pallas)(x)
    finally:
        tp._topk_pallas_raw = orig
    gref = jax.grad(f_lax)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gref), atol=1e-5)
