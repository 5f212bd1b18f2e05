"""Pallas densify/sample kernels vs the XLA one-hot formulation
(interpreter mode on CPU; real-chip validation via scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxk_tpu.ops.cbsr_pallas import _densify_raw, _sample_raw
from maxk_tpu.sparse.cbsr import CBSR, cbsr_densify, maxk_cbsr


@pytest.mark.parametrize("v,k,d", [(64, 8, 128), (700, 32, 256), (64, 1, 128)])
def test_densify_matches_xla(v, k, d):
    rng = np.random.default_rng(v + k)
    x = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    cbsr = maxk_cbsr(x, k)
    ref = np.asarray(cbsr_densify(cbsr, d))
    got = np.asarray(_densify_raw(cbsr.values, cbsr.selector, d, True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("v,k,d", [(64, 8, 128), (700, 32, 256)])
def test_sample_matches_take_along(v, k, d):
    rng = np.random.default_rng(v)
    z = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    sel = jnp.asarray(
        np.stack([rng.choice(d, k, replace=False) for _ in range(v)]), jnp.int32
    )
    ref = np.asarray(jnp.take_along_axis(z, sel, axis=1))
    got = np.asarray(_sample_raw(z, sel, k, True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_densify_sample_vjp_pair():
    """densify's VJP is sample (and vice versa), on the interpret path."""
    import maxk_tpu.ops.cbsr_pallas as cp

    rng = np.random.default_rng(3)
    v, k, d = 64, 8, 128
    x = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    cbsr = maxk_cbsr(x, k)

    orig_d, orig_s = cp._densify_raw, cp._sample_raw
    cp._densify_raw = lambda *a, **kw: orig_d(*a[:3], True)
    cp._sample_raw = lambda *a, **kw: orig_s(*a[:3], True)
    try:
        def f(vals):
            return jnp.sum(cp.densify_pallas(vals, cbsr.selector, d) ** 2)

        gx = jax.grad(f)(cbsr.values)

        def f_ref(vals):
            return jnp.sum(cbsr_densify(CBSR(vals, cbsr.selector), d) ** 2)

        gref = jax.grad(f_ref)(cbsr.values)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gref), atol=1e-5)
    finally:
        cp._densify_raw, cp._sample_raw = orig_d, orig_s
