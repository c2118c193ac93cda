"""Fused Pallas compositing kernel vs the jnp compositor: values and the
analytic backward vs autodiff (interpret mode on CPU; compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamfusion_tpu.ops.composite import composite
from dreamfusion_tpu.ops.pallas_composite import composite_fused


def _inputs(key, N=37, K=50):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sigmas = jax.random.uniform(k1, (N, K)) * 20.0
    rgbs = jax.random.uniform(k2, (N, K, 3))
    deltas = jax.random.uniform(k3, (N, K)) * 0.05 + 0.01
    ts = jnp.cumsum(deltas, -1) + jax.random.uniform(k4, (N, 1))
    return sigmas, rgbs, deltas, ts


def test_fused_forward_matches_jnp():
    sigmas, rgbs, deltas, ts = _inputs(jax.random.PRNGKey(0))
    ws, depth, rgb = composite_fused(sigmas, rgbs, deltas, ts, True)
    ref = composite(sigmas, rgbs, deltas, ts=ts)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(ref.weights_sum),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref.rgb),
                               rtol=1e-5, atol=1e-6)


def test_fused_masked_samples():
    """Masked tail (sigma=0, dt=0) must be a no-op, like the jnp compositor."""
    sigmas, rgbs, deltas, ts = _inputs(jax.random.PRNGKey(1), N=8, K=32)
    mask = jnp.arange(32)[None, :] < 20
    sigmas = sigmas * mask
    deltas = deltas * mask
    ws, depth, rgb = composite_fused(sigmas, rgbs, deltas, ts, True)
    ref = composite(sigmas, rgbs, deltas, ts=ts)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(ref.weights_sum),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref.rgb),
                               rtol=1e-5, atol=1e-6)


def test_fused_analytic_backward_matches_autodiff():
    """The hand-derived backward (the raymarching.cu:662-667 math) must equal
    autodiff of the jnp compositor."""
    sigmas, rgbs, deltas, ts = _inputs(jax.random.PRNGKey(2), N=12, K=24)
    k = jax.random.PRNGKey(3)
    gws = jax.random.normal(jax.random.fold_in(k, 0), (12,))
    gd = jax.random.normal(jax.random.fold_in(k, 1), (12,))
    gc = jax.random.normal(jax.random.fold_in(k, 2), (12, 3))

    def loss_fused(s, r):
        ws, depth, rgb = composite_fused(s, r, deltas, ts, True)
        return jnp.sum(ws * gws) + jnp.sum(depth * gd) + jnp.sum(rgb * gc)

    def loss_ref(s, r):
        out = composite(s, r, deltas, ts=ts)
        return (jnp.sum(out.weights_sum * gws) + jnp.sum(out.depth * gd)
                + jnp.sum(out.rgb * gc))

    gs_f, gr_f = jax.grad(loss_fused, argnums=(0, 1))(sigmas, rgbs)
    gs_r, gr_r = jax.grad(loss_ref, argnums=(0, 1))(sigmas, rgbs)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_r),
                               rtol=1e-4, atol=1e-5)
