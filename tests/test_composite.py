"""Compositing math: parallel cumprod compositor vs sequential-scan oracle.

The sequential scan reproduces the CUDA kernel's per-ray loop semantics
(raymarching.cu:501-595); its autodiff grads equal the kernel's hand-derived
backward (raymarching.cu:630-693). Matching our parallel implementation's
values AND grads against it is the golden test SURVEY.md §4 calls the most
regression-prone math in the repo.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dreamfusion_tpu.ops.composite import (composite, exclusive_cumprod,
                                           near_far_from_aabb, sample_pdf)


def _composite_scan(sigmas, rgbs, deltas, T_thresh=0.0):
    """Sequential per-sample compositor (the CUDA loop, as a lax.scan)."""
    def step(carry, inp):
        T, ws, depth, rgb, t = carry
        sigma, c, delta = inp
        alpha = 1.0 - jnp.exp(-sigma * delta)
        t = t + delta
        w = alpha * T
        live = T > T_thresh if T_thresh > 0 else True
        w = jnp.where(live, w, 0.0) if T_thresh > 0 else w
        carry = (T * (1.0 - alpha + 1e-15), ws + w, depth + w * t,
                 rgb + w * c, t)
        return carry, None

    def per_ray(sig, rgb, dl):
        init = (1.0, 0.0, 0.0, jnp.zeros(3), 0.0)
        (T, ws, depth, rgbout, _), _ = jax.lax.scan(step, init, (sig, rgb, dl))
        return ws, depth, rgbout

    return jax.vmap(per_ray)(sigmas, rgbs, deltas)


def _random_inputs(key, N=8, T=16):
    k1, k2, k3 = jax.random.split(key, 3)
    sigmas = jax.random.uniform(k1, (N, T)) * 20.0
    rgbs = jax.random.uniform(k2, (N, T, 3))
    deltas = jax.random.uniform(k3, (N, T)) * 0.05 + 0.01
    return sigmas, rgbs, deltas


def test_exclusive_cumprod():
    x = jnp.array([[2.0, 3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(exclusive_cumprod(x)),
                               [[1.0, 2.0, 6.0]])


@pytest.mark.slow
def test_composite_matches_sequential_forward():
    sigmas, rgbs, deltas = _random_inputs(jax.random.PRNGKey(0))
    out = composite(sigmas, rgbs, deltas)
    ws, depth, rgb = _composite_scan(sigmas, rgbs, deltas)
    np.testing.assert_allclose(np.asarray(out.weights_sum), np.asarray(ws), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(depth), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(rgb), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_composite_grads_match_sequential():
    """Gradients of the parallel compositor == gradients of the sequential
    loop (== the CUDA analytic backward)."""
    sigmas, rgbs, deltas = _random_inputs(jax.random.PRNGKey(1), N=4, T=12)
    gw = jax.random.normal(jax.random.PRNGKey(2), (4,))
    gc = jax.random.normal(jax.random.PRNGKey(3), (4, 3))

    def loss_parallel(s, r):
        out = composite(s, r, deltas)
        return jnp.sum(out.weights_sum * gw) + jnp.sum(out.rgb * gc)

    def loss_scan(s, r):
        ws, depth, rgb = _composite_scan(s, r, deltas)
        return jnp.sum(ws * gw) + jnp.sum(rgb * gc)

    gs_p, gr_p = jax.grad(loss_parallel, argnums=(0, 1))(sigmas, rgbs)
    gs_s, gr_s = jax.grad(loss_scan, argnums=(0, 1))(sigmas, rgbs)
    np.testing.assert_allclose(np.asarray(gs_p), np.asarray(gs_s), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gr_p), np.asarray(gr_s), rtol=1e-4, atol=1e-6)


def test_composite_masked_samples_are_noops():
    """sigma=0, delta=0 samples must not change any output (the static-shape
    masking invariant the grid renderer relies on)."""
    sigmas, rgbs, deltas = _random_inputs(jax.random.PRNGKey(4), N=4, T=8)
    out0 = composite(sigmas, rgbs, deltas)
    # interleave no-op samples
    z = jnp.zeros((4, 8))
    sig2 = jnp.stack([sigmas, z], -1).reshape(4, 16)
    del2 = jnp.stack([deltas, z], -1).reshape(4, 16)
    rgb2 = jnp.stack([rgbs, jnp.ones_like(rgbs)], -2).reshape(4, 16, 3)
    out1 = composite(sig2, rgb2, del2)
    np.testing.assert_allclose(np.asarray(out1.weights_sum),
                               np.asarray(out0.weights_sum), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out1.rgb), np.asarray(out0.rgb),
                               rtol=1e-5, atol=1e-6)


def test_sample_pdf_concentrates_on_peak():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (2, 9))
    w = jnp.zeros((2, 8)).at[:, 4].set(100.0)
    s = sample_pdf(jax.random.PRNGKey(0), bins, w, 64)
    assert s.shape == (2, 64)
    frac_in_peak = float(jnp.mean((s > 0.5) & (s < 0.65)))
    assert frac_in_peak > 0.95


def test_sample_pdf_det_uniform_weights():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (1, 5))
    w = jnp.ones((1, 4))
    s = sample_pdf(None, bins, w, 8, det=True)
    assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0
    # deterministic midpoints should be increasing
    assert bool(jnp.all(jnp.diff(s[0]) >= 0))


def test_near_far_from_aabb():
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    o = jnp.array([[0.0, 0, -3], [0, 0, -3], [5, 5, 5]])
    d = jnp.array([[0.0, 0, 1], [0, 1, 0], [1, 0, 0]])  # hit, miss, miss
    near, far = near_far_from_aabb(o, d, aabb, min_near=0.1)
    np.testing.assert_allclose(float(near[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(far[0]), 4.0, rtol=1e-5)
    assert not bool(near[1] < far[1])
    assert not bool(near[2] < far[2])
    # ray starting inside: near clamps to min_near
    near, far = near_far_from_aabb(jnp.zeros((1, 3)), d[:1], aabb, min_near=0.1)
    np.testing.assert_allclose(float(near[0]), 0.1, rtol=1e-5)
