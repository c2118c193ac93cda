"""Fused Pallas compositing kernel vs the jnp compositor: values and the
analytic backward vs autodiff (interpret mode on CPU; compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_fused_T_thresh_matches_jnp_values_and_grads():
    """Transmittance early-stop mask: fused kernel == jnp compositor in
    values AND gradients (the bwd kernel re-derives the masked formula)."""
    sigmas, rgbs, deltas, ts = _inputs(jax.random.PRNGKey(5), N=16, K=40)
    sigmas = sigmas * 3.0   # opaque enough that the mask actually bites
    T = 1e-2

    def loss_fused(s, r):
        ws, depth, rgb = composite_fused(s, r, deltas, ts, True, T)
        return (jnp.sum(ws * 0.3) + jnp.sum(depth * 0.7)
                + jnp.sum(rgb * 1.1))

    def loss_ref(s, r):
        out = composite(s, r, deltas, ts=ts, T_thresh=T)
        return (jnp.sum(out.weights_sum * 0.3) + jnp.sum(out.depth * 0.7)
                + jnp.sum(out.rgb * 1.1))

    # mask must actually zero something for this test to mean anything
    trans_ref = composite(sigmas, rgbs, deltas, ts=ts).weights
    assert float(jnp.sum(loss_fused(sigmas, rgbs))) != 0
    v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1))(sigmas, rgbs)
    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1))(sigmas, rgbs)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-5)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_render_grid_pallas_flag_parity():
    """render_grid(pallas_composite=True) == the jnp path, values + grads
    through the full grid renderer (interpret mode off-TPU)."""
    from dreamfusion_tpu.config import Config
    from dreamfusion_tpu.models import build_model
    from dreamfusion_tpu.models.networks import make_field_fns
    from dreamfusion_tpu.ops.marching import (init_grid_state,
                                              make_update_extra_state,
                                              render_grid)

    cfg = Config(text="x", backbone="grid", grid_ray=True, w=8, h=8,
                 grid_size=32, max_steps=32, grid_K=16,
                 lambda_orient=0.01).finalize()
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)) / 3 ** 0.5,
                        method=model.init_all)
    gs = init_grid_state(cfg.cascade, cfg.grid_size, cfg.density_thresh)
    gs = make_update_extra_state(cfg, model)(params, gs, key)

    k = jax.random.PRNGKey(7)
    rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.3]), (64, 3))
    d = jax.random.normal(k, (64, 3)) * 0.15 - jnp.array([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def run(params, use_pallas):
        fns = make_field_fns(model, params)
        out = render_grid(jax.random.PRNGKey(3), fns, gs, rays_o, rays_d,
                          bound=cfg.bound, max_steps=cfg.max_steps,
                          K=cfg.grid_K, compute_normal_losses=True,
                          pallas_composite=use_pallas)
        return out

    o_ref = run(params, False)
    o_pal = run(params, True)
    for k_ in ("image", "depth", "weights_sum", "loss_orient"):
        np.testing.assert_allclose(np.asarray(o_pal[k_]),
                                   np.asarray(o_ref[k_]),
                                   rtol=1e-4, atol=1e-5, err_msg=k_)

    g_ref = jax.grad(lambda p: jnp.sum(run(p, False)["image"]))(params)
    g_pal = jax.grad(lambda p: jnp.sum(run(p, True)["image"]))(params)
    for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                               jax.tree_util.tree_leaves_with_path(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-2, atol=1e-5,
                                   err_msg=str(kp))
