"""Renderer path A tests: analytic-scene oracle + network integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu import cameras
from dreamfusion_tpu.config import Config
from dreamfusion_tpu.models import (NeRFGridNetwork, NeRFVanillaNetwork,
                                    SHADING_ALBEDO, SHADING_LAMBERTIAN)
from dreamfusion_tpu.models.networks import make_field_fns
from dreamfusion_tpu.renderer import (FieldFns, render_rays_chunked,
                                      render_stratified)


def _ball_fns(radius=0.5, color=(1.0, 0.2, 0.1), sigma0=50.0):
    """Analytic scene: opaque ball at origin."""
    color = jnp.array(color)

    def density(x):
        inside = jnp.linalg.norm(x, axis=-1) < radius
        return {"sigma": jnp.where(inside, sigma0, 0.0)}

    def field(x, d, light_d, ratio, shading_code):
        sigma = density(x)["sigma"]
        c = jnp.broadcast_to(color, x.shape)
        return sigma, c, jnp.zeros_like(x)

    return FieldFns(field=field, density=density, background=None)


def test_render_ball_center_vs_edge():
    cfg = Config()
    poses, _ = cameras.circle_poses(jnp.array([0.0]), radius=2.0)
    H = W = 17
    focal = float(cameras.fov_to_focal(60.0, H))
    rays = cameras.get_rays(poses, jnp.array([focal, focal, W / 2, H / 2]), H, W)
    out = render_stratified(
        jax.random.PRNGKey(0), _ball_fns(), rays.origins[0], rays.directions[0],
        bound=1.0, num_steps=96, upsample_steps=64, bg_radius=0.0)
    img = out["image"].reshape(H, W, 3)
    ws = out["weights_sum"].reshape(H, W)
    # center pixel is opaque ball color; corner is white background
    np.testing.assert_allclose(np.asarray(img[H // 2, W // 2]),
                               [1.0, 0.2, 0.1], atol=0.02)
    assert float(ws[H // 2, W // 2]) > 0.98
    np.testing.assert_allclose(np.asarray(img[0, 0]), [1.0, 1.0, 1.0], atol=1e-3)
    assert float(ws[0, 0]) < 1e-3
    # depth: center (hits front of ball at t=1.5 of [near,far]) in (0,1)
    d = float(out["depth"].reshape(H, W)[H // 2, W // 2])
    assert 0.0 < d < 1.0


def test_render_custom_bg_color():
    poses, _ = cameras.circle_poses(jnp.array([0.0]), radius=2.0)
    rays = cameras.get_rays(poses, jnp.array([20.0, 20.0, 4.0, 4.0]), 8, 8)
    bg = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (64, 1))
    out = render_stratified(jax.random.PRNGKey(0), _ball_fns(radius=0.05),
                            rays.origins[0], rays.directions[0],
                            bg_radius=0.0, bg_color=bg, num_steps=32,
                            upsample_steps=0)
    img = out["image"].reshape(8, 8, 3)
    np.testing.assert_allclose(np.asarray(img[0, 0]), [0, 0, 1], atol=1e-3)


def _tiny_cfg(**kw):
    return Config(h=8, w=8, num_steps=16, upsample_steps=16, **kw)


@pytest.mark.parametrize("cls", [NeRFGridNetwork, NeRFVanillaNetwork])
@pytest.mark.slow
def test_network_render_and_grad(cls):
    model = cls(bound=1.0, bg_radius=1.4)
    x = jnp.zeros((4, 3))
    d = jnp.ones((4, 3)) / jnp.sqrt(3.0)
    params = model.init(jax.random.PRNGKey(0), x, d, method=model.init_all)
    key = jax.random.PRNGKey(1)
    batch = cameras.sample_train_batch(key, _tiny_cfg(), B=1)

    def loss_fn(p):
        fns_p = make_field_fns(model, p)
        out = render_stratified(key, fns_p, batch["rays_o"][0],
                                batch["rays_d"][0], num_steps=16,
                                upsample_steps=16, perturb=True,
                                shading_code=SHADING_LAMBERTIAN,
                                ambient_ratio=0.1,
                                compute_normal_losses=True)
        return jnp.mean(out["image"]) + out["loss_orient"], out

    (loss, out), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert jnp.isfinite(loss)
    assert out["image"].shape == (64, 3)
    flat = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)
    assert jnp.isfinite(out["loss_orient"])


def test_chunked_rendering_matches_direct():
    fns = _ball_fns()
    poses, _ = cameras.circle_poses(jnp.array([0.0]), radius=2.0)
    rays = cameras.get_rays(poses, jnp.array([20.0, 20.0, 8.0, 8.0]), 16, 16)
    ro, rd = rays.origins[0], rays.directions[0]  # 256 rays
    key = jax.random.PRNGKey(0)

    def rf(o, d):
        return render_stratified(key, fns, o, d, num_steps=32,
                                 upsample_steps=0, bg_radius=0.0)

    direct = rf(ro, rd)
    chunked = render_rays_chunked(rf, ro, rd, chunk=100)  # non-divisor chunk
    np.testing.assert_allclose(np.asarray(chunked["image"]),
                               np.asarray(direct["image"]), atol=1e-5)
    assert chunked["image"].shape == (256, 3)
