"""Mesh-parallelism tests on the virtual 8-device CPU mesh."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dreamfusion_tpu import cameras
from dreamfusion_tpu.parallel import (data_parallel_grads, make_mesh,
                                      shard_rays_render)
from dreamfusion_tpu.renderer import FieldFns, render_stratified


def _ball_fns():
    def density(x):
        return {"sigma": jnp.where(jnp.linalg.norm(x, axis=-1) < 0.5, 50.0, 0.0)}

    def field(x, d, l, r, s):
        return (density(x)["sigma"],
                jnp.broadcast_to(jnp.array([1.0, 0.2, 0.1]), x.shape),
                jnp.zeros_like(x))

    return FieldFns(field=field, density=density, background=None)


@pytest.mark.slow
def test_shard_rays_render_matches_single_device():
    mesh = make_mesh(8)
    fns = _ball_fns()
    poses, _ = cameras.circle_poses(jnp.array([0.0]), radius=2.0)
    rays = cameras.get_rays(poses, jnp.array([20.0, 20.0, 8.0, 8.0]), 16, 16)
    ro, rd = rays.origins[0], rays.directions[0]  # 256 rays

    def render_fn(params, o, d, gs):
        out = render_stratified(jax.random.PRNGKey(0), fns, o, d,
                                num_steps=32, upsample_steps=0, bg_radius=0.0)
        return {"image": out["image"], "depth": out["depth"]}

    sharded = shard_rays_render(render_fn, mesh)
    out_s = sharded({}, ro, rd, None)
    out_1 = render_fn({}, ro, rd, None)
    np.testing.assert_allclose(np.asarray(out_s["image"]),
                               np.asarray(out_1["image"]), atol=1e-5)

    # non-divisible ray count pads and unpads correctly
    out_odd = sharded({}, ro[:100], rd[:100], None)
    np.testing.assert_allclose(np.asarray(out_odd["image"]),
                               np.asarray(out_1["image"][:100]), atol=1e-5)


def test_data_parallel_grads_pmean():
    mesh = make_mesh(8)

    def grads_fn(params, step, gparams, text_z, key, grid_state):
        # toy: per-device loss depends on the folded key -> grads differ,
        # pmean averages them
        noise = jax.random.normal(key, ())
        loss = params["w"] ** 2 * (1.0 + 0.1 * noise)
        grads = {"w": 2 * params["w"] * (1.0 + 0.1 * noise)}
        return loss, {"m": loss}, grads

    dp = data_parallel_grads(grads_fn, mesh)
    params = {"w": jnp.float32(3.0)}
    loss, metrics, grads = jax.jit(dp)(params, jnp.int32(0), {}, jnp.zeros(1),
                                       jax.random.PRNGKey(0), None)
    # grads are the mean over 8 distinct per-device values: near 6.0 but not
    # exactly any single device's value
    assert abs(float(grads["w"]) - 6.0) < 0.5
    assert np.isfinite(float(loss))
