"""DP gradient EQUALITY (VERDICT r3 next #7): the shard_map'd data-parallel
SDS step must produce exactly the gradients its spec claims — the mean of
the per-device gradients, each computed from the device's fold_in'd PRNG key
(parallel/sharding.py:44-48). The r2/r3 DP tests assert finiteness and
shapes only; this closes SURVEY §2.4's last correctness question.

Reference analog: torch DDP averages per-rank grads (nerf/utils.py:200-202);
there the per-rank batches come from the sampler, here from the key fold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.config import Config
from dreamfusion_tpu.guidance import build_guidance, none_guidance
from dreamfusion_tpu.models import build_model
from dreamfusion_tpu.parallel.sharding import data_parallel_grads, make_mesh
from dreamfusion_tpu.training.trainer import make_grads_fn


def _check_dp_equals_mean(cfg, guidance):
    model = build_model(cfg)
    key = jax.random.PRNGKey(3)
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)) / 3 ** 0.5,
                        method=model.init_all)
    if guidance.name == "none":
        text_z = jnp.zeros((6, 1))
    else:
        zs = [guidance.get_text_embeds([f"{cfg.text}, {d} view"],
                                       [cfg.negative])
              for d in ("front", "side", "back", "side", "overhead",
                        "bottom")]
        text_z = jnp.concatenate(zs, axis=0)

    grads_fn = make_grads_fn(cfg, model, guidance)
    step = jnp.int32(1)
    k = jax.random.PRNGKey(11)

    mesh = make_mesh(8)
    dp = data_parallel_grads(grads_fn, mesh)
    loss_dp, _, grads_dp = jax.jit(dp)(
        params, step, guidance.params, text_z, k, None)

    # the spec: mean over devices of grads_fn at fold_in(key, device_index)
    # (jit once — eight eager retraces dominate the test's runtime)
    jfn = jax.jit(grads_fn)
    per_dev = [jfn(params, step, guidance.params, text_z,
                   jax.random.fold_in(k, i), None) for i in range(8)]
    loss_ref = np.mean([float(l) for l, _, _ in per_dev])
    grads_ref = jax.tree.map(lambda *gs: jnp.mean(jnp.stack(gs), 0),
                             *[g for _, _, g in per_dev])

    assert np.isfinite(float(loss_dp))
    np.testing.assert_allclose(float(loss_dp), loss_ref, rtol=1e-5)
    flat_dp, tree_dp = jax.tree_util.tree_flatten(grads_dp)
    flat_ref, tree_ref = jax.tree_util.tree_flatten(grads_ref)
    assert tree_dp == tree_ref
    for a, b in zip(flat_dp, flat_ref):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-5)
    # sanity: the gradient is not identically zero
    assert max(float(np.abs(np.asarray(g)).max()) for g in flat_dp) > 0


def _cfg(tmp_path, **kw):
    base = dict(text="a red cube", backbone="grid", iters=4, h=8, w=8,
                H=16, W=16, num_steps=8, upsample_steps=8, dir_text=True,
                albedo_iters=2, lambda_orient=0.0, lambda_opacity=1e-3,
                lambda_entropy=1e-4, workspace=str(tmp_path / "ws"), seed=0)
    base.update(kw)
    return Config(**base).finalize()


def test_dp_grads_equal_mean_of_per_device_grads(tmp_path):
    """Fast-lane variant without guidance: exercises the shard_map pmean +
    per-device key-fold contract on the render/regularizer gradients.
    Vanilla backbone keeps the CPU compile inside the fast-suite budget;
    the grid+SDS production configuration runs in the slow lane below."""
    cfg = _cfg(tmp_path, guidance="none", backbone="vanilla")
    _check_dp_equals_mean(cfg, none_guidance())


@pytest.mark.slow
def test_dp_sds_grads_equal_mean_of_per_device_grads(tmp_path):
    """The full claim for the production configuration: DP + SDS (nano
    UNet/VAE). Slow lane only because the fused render+SDS+grad program
    costs ~5 min of XLA CPU compile on the 1-core CI host."""
    cfg = _cfg(tmp_path, guidance="stable-diffusion",
               sd_weights="random-nano")
    _check_dp_equals_mean(cfg, build_guidance(cfg))
