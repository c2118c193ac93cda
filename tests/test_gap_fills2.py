"""Round-2 parity gap fills: scheduler variety, llff spherify, error-map
training loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dreamfusion_tpu.training.schedules import (make_lr_schedule,
                                                make_module_optimizer)


def test_schedules_match_torch_semantics():
    # ExpLR_step: lr = max_lr * gamma^step
    s = make_lr_schedule(dict(lr_scheduler="ExpLR_step", max_lr=0.1,
                              step_decay=0.99))
    np.testing.assert_allclose(float(s(10)), 0.1 * 0.99 ** 10, rtol=1e-6)
    # StepLR_step: staircase every decay_steps
    s = make_lr_schedule(dict(lr_scheduler="StepLR_step", max_lr=1.0,
                              step_decay=0.5, decay_steps=100))
    assert float(s(99)) == 1.0 and float(s(100)) == 0.5 and float(s(250)) == 0.25
    # StepAutoLR_step: x0.1 every int(0.8 * steps_per_epoch)
    s = make_lr_schedule(dict(lr_scheduler="StepAutoLR_step", max_lr=1.0,
                              steps_per_epoch=10))
    assert float(s(7)) == 1.0
    np.testing.assert_allclose(float(s(8)), 0.1, rtol=1e-6)
    # OneCycLR: warms from max_lr/25 up to max_lr then anneals below start
    s = make_lr_schedule(dict(lr_scheduler="OneCycLR", max_lr=1.0,
                              steps_per_epoch=99, num_epochs=1))
    assert abs(float(s(0)) - 1 / 25) < 1e-3
    assert float(s(30)) == pytest.approx(1.0, abs=1e-3)   # peak at pct 0.3
    assert float(s(100)) < 1e-3                           # final_div 1e4
    # unknown name: constant (reference returns scheduler None)
    s = make_lr_schedule(dict(lr_scheduler="nope", max_lr=0.3))
    assert float(s(500)) == pytest.approx(0.3)


def test_module_optimizer_runs():
    params = {"w": jnp.ones((4, 4))}
    for opt in ("SGD", "Adam"):
        tx = make_module_optimizer(dict(optimizer=opt, max_lr=0.01,
                                        lr_scheduler="ExpLR_step"))
        st = tx.init(params)
        upd, st = tx.update({"w": jnp.ones((4, 4))}, st, params)
        assert jnp.all(jnp.isfinite(upd["w"]))
    with pytest.raises(AssertionError):
        make_module_optimizer(dict(optimizer="LBFGS"))


def test_spherify_poses_unit_radius_and_path():
    from dreamfusion_tpu.datasets.loaders import _spherify_poses

    # synthetic inward-facing ring of cameras at radius 4 around origin
    rng = np.random.RandomState(0)
    poses = []
    for th in np.linspace(0, 2 * np.pi, 12, endpoint=False):
        pos = np.array([4 * np.cos(th), 4 * np.sin(th), 0.5])
        z = -pos / np.linalg.norm(pos)                 # look at center
        up = np.array([0.0, 0, 1.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.stack([x, y, z, pos], 1)
        hwf = np.array([[100.0], [100.0], [50.0]])
        poses.append(np.concatenate([c2w, hwf], 1))
    poses = np.stack(poses).astype(np.float32)
    bds = np.tile(np.array([2.0, 6.0], np.float32), (12, 1))

    reset, render_poses, bds2 = _spherify_poses(poses.copy(), bds.copy())
    assert reset.shape == (12, 3, 5)
    assert render_poses.shape == (120, 3, 4)
    # camera centers normalized to ~unit RMS radius
    rad = np.sqrt(np.mean(np.sum(reset[:, :3, 3] ** 2, -1)))
    np.testing.assert_allclose(rad, 1.0, rtol=1e-4)
    # bounds scaled by the same factor
    np.testing.assert_allclose(bds2 / bds, bds2[0, 0] / bds[0, 0], rtol=1e-5)
    # render path lies on the sphere
    r = np.linalg.norm(render_poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(r, 1.0, atol=1e-4)


def _ring_data(n=3, H=8, W=8):
    rng = np.random.RandomState(1)
    Ks = np.tile(np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]]), (n, 1, 1))
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 2, 3] = 3.0
    return dict(HW=np.tile([H, W], (n, 1)), Ks=Ks, poses=poses,
                images=rng.rand(n, H, W, 3).astype(np.float32),
                i_train=np.arange(n))


def test_error_map_sampler_batches_and_update():
    from dreamfusion_tpu.datasets.rays import ErrorMapRaySampler

    s = ErrorMapRaySampler(_ring_data(), {}, batch_size=16, seed=0)
    it = iter(s)
    rd, ro, vd, rgb = next(it)
    assert rd.shape == (16, 3) and rgb.shape == (16, 3)
    em0 = s.error_map.copy()
    s.update_last(np.full((16,), 5.0, np.float32))
    assert (s.error_map != em0).any()
    assert s.error_map.max() <= 0.1 * 1.0 + 0.9 * 5.0 + 1e-6
    # sampler concentrates on high-error cells: after boosting one cell's
    # error hugely, that cell is sampled far more often
    v = 0
    s.error_map[:] = 1e-6
    s.error_map[v, 7] = 1.0
    counts = 0
    for _ in range(20):
        next(it)
        lv, coarse = s._last
        if lv == v:
            counts += int((np.asarray(coarse) == 7).sum())
        s._last = None
    assert counts > 100  # 20 batches x 16 rays, nearly all from cell 7


def test_dvgo_fit_consumes_error_map_sampler():
    """DVGOTrainer.fit drives the error-map sampler end-to-end: batches
    in, per-ray errors back, map updated."""
    from dreamfusion_tpu.datasets.rays import ErrorMapRaySampler
    from dreamfusion_tpu.models.dvgo import DVGOField
    from dreamfusion_tpu.training.dvgo_trainer import (DVGOStageConfig,
                                                       DVGOTrainer)

    field = DVGOField(xyz_min=(-1, -1, -1), xyz_max=(1, 1, 1),
                      world_size=(8, 8, 8))
    stage = DVGOStageConfig(n_iters=3, batch_size=16)
    tr = DVGOTrainer(field, stage, near=0.5, far=5.0, seed=0)
    sampler = ErrorMapRaySampler(_ring_data(), {}, batch_size=16, seed=0)
    em0 = sampler.error_map.copy()
    tr.fit(sampler)
    assert tr.global_step == 3
    assert (sampler.error_map != em0).any()
