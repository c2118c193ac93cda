"""GUI core, txt2img pipeline, job templates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_orbit_camera():
    from dreamfusion_tpu.apps.gui import OrbitCamera

    cam = OrbitCamera(64, 64, r=2.0, fovy=60.0)
    p0 = cam.pose.copy()
    assert p0.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(p0[:3, 3]), 2.0, rtol=1e-5)
    cam.orbit(100, 0)
    assert not np.allclose(cam.pose, p0)
    cam.scale(1)
    assert cam.radius < 2.0
    cam.pan(100, 0)
    assert np.linalg.norm(cam.center) > 0
    intr = cam.intrinsics
    np.testing.assert_allclose(intr[0], 64 / (2 * np.tan(np.pi / 6)), rtol=1e-5)


@pytest.mark.slow
def test_gui_core_train_and_preview(tmp_path):
    from dreamfusion_tpu.apps.gui import NeRFGUICore
    from dreamfusion_tpu.config import Config
    from dreamfusion_tpu.guidance import none_guidance
    from dreamfusion_tpu.training.trainer import Trainer

    cfg = Config(text=None, guidance="none", h=8, w=8, W=16, H=16,
                 num_steps=8, upsample_steps=0, backbone="vanilla",
                 iters=100, workspace=str(tmp_path / "ws"),
                 lambda_orient=0.0)
    trainer = Trainer("gui", cfg, guidance=none_guidance(),
                      use_checkpoint="scratch")
    core = NeRFGUICore(cfg, trainer)
    core.train_steps = 2
    log = core.train_step()
    assert log["step"] == 2 and np.isfinite(log["loss"])
    out = core.test_step()
    assert core.render_buffer is not None
    assert core.render_buffer.shape[-1] == 3
    # second test_step without need_update accumulates spp or skips
    core.cam.orbit(50, 0)
    core.need_update = True
    core.test_step()
    assert core.render_buffer is not None


@pytest.mark.slow
def test_txt2img_pipeline_tiny():
    from dreamfusion_tpu.guidance.sd.pipeline import prompt_to_img

    imgs = prompt_to_img("a tiny test", sd_weights=None, height=64, width=64,
                         num_inference_steps=4, seed=0, sampler="plms")
    assert imgs.shape == (1, 64, 64, 3)
    assert imgs.dtype == np.uint8
    imgs2 = prompt_to_img("a tiny test", sd_weights=None, height=64, width=64,
                          num_inference_steps=4, seed=0, sampler="ddim")
    assert imgs2.shape == (1, 64, 64, 3)


def test_job_templates():
    from dreamfusion_tpu.training.jobs import params_for_nerf
    from dreamfusion_tpu.utils.tools import random_params

    p = params_for_nerf("/data/lego", sweep=True)
    np.random.seed(0)
    sampled = random_params(p)
    assert sampled["fine_train"]["lr_rgbnet"] in (1e-3, 3e-3, 1e-2)
    assert sampled["cfg_data"]["datadir"] == "/data/lego"
    assert isinstance(sampled["fine_train"]["pg_scale"], tuple)
