"""Drive the dearpygui window wiring with a fake dpg module.

The environment has no display/dearpygui, so the widget tree + callbacks
(reference: nerf/gui.py:155-468) are exercised through an injected stub
that records registrations and lets the test fire callbacks.
"""

import contextlib
import types

import numpy as np
import pytest

from dreamfusion_tpu.config import Config
from dreamfusion_tpu.guidance import none_guidance
from dreamfusion_tpu.training.trainer import Trainer
from dreamfusion_tpu.apps.gui import NeRFGUI


class FakeDpg:
    mvFormat_Float_rgb = 0
    mvMouseButton_Left = 0
    mvMouseButton_Middle = 2

    def __init__(self):
        self.items = {}          # tag -> kwargs
        self.callbacks = {}      # label/tag -> (callback, user_data)
        self.values = {}
        self.running_frames = 0
        self.focused = True

    # context managers ------------------------------------------------------
    def _cm(self, *a, **kw):
        @contextlib.contextmanager
        def cm():
            yield None
        return cm()

    texture_registry = _cm
    window = _cm
    group = _cm
    collapsing_header = _cm
    theme = _cm
    theme_component = _cm
    handler_registry = _cm

    # widget adders ---------------------------------------------------------
    def _add(self, kind, *args, **kw):
        tag = kw.get("tag") or kw.get("label") or f"{kind}_{len(self.items)}"
        self.items[tag] = dict(kind=kind, **kw)
        if "callback" in kw and kw["callback"] is not None:
            self.callbacks[tag] = (kw["callback"], kw.get("user_data"))
        if "default_value" in kw:
            self.values[tag] = kw["default_value"]

    def __getattr__(self, name):
        if name.startswith("add_"):
            return lambda *a, **kw: self._add(name[4:], *a, **kw)
        raise AttributeError(name)

    # state ----------------------------------------------------------------
    def set_primary_window(self, *a):
        pass

    def configure_item(self, tag, **kw):
        self.items.setdefault(tag, {}).update(kw)

    def set_value(self, tag, value):
        self.values[tag] = value

    def get_value(self, tag):
        return self.values.get(tag)

    def is_item_focused(self, tag):
        return self.focused

    def bind_item_theme(self, *a):
        pass

    def create_viewport(self, **kw):
        self.items["_viewport"] = kw

    def setup_dearpygui(self):
        pass

    def show_viewport(self):
        pass

    def create_context(self):
        pass

    def destroy_context(self):
        pass

    def is_dearpygui_running(self):
        self.running_frames -= 1
        return self.running_frames >= 0

    def render_dearpygui_frame(self):
        pass

    def fire(self, tag, app_data=None):
        cb, user_data = self.callbacks[tag]
        if user_data is not None:
            cb(None, app_data, user_data)
        else:
            cb(None, app_data)


@pytest.fixture(scope="module")
def gui(tmp_path_factory):
    ws = tmp_path_factory.mktemp("gui_ws")
    cfg = Config(text="a red cube", guidance="none", iters=4, h=8, w=8,
                 H=16, W=16, num_steps=8, upsample_steps=8,
                 backbone="vanilla", workspace=str(ws), max_ray_batch=256,
                 lambda_orient=0.0, dir_text=True)
    trainer = Trainer("gui", cfg, guidance=none_guidance(),
                      use_checkpoint="scratch")
    return NeRFGUI(cfg, trainer)


def test_widget_tree_and_callbacks(gui):
    dpg = FakeDpg()
    gui.register_dpg(dpg)
    # key widgets exist
    for tag in ("_texture", "_button_train", "_button_save", "_button_mesh",
                "_color_editor", "_log_infer_time", "_viewport"):
        assert tag in dpg.items, tag

    # train toggle flips training state and button label
    assert not gui.training
    dpg.fire("_button_train")
    assert gui.training
    assert dpg.items["_button_train"]["label"] == "stop"
    dpg.fire("_button_train")
    assert not gui.training

    # shading / mode / fovy / ambient / light / bg callbacks mutate state
    dpg.fire("shading", "lambertian")
    assert gui.shading == "lambertian"
    dpg.fire("mode", "depth")
    assert gui.mode == "depth"
    dpg.fire("FoV (vertical)", 90)
    assert gui.cam.fovy == 90
    dpg.fire("ambient", 0.25)
    assert gui.ambient_ratio == 0.25
    dpg.fire("theta", 45.0)
    assert gui.light_dir[0] == 45.0
    dpg.fire("_color_editor", (0.5, 0.25, 0.125, 1.0))
    np.testing.assert_allclose(gui.bg_color, [0.5, 0.25, 0.125])

    # max_steps slider rebuilds the renderer config
    dpg.fire("max steps", 64)
    assert gui.cfg.max_steps == 64 and gui.trainer.cfg.max_steps == 64


def test_mouse_handlers_move_camera(gui):
    dpg = FakeDpg()
    gui.register_dpg(dpg)
    pose0 = gui.cam.pose.copy()
    drag = [t for t, (cb, ud) in dpg.callbacks.items()
            if "mouse_drag_handler" in t]
    # handler tags are auto-generated; fire all three mouse callbacks
    fired = 0
    for tag, (cb, ud) in list(dpg.callbacks.items()):
        if "mouse" in tag:
            cb(None, (0, 30.0, 10.0) if "drag" in tag else 2.0)
            fired += 1
    assert fired >= 3
    assert not np.allclose(gui.cam.pose, pose0)
    assert gui.need_update


@pytest.mark.slow
def test_render_loop_with_fake_dpg(gui):
    """Full render() loop: 2 frames with training on — trains, renders a
    preview, updates the texture + logs."""
    dpg = FakeDpg()
    dpg.running_frames = 2
    gui.shading = "albedo"
    gui.mode = "image"
    gui.render(dpg=dpg)
    dpg2 = FakeDpg()
    gui.training = True
    gui.train_steps = 2
    dpg2.running_frames = 1
    gui.need_update = True
    gui.render(dpg=dpg2)
    assert gui.step >= 2
    assert "ms" in dpg2.values["_log_train_time"]
    assert isinstance(dpg2.values["_texture"], np.ndarray)
    assert dpg2.values["_texture"].shape == (16, 16, 3)


def test_reset_button_restores_fresh_state(gui):
    """VERDICT r2 #6: reset must re-init params (new values), zero the step,
    and rebuild the occupancy grid state (reference nerf/gui.py:221-233)."""
    dpg = FakeDpg()
    gui.register_dpg(dpg)
    gui.trainer.train(max_steps=2, log_interval=10 ** 9,
                      checkpoint_at_end=False)
    trained = [np.asarray(x).copy() for x in
               __import__("jax").tree_util.tree_leaves(
                   gui.trainer.state.params)]
    gui.step = 7
    dpg.fire("_button_reset")
    assert gui.step == 0
    assert int(gui.trainer.state.step) == 0
    assert gui.need_update
    fresh = __import__("jax").tree_util.tree_leaves(gui.trainer.state.params)
    diffs = [float(np.abs(np.asarray(a) - b).max())
             for a, b in zip(fresh, trained)]
    assert max(diffs) > 0                      # params actually re-drawn
    # training still works on the reset state (compiled step stays valid)
    gui.trainer.train(max_steps=1, log_interval=10 ** 9,
                      checkpoint_at_end=False)
    assert int(gui.trainer.state.step) == 1


def test_aabb_sliders_update_infer_aabb_only(gui):
    dpg = FakeDpg()
    gui.register_dpg(dpg)
    for tag in ("_aabb_min_x", "_aabb_max_x", "_aabb_min_y", "_aabb_max_y",
                "_aabb_min_z", "_aabb_max_z"):
        assert tag in dpg.items, tag
    dpg.fire("_aabb_min_x", -0.5)
    dpg.fire("_aabb_max_z", 0.25)
    assert gui.cfg.aabb_infer[0] == -0.5
    assert gui.cfg.aabb_infer[5] == 0.25
    assert gui.trainer.cfg.aabb_infer == gui.cfg.aabb_infer
    assert gui.trainer._eval_render is None    # renderer rebuilt lazily
    # a preview frame renders under the narrowed AABB
    gui.need_update = True
    stats = gui.test_step()
    assert not stats.get("skipped")
    assert np.isfinite(gui.render_buffer).all()


def test_main_gui_flag_launches_nerfgui(tmp_path):
    """`python main.py --gui` must construct NeRFGUI and drive its render
    loop (reference main.py:64,113-115) — fake dpg, zero frames."""
    import main as main_mod

    dpg = FakeDpg()
    dpg.running_frames = 0
    gui = main_mod.main([
        "--text", "a red cube", "--guidance", "none", "--gui",
        "--iters", "2", "--w", "8", "--h", "8", "--W", "16", "--H", "16",
        "--num_steps", "8", "--upsample_steps", "8", "--backbone", "vanilla",
        "--lambda_orient", "0", "--max_ray_batch", "256",
        "--ckpt", "scratch", "--workspace", str(tmp_path / "ws")], dpg=dpg)
    assert isinstance(gui, NeRFGUI)
    assert "_button_train" in dpg.items and "_button_reset" in dpg.items
