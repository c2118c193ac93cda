"""CLI flag system: -O/-O2 presets, flag round-trips, finalize invariants
(reference: main.py:12-84)."""

import pytest

from dreamfusion_tpu.config import Config, parse_config


def test_O_preset_expansion():
    """-O = fp16 + cuda_ray(grid_ray) + dir_text (main.py:75-79)."""
    cfg = parse_config(["-O", "--text", "a hamburger"])
    assert cfg.fp16 and cfg.grid_ray and cfg.dir_text
    assert cfg.text == "a hamburger"


def test_O2_preset_expansion():
    """-O2 = fp16 + dir_text, stratified renderer (main.py:81-84)."""
    cfg = parse_config(["-O2", "--text", "x"])
    assert cfg.fp16 and cfg.dir_text and not cfg.grid_ray


def test_flags_override_defaults():
    cfg = parse_config(["--text", "x", "--iters", "123", "--lr", "0.5",
                        "--w", "48", "--bound", "2.0", "--dt_gamma", "0.01",
                        "--pallas_composite"])
    assert cfg.iters == 123 and cfg.lr == 0.5 and cfg.w == 48
    assert cfg.bound == 2.0 and cfg.dt_gamma == 0.01
    assert cfg.pallas_composite


def test_cascade_derivation():
    """cascade = 1 + ceil(log2(bound)) (nerf/renderer.py:70)."""
    assert Config(text="x", bound=1.0).cascade == 1
    assert Config(text="x", bound=2.0).cascade == 2
    assert Config(text="x", bound=4.0).cascade == 3


def test_defaults_match_reference():
    """Spot-check reference default constants (main.py:12-73)."""
    cfg = Config(text="x")
    assert cfg.guidance_scale == 100.0          # nerf/sd.py:74
    assert cfg.max_steps == 512
    assert cfg.grid_size == 128                 # renderer.py:87
    assert cfg.update_extra_interval == 16
    assert cfg.density_thresh == 10.0
    assert cfg.adam_b2 == 0.99 and cfg.adam_eps == 1e-15   # main.py:128
    assert cfg.W == 800 and cfg.H == 800
    assert cfg.albedo_iters == 1000
