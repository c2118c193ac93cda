"""Misc ops + results tooling tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from dreamfusion_tpu.ops.misc import (linear_to_srgb,
                                      sample_rays_with_error_map,
                                      sph_from_ray, srgb_to_linear)


def test_sph_from_ray():
    o = jnp.zeros((3, 3))
    d = jnp.array([[0.0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0]])
    uv = sph_from_ray(o, d, radius=1.4)
    assert uv.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(uv[0]), [0.0, 0.0], atol=1e-6)  # +z
    np.testing.assert_allclose(np.asarray(uv[1]), [0.5, 0.0], atol=1e-6)  # +x
    np.testing.assert_allclose(float(uv[2, 1]), 1.0, atol=1e-6)           # +y pole


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(np.asarray(srgb_to_linear(linear_to_srgb(x))),
                               np.asarray(x), atol=1e-4)


def test_error_map_sampling_concentrates():
    em = jnp.zeros((128, 128)).at[64, 64].set(1000.0) + 1e-6
    inds, coarse = sample_rays_with_error_map(jax.random.PRNGKey(0), em,
                                              512, 256, 256)
    assert inds.shape == (512,)
    # most samples land near the hot cell (pixel ~ (128, 128) at 256 res)
    x = np.asarray(inds) // 256
    y = np.asarray(inds) % 256
    frac = np.mean((np.abs(x - 128) < 4) & (np.abs(y - 128) < 4))
    assert frac > 0.9


def test_results_tooling(tmp_path):
    from dreamfusion_tpu.utils.results import (copy_models, get_targets,
                                               mean_results, results_extract)

    for i, psnr in enumerate([20.0, 30.0, 25.0]):
        d = tmp_path / f"job{i}"
        os.makedirs(d)
        (d / "params.json").write_text(json.dumps({"lr": "0.1", "seed": str(i)}))
        with open(d / "metrics.jsonl", "w") as f:
            f.write(json.dumps({"test/psnr": psnr - 1, "time": 0}) + "\n")
            f.write(json.dumps({"test/psnr": psnr, "time": 1}) + "\n")
        (d / f"model{i}.dvgo").write_bytes(b"x")

    rows = results_extract(str(tmp_path))
    assert [r["test/psnr"] for r in rows] == [30.0, 25.0, 20.0]
    assert len(get_targets(str(tmp_path), {"lr": "0.1"})) == 3
    assert len(get_targets(str(tmp_path), {"seed": "1"})) == 1
    m = mean_results(str(tmp_path), "test/psnr")
    np.testing.assert_allclose(m, 25.0)
    copied = copy_models(str(tmp_path), str(tmp_path / "out"))
    assert len(copied) == 3
