"""Mesh export tests: native marching tetrahedra vs analytic sphere,
UV atlas integrity, end-to-end textured export."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from dreamfusion_tpu.export.mesh import (export_textured_mesh,
                                         marching_tetrahedra,
                                         _marching_tetrahedra_np,
                                         nearest_inpaint, per_face_uv_atlas,
                                         rasterize_uv)


def _sphere_grid(n=32, r=0.6):
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return (r - np.sqrt(x * x + y * y + z * z)).astype(np.float32)


def test_marching_tetrahedra_sphere():
    grid = _sphere_grid()
    verts, tris = marching_tetrahedra(grid, 0.0)
    assert len(verts) > 100 and len(tris) > 100
    # all vertices ~ on the sphere of radius 0.6 (voxel -> [-1,1])
    v = verts / (32 - 1) * 2 - 1
    r = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.02)
    assert np.abs(r - 0.6).max() < 0.08
    # valid indices
    assert tris.min() >= 0 and tris.max() < len(verts)


def test_native_matches_numpy_fallback():
    grid = _sphere_grid(12, 0.5)
    v1, t1 = marching_tetrahedra(grid, 0.0)
    v2, t2 = _marching_tetrahedra_np(grid, 0.0)
    assert len(v1) == len(v2)
    assert len(t1) == len(t2)
    # same vertex set (order may differ) — compare sorted coordinates
    np.testing.assert_allclose(np.sort(v1.round(5), axis=0),
                               np.sort(v2.round(5), axis=0), atol=1e-4)


def test_uv_atlas_no_overlap():
    uvs = per_face_uv_atlas(10, 128)
    assert uvs.shape == (10, 3, 2)
    assert uvs.min() >= 0 and uvs.max() <= 1
    face_id, bary = rasterize_uv(uvs, 256, 256)
    # every face owns at least some texels
    present = set(np.unique(face_id)) - {-1}
    assert present == set(range(10))


def test_nearest_inpaint():
    mask = np.zeros((16, 16), bool)
    mask[8, 8] = True
    img = np.zeros((16, 16, 3), np.float32)
    img[8, 8] = [1.0, 0.5, 0.25]
    out = nearest_inpaint(mask, img.copy(), dilate=2)
    np.testing.assert_allclose(out[8, 10], [1.0, 0.5, 0.25], atol=1e-5)
    np.testing.assert_allclose(out[0, 0], 0.0)  # beyond dilate radius


def test_export_textured_mesh_end_to_end(tmp_path):
    def density_fn(x):
        r = jnp.linalg.norm(x, axis=-1)
        return {"sigma": jnp.where(r < 0.5, 50.0, 0.0),
                "albedo": jnp.broadcast_to(jnp.array([0.8, 0.2, 0.1]),
                                           x.shape)}

    obj = export_textured_mesh(density_fn, str(tmp_path), resolution=24,
                               density_thresh=10.0, tex_size=128)
    assert os.path.exists(obj)
    assert os.path.exists(str(tmp_path / "albedo.png"))
    assert os.path.exists(str(tmp_path / "mesh.mtl"))
    txt = open(obj).read()
    assert txt.count("\nv ") > 50 and "\nf " in txt
    from PIL import Image

    tex = np.asarray(Image.open(str(tmp_path / "albedo.png")))
    # baked texels carry the ball color
    reds = tex[..., 0][tex[..., 0] > 0]
    assert len(reds) > 100
    assert abs(int(np.median(reds)) - int(0.8 * 255)) <= 3
