"""Textured mesh export (marching iso-surface + UV atlas + texture bake).

Rebuilds NeRFRenderer.export_mesh (reference: nerf/renderer.py:121-299):
1. chunked density query on a resolution^3 grid, threshold =
   min(mean_density, density_thresh)
2. iso-surface extraction (native C++ marching tetrahedra, csrc/; pure-numpy
   fallback) — the reference used PyMCubes marching cubes
3. UV parameterization: per-face right-triangle charts packed in a grid
   atlas (replacing xatlas; simple but guarantees no overlap and exact
   per-face texels)
4. UV rasterization + masked field query for per-texel albedo (replacing
   nvdiffrast), 640k-point chunks like the reference (renderer.py:213-218)
5. nearest-neighbor seam inpaint (replacing sklearn KNN + scipy dilation)
6. write mesh.obj + mesh.mtl + albedo.png
"""

from __future__ import annotations

import ctypes
import math
import os
from typing import Callable, Optional, Tuple

import numpy as np

_LIB = None


def _load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
    so = os.path.abspath(os.path.join(here, "libmesh_native.so"))
    if not os.path.exists(so):
        try:
            import subprocess

            subprocess.run(["make", "-C", os.path.dirname(so)], check=True,
                           capture_output=True)
        except Exception:
            _LIB = False
            return _LIB
    try:
        lib = ctypes.CDLL(so)
        lib.marching_tetrahedra.restype = ctypes.c_int
        lib.rasterize_uv.restype = ctypes.c_int
        lib.nearest_inpaint.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


# ---------------------------------------------------------------------------
# iso-surface extraction
# ---------------------------------------------------------------------------

def marching_tetrahedra(grid: np.ndarray, iso: float
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """grid [nx, ny, nz] float32 -> (verts [V,3] in voxel coords, tris [T,3])."""
    grid = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = grid.shape
    lib = _load_native()
    if lib:
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        gp = grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        lib.marching_tetrahedra(gp, nx, ny, nz, ctypes.c_float(iso),
                                None, ctypes.byref(nv), None, ctypes.byref(nt))
        verts = np.zeros((nv.value, 3), np.float32)
        tris = np.zeros((nt.value, 3), np.int32)
        lib.marching_tetrahedra(
            gp, nx, ny, nz, ctypes.c_float(iso),
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(nv),
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.byref(nt))
        return verts, tris
    return _marching_tetrahedra_np(grid, iso)


_TETS = np.array([[0, 5, 1, 3], [0, 5, 3, 7], [0, 5, 7, 4],
                  [0, 7, 3, 2], [0, 7, 2, 6], [0, 7, 6, 4]])


def _marching_tetrahedra_np(grid: np.ndarray, iso: float):
    """Vectorized numpy fallback of the C++ kernel (same decomposition)."""
    nx, ny, nz = grid.shape
    cx, cy, cz = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    base = np.stack([cx, cy, cz], -1).reshape(-1, 3)  # [C, 3]
    corners = np.array([[k & 1, (k >> 1) & 1, (k >> 2) & 1] for k in range(8)])
    cpos = base[:, None, :] + corners[None]                     # [C, 8, 3]
    cval = grid[cpos[..., 0], cpos[..., 1], cpos[..., 2]]       # [C, 8]

    verts = []
    tris = []
    vert_count = 0
    edge_map = {}

    def vkey(a, b):
        return (min(a, b), max(a, b))

    def vid(pa, pb, va, vb):
        key = vkey(tuple(pa), tuple(pb))
        nonlocal vert_count
        if key in edge_map:
            return edge_map[key]
        t = 0.5 if abs(vb - va) < 1e-12 else np.clip((iso - va) / (vb - va), 0, 1)
        verts.append(pa + t * (pb - pa))
        edge_map[key] = vert_count
        vert_count += 1
        return edge_map[key]

    for tet in _TETS:
        tv = cval[:, tet]                                        # [C, 4]
        tp = cpos[:, tet]                                        # [C, 4, 3]
        inside = tv > iso
        n_in = inside.sum(-1)
        for cells in np.nonzero((n_in > 0) & (n_in < 4))[0]:
            vv, pp, ii = tv[cells], tp[cells].astype(np.float64), inside[cells]
            ins = np.nonzero(ii)[0]
            outs = np.nonzero(~ii)[0]
            if len(ins) == 1:
                a = ins[0]
                ids = [vid(pp[a], pp[o], vv[a], vv[o]) for o in outs]
                tris.append([ids[0], ids[1], ids[2]])
            elif len(ins) == 3:
                a = outs[0]
                ids = [vid(pp[i], pp[a], vv[i], vv[a]) for i in ins]
                tris.append([ids[0], ids[2], ids[1]])
            else:
                i0, i1 = ins
                o0, o1 = outs
                a = vid(pp[i0], pp[o0], vv[i0], vv[o0])
                b = vid(pp[i0], pp[o1], vv[i0], vv[o1])
                c = vid(pp[i1], pp[o1], vv[i1], vv[o1])
                d = vid(pp[i1], pp[o0], vv[i1], vv[o0])
                tris.append([a, b, c])
                tris.append([a, c, d])
    if not verts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return (np.asarray(verts, np.float32), np.asarray(tris, np.int32))


# ---------------------------------------------------------------------------
# per-face UV atlas
# ---------------------------------------------------------------------------

def per_face_uv_atlas(n_faces: int, tex_size: int, margin: float = 0.125
                      ) -> np.ndarray:
    """Assign each face a right-triangle chart; two faces share each square
    cell of a sqrt(F)-ish grid. Returns uvs [F, 3, 2] in [0, 1]."""
    cells = (n_faces + 1) // 2
    g = int(math.ceil(math.sqrt(cells)))
    uvs = np.zeros((n_faces, 3, 2), np.float32)
    cw = 1.0 / g
    m = margin * cw
    for f in range(n_faces):
        cell = f // 2
        lower = (f % 2) == 0
        cxr, cyr = (cell % g) * cw, (cell // g) * cw
        if lower:
            tri = [(cxr + m, cyr + m), (cxr + cw - 2 * m, cyr + m),
                   (cxr + m, cyr + cw - 2 * m)]
        else:
            tri = [(cxr + cw - m, cyr + cw - m), (cxr + 2 * m, cyr + cw - m),
                   (cxr + cw - m, cyr + 2 * m)]
        uvs[f] = tri
    return uvs


def rasterize_uv(uvs: np.ndarray, H: int, W: int):
    """-> (face_id [H,W] int32 (-1 empty), bary [H,W,2] float32)."""
    uvs = np.ascontiguousarray(uvs, np.float32)
    F = uvs.shape[0]
    lib = _load_native()
    face_id = np.full((H, W), -1, np.int32)
    bary = np.zeros((H, W, 2), np.float32)
    if lib:
        lib.rasterize_uv(uvs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         ctypes.c_int64(F), H, W,
                         face_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                         bary.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return face_id, bary
    # numpy fallback: sample chart interiors only (coarser but functional)
    for f in range(F):
        t = uvs[f] * [W, H]
        x0, y0 = t.min(0).astype(int)
        x1, y1 = np.ceil(t.max(0)).astype(int)
        ys, xs = np.mgrid[max(y0, 0):min(y1, H), max(x0, 0):min(x1, W)]
        if xs.size == 0:
            continue
        p = np.stack([xs + 0.5, ys + 0.5], -1).reshape(-1, 2)
        d = ((t[1, 1] - t[2, 1]) * (t[0, 0] - t[2, 0])
             + (t[2, 0] - t[1, 0]) * (t[0, 1] - t[2, 1]))
        if abs(d) < 1e-12:
            continue
        w0 = ((t[1, 1] - t[2, 1]) * (p[:, 0] - t[2, 0])
              + (t[2, 0] - t[1, 0]) * (p[:, 1] - t[2, 1])) / d
        w1 = ((t[2, 1] - t[0, 1]) * (p[:, 0] - t[2, 0])
              + (t[0, 0] - t[2, 0]) * (p[:, 1] - t[2, 1])) / d
        w2 = 1 - w0 - w1
        ok = (w0 >= -1e-4) & (w1 >= -1e-4) & (w2 >= -1e-4)
        yy, xx = ys.reshape(-1)[ok], xs.reshape(-1)[ok]
        face_id[yy, xx] = f
        bary[yy, xx, 0] = w0[ok]
        bary[yy, xx, 1] = w1[ok]
    return face_id, bary


def nearest_inpaint(mask: np.ndarray, image: np.ndarray, dilate: int = 3
                    ) -> np.ndarray:
    """Fill unmasked texels from the nearest masked texel within `dilate`
    (renderer.py:240-256)."""
    H, W = mask.shape
    img = np.ascontiguousarray(image, np.float32)
    m8 = np.ascontiguousarray(mask.astype(np.uint8))
    lib = _load_native()
    if lib:
        lib.nearest_inpaint(m8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                            img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            H, W, img.shape[-1], dilate)
        return img
    # numpy fallback: iterative dilation fill
    filled = mask.copy()
    for _ in range(dilate):
        grow = np.zeros_like(filled)
        acc = np.zeros_like(img)
        cnt = np.zeros((H, W, 1), np.float32)
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            sh = np.roll(filled, (dy, dx), (0, 1))
            val = np.roll(img, (dy, dx), (0, 1))
            take = sh & ~filled
            acc[take] += val[take]
            cnt[take] += 1
            grow |= take
        img[grow] = (acc[grow] / np.maximum(cnt[grow], 1))
        filled |= grow
    return img


# ---------------------------------------------------------------------------
# full export
# ---------------------------------------------------------------------------

def export_textured_mesh(density_fn: Callable, out_dir: str, *,
                         resolution: int = 256, density_thresh: float = 10.0,
                         mean_density: Optional[float] = None,
                         bound: float = 1.0, tex_size: int = 1024,
                         chunk: int = 640000, name: str = "") -> str:
    """density_fn(x [N,3] jnp) -> {'sigma': [N], 'albedo': [N,3]}.

    Returns the .obj path. (reference: nerf/renderer.py:121-299)
    """
    import jax.numpy as jnp

    os.makedirs(out_dir, exist_ok=True)
    # 1. density grid (chunked query, renderer.py:129-142)
    lin = np.linspace(-1, 1, resolution, dtype=np.float32)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    sigmas = np.zeros(len(pts), np.float32)
    for s in range(0, len(pts), chunk):
        out = density_fn(jnp.asarray(pts[s:s + chunk]))
        sigmas[s:s + chunk] = np.asarray(out["sigma"], np.float32)
    grid = sigmas.reshape(resolution, resolution, resolution)

    thresh = density_thresh if mean_density is None else min(mean_density,
                                                             density_thresh)
    # 2. iso-surface
    verts, tris = marching_tetrahedra(grid, thresh)
    if len(verts) == 0:
        raise ValueError("empty mesh: no density above threshold "
                         f"{thresh} at resolution {resolution}")
    verts = verts / (resolution - 1.0) * 2.0 - 1.0  # voxel -> [-1, 1]

    # 3.-4. UV atlas + texture bake
    uvs = per_face_uv_atlas(len(tris), tex_size)
    face_id, bary = rasterize_uv(uvs, tex_size, tex_size)
    mask = face_id >= 0
    tex = np.full((tex_size, tex_size, 3), 0.0, np.float32)
    yy, xx = np.nonzero(mask)
    f = face_id[yy, xx]
    w0 = bary[yy, xx, 0:1]
    w1 = bary[yy, xx, 1:2]
    w2 = 1.0 - w0 - w1
    tv = verts[tris[f]]                                   # [M, 3, 3]
    surf = w0 * tv[:, 0] + w1 * tv[:, 1] + w2 * tv[:, 2]  # [M, 3]
    albedo = np.zeros((len(surf), 3), np.float32)
    for s in range(0, len(surf), chunk):
        out = density_fn(jnp.asarray(surf[s:s + chunk]))
        albedo[s:s + chunk] = np.asarray(out["albedo"], np.float32)
    tex[yy, xx] = albedo

    # 5. seam inpaint
    tex = nearest_inpaint(mask, tex, dilate=3)

    # 6. write files (renderer.py:266-298)
    from PIL import Image

    tex_u8 = (np.clip(tex, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(tex_u8).save(os.path.join(out_dir, f"{name}albedo.png"))

    obj_path = os.path.join(out_dir, f"{name}mesh.obj")
    with open(obj_path, "w") as fp:
        fp.write(f"mtllib {name}mesh.mtl \n")
        for v in verts:
            fp.write(f"v {v[0]} {v[1]} {v[2]} \n")
        for face in range(len(tris)):
            for k in range(3):
                u, vv_ = uvs[face, k]
                fp.write(f"vt {u} {1 - vv_} \n")
        fp.write("usemtl mat0 \n")
        for i, t in enumerate(tris):
            a, b, c = t + 1
            fp.write(f"f {a}/{3 * i + 1} {b}/{3 * i + 2} {c}/{3 * i + 3} \n")
    with open(os.path.join(out_dir, f"{name}mesh.mtl"), "w") as fp:
        fp.write("newmtl mat0 \nKa 1.000000 1.000000 1.000000 \n"
                 "Kd 1.000000 1.000000 1.000000 \n"
                 "Ks 0.000000 0.000000 0.000000 \nTr 1.000000 \n"
                 f"illum 1 \nNs 0.000000 \nmap_Kd {name}albedo.png \n")
    return obj_path
