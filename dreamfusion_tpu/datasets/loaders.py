"""Multi-view dataset format loaders (numpy).

Rebuilds datasets/nerf/lib/load_data.py:20-197: a `load_data(cfg)` dispatch
returning the uniform dict {hwf, HW, Ks, near, far, near_clip, i_train,
i_val, i_test, poses, render_poses, images, depths, irregular_shape}.

Implemented formats: blender (nerf_synthetic transforms_*.json), llff
(poses_bounds.npy), nsvf / tankstemple / standard_blendedmvs-style
(pose/*.txt + rgb/*.png + intrinsics.txt), deepvoxels, dtu (cameras.npz),
blendedmvs (cams/ + blended_images/). The long-tail formats the reference
also ships (co3d, omniScenes, stanford3D, toydesk, tankstemple360) raise
with pointers until their loaders land.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict

import numpy as np


def _imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    return (imageio.imread(path) / 255.0).astype(np.float32)


def _pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """Orbit render pose (reference: lib/load_blender.py:8-33)."""
    def trans_t(t):
        return np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, t],
                         [0, 0, 0, 1]], np.float32)

    def rot_phi(p):
        return np.array([[1, 0, 0, 0], [0, np.cos(p), -np.sin(p), 0],
                         [0, np.sin(p), np.cos(p), 0], [0, 0, 0, 1]], np.float32)

    def rot_theta(t):
        return np.array([[np.cos(t), 0, -np.sin(t), 0], [0, 1, 0, 0],
                         [np.sin(t), 0, np.cos(t), 0], [0, 0, 0, 1]], np.float32)

    c2w = trans_t(radius)
    c2w = rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = rot_theta(theta / 180.0 * np.pi) @ c2w
    return np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0],
                     [0, 0, 0, 1]], np.float32) @ c2w


def default_render_poses(n: int = 40, phi: float = -30.0, radius: float = 4.0):
    return np.stack([_pose_spherical(a, phi, radius)
                     for a in np.linspace(-180, 180, n + 1)[:-1]])


# -- blender (nerf_synthetic) ------------------------------------------------------

def load_blender_data(basedir: str, testskip: int = 1):
    splits = ["train", "val", "test"]
    all_imgs, all_poses, i_split = [], [], []
    count = 0
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json")) as f:
            meta = json.load(f)
        skip = 1 if s == "train" else max(testskip, 1)
        idxs = []
        for frame in meta["frames"][::skip]:
            fp = os.path.join(basedir, frame["file_path"] + ".png")
            all_imgs.append(_imread(fp))
            all_poses.append(np.array(frame["transform_matrix"], np.float32))
            idxs.append(count)
            count += 1
        i_split.append(np.array(idxs))
        camera_angle_x = float(meta["camera_angle_x"])
    imgs = np.stack(all_imgs)
    poses = np.stack(all_poses)
    H, W = imgs.shape[1:3]
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    return imgs, poses, default_render_poses(), [H, W, focal], i_split


# -- llff (poses_bounds.npy) --------------------------------------------------------

def load_llff_data(basedir: str, factor: int = 8, bd_factor: float = 0.75,
                   recenter: bool = True, spherify: bool = False,
                   llffhold: int = 8):
    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
    bds = poses_arr[:, -2:].transpose([1, 0])

    img_dir = os.path.join(basedir, f"images_{factor}" if factor > 1 else "images")
    if not os.path.isdir(img_dir):
        img_dir = os.path.join(basedir, "images")
        factor = 1
    img_files = sorted(
        f for f in glob.glob(os.path.join(img_dir, "*"))
        if f.lower().endswith((".png", ".jpg", ".jpeg")))
    imgs = np.stack([_imread(f)[..., :3] for f in img_files])

    poses[:2, 4, :] = np.array(imgs.shape[1:3]).reshape([2, 1])
    poses[2, 4, :] = poses[2, 4, :] / factor

    # llff drb -> rub coordinate fix (the classic column swap)
    poses = np.concatenate([poses[:, 1:2, :], -poses[:, 0:1, :],
                            poses[:, 2:, :]], 1)
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)   # [N, 3, 5]
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)

    sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
    poses[:, :3, 3] *= sc
    bds *= sc

    if recenter:
        poses = _recenter_poses(poses)

    i_test = np.array([np.argmin(
        np.sum(np.square(poses[:, :3, 3]
                         - poses[:, :3, 3].mean(0)), -1))])
    render_poses = np.stack([p[:3, :4] for p in poses])  # reuse input orbit
    return imgs, poses, bds, render_poses, i_test


def _recenter_poses(poses):
    def viewmatrix(z, up, pos):
        vec2 = z / np.linalg.norm(z)
        vec0 = np.cross(up, vec2)
        vec0 = vec0 / np.linalg.norm(vec0)
        vec1 = np.cross(vec2, vec0)
        return np.stack([vec0, vec1, vec2, pos], 1)

    hwf = poses[:, :3, 4:]
    center = poses[:, :3, 3].mean(0)
    z = poses[:, :3, 2].sum(0)
    up = poses[:, :3, 1].sum(0)
    c2w = np.concatenate([viewmatrix(z, up, center),
                          np.array([[0, 0, 0, 1.0]])], 0)
    bottom = np.tile(np.array([0, 0, 0, 1.0]).reshape(1, 1, 4),
                     (poses.shape[0], 1, 1))
    p44 = np.concatenate([poses[:, :3, :4], bottom], 1)
    poses_fixed = (np.linalg.inv(c2w) @ p44)[:, :3, :4]
    return np.concatenate([poses_fixed, hwf], -1).astype(np.float32)


# -- pose/*.txt + rgb/*.png conventions (nsvf, tankstemple, standard bmvs) --------

def load_posedir_data(basedir: str, n_sets: int = 3):
    """(reference: lib/load_nsvf.py, load_tankstemple.py) — filenames start
    with the split digit."""
    pose_paths = sorted(glob.glob(os.path.join(basedir, "pose", "*txt")))
    rgb_paths = sorted(
        p for ext in ("*png", "*jpg") for p in
        glob.glob(os.path.join(basedir, "rgb", ext)))
    all_poses, all_imgs = [], []
    i_split = [[] for _ in range(n_sets)]
    for i, (pp, rp) in enumerate(zip(pose_paths, rgb_paths)):
        i_set = min(int(os.path.split(rp)[-1][0]), n_sets - 1)
        all_imgs.append(_imread(rp))
        all_poses.append(np.loadtxt(pp).astype(np.float32))
        i_split[i_set].append(i)
    imgs = np.stack(all_imgs)
    poses = np.stack(all_poses)
    H, W = imgs[0].shape[:2]
    K = np.loadtxt(os.path.join(basedir, "intrinsics.txt"))
    if K.ndim == 1:
        focal = float(K.reshape(-1)[0])
        K = None
    else:
        focal = float(K[0, 0])
    traj = os.path.join(basedir, "test_traj.txt")
    if os.path.isfile(traj):
        render_poses = np.loadtxt(traj).reshape(-1, 4, 4).astype(np.float32)
    else:
        render_poses = poses[i_split[-1]] if i_split[-1] else poses[:1]
    return imgs, poses, render_poses, [H, W, focal], K, [np.array(s) for s in i_split]


# -- deepvoxels ----------------------------------------------------------------

def load_deepvoxels_data(basedir: str, scene: str):
    """(reference: lib/load_deepvoxels.py) — train/validation/test dirs with
    pose/*.txt, rgb/*.png and a shared intrinsics.txt."""
    def parse_intrinsics(fp, H, W):
        with open(fp) as f:
            vals = f.readline().split()
        focal, cx, cy = float(vals[0]), float(vals[1]), float(vals[2])
        return focal * W / 512.0  # deepvoxels intrinsics are for 512 px

    splits = ["train", "validation", "test"]
    all_imgs, all_poses, i_split = [], [], []
    count = 0
    H = W = None
    focal = None
    for s in splits:
        d = os.path.join(basedir, s, scene)
        rgbs = sorted(glob.glob(os.path.join(d, "rgb", "*.png")))
        poses = sorted(glob.glob(os.path.join(d, "pose", "*.txt")))
        idxs = []
        for rp, pp in zip(rgbs, poses):
            img = _imread(rp)[..., :3]
            if H is None:
                H, W = img.shape[:2]
                focal = parse_intrinsics(os.path.join(d, "intrinsics.txt"), H, W)
            all_imgs.append(img)
            all_poses.append(np.loadtxt(pp).reshape(4, 4).astype(np.float32))
            idxs.append(count)
            count += 1
        i_split.append(np.array(idxs))
    imgs = np.stack(all_imgs)
    poses = np.stack(all_poses)
    return imgs, poses, poses[i_split[2]], [H, W, focal], i_split


# -- dtu -------------------------------------------------------------------------

def load_dtu_data_np(basedir: str):
    """(reference: lib/load_dtu.py) — cameras.npz world_mat/scale_mat +
    image/*.png, IDR convention; projection decomposed without cv2."""
    cam = np.load(os.path.join(basedir, "cameras.npz"))
    img_files = sorted(glob.glob(os.path.join(basedir, "image", "*.png")))
    n = len(img_files)
    imgs = np.stack([_imread(f)[..., :3] for f in img_files])
    poses, Ks = [], []
    for i in range(n):
        P = (cam[f"world_mat_{i}"] @ cam.get(f"scale_mat_{i}", np.eye(4)))[:3, :4]
        K, R, t = _decompose_projection(P)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = (-R.T @ t).ravel()
        # IDR -> OpenGL camera convention (flip y, z)
        c2w[:3, 1:3] *= -1
        poses.append(c2w)
        Ks.append(K)
    poses = np.stack(poses)
    Ks = np.stack(Ks).astype(np.float32)
    H, W = imgs.shape[1:3]
    i = np.arange(n)
    i_split = [i[i % 8 != 0], i[i % 8 == 0], i[i % 8 == 0]]
    return imgs, poses, poses[i_split[2]], [H, W, float(Ks[0, 0, 0])], Ks, i_split


def _decompose_projection(P):
    """RQ-decompose P = K [R | t] with positive-diagonal K."""
    M = P[:3, :3]
    # RQ via QR of reversed matrix
    Pm = np.flipud(np.eye(3))
    q, r = np.linalg.qr((Pm @ M).T)
    K = Pm @ r.T @ Pm
    R = Pm @ q.T
    sg = np.diag(np.sign(np.diag(K)))
    K = K @ sg
    R = sg @ R
    if np.linalg.det(R) < 0:
        K, R = -K, -R
    t = np.linalg.inv(K) @ P[:3, 3]
    return (K / K[2, 2]).astype(np.float32), R.astype(np.float32), t


# -- dispatch (load_data.py:20-197) -----------------------------------------------

def inward_nearfar_heuristic(cam_o: np.ndarray, ratio: float = 0.05):
    dist = np.linalg.norm(cam_o[:, None] - cam_o, axis=-1)
    far = float(dist.max())
    return far * ratio, far


def load_data(args) -> Dict:
    """args: object/dict with dataset_type, datadir, and per-format options."""
    if isinstance(args, dict):
        from types import SimpleNamespace

        args = SimpleNamespace(**args)
    get = lambda k, d=None: getattr(args, k, d)
    K, depths, near_clip = None, None, None
    dt = args.dataset_type

    if dt == "blender":
        images, poses, render_poses, hwf, i_split = load_blender_data(
            args.datadir, testskip=get("testskip", 1))
        i_train, i_val, i_test = i_split
        near, far = 2.0, 6.0
        if images.shape[-1] == 4:
            bkgd = np.array(get("bkgd", (1.0, 1.0, 1.0)))
            images = images[..., :3] * images[..., 3:] + (1 - images[..., 3:]) * bkgd
    elif dt == "llff":
        images, poses, bds, render_poses, i_test = load_llff_data(
            args.datadir, get("factor", 8), spherify=get("spherify", False))
        hwf = poses[0, :3, -1]
        poses = poses[:, :3, :4]
        if get("llffhold", 8) > 0:
            i_test = np.arange(images.shape[0])[::get("llffhold", 8)]
        i_val = i_test
        i_train = np.array([i for i in range(len(images)) if i not in i_test])
        if get("ndc", False):
            near, far = 0.0, 1.0
        else:
            near, far = float(bds.min()) * 0.9, float(bds.max())
    elif dt in ("nsvf", "tankstemple", "standard_blendedmvs", "blendedmvs"):
        images, poses, render_poses, hwf, K, i_split = load_posedir_data(
            args.datadir, n_sets=3 if dt == "nsvf" else 2 + 1)
        i_train, i_val, i_test = (i_split + [i_split[-1]])[:3]
        ratio = 0.0 if dt == "tankstemple" else 0.05
        near, far = inward_nearfar_heuristic(poses[i_train, :3, 3], ratio)
        if images.shape[-1] == 4:
            bkgd = np.array(get("bkgd", (1.0, 1.0, 1.0)))
            images = images[..., :3] * images[..., 3:] + (1 - images[..., 3:]) * bkgd
    elif dt == "deepvoxels":
        images, poses, render_poses, hwf, i_split = load_deepvoxels_data(
            args.datadir, get("scene", "greek"))
        i_train, i_val, i_test = i_split
        hemi_R = float(np.mean(np.linalg.norm(poses[:, :3, 3], axis=-1)))
        near, far = hemi_R - 1.0, hemi_R + 1.0
    elif dt == "DTU":
        images, poses, render_poses, hwf, K, i_split = load_dtu_data_np(args.datadir)
        i_train, i_val, i_test = i_split
        near, far = inward_nearfar_heuristic(poses[i_train, :3, 3], ratio=0)
    elif dt in ("co3d", "omniscenes", "stanford3D", "toydesk", "tankstemple360"):
        raise NotImplementedError(
            f"dataset_type {dt!r}: loader not ported yet (reference: "
            f"datasets/nerf/lib/load_{dt.lower()}.py)")
    else:
        raise NotImplementedError(f"Unknown dataset type {dt}")

    H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
    HW = np.array([im.shape[:2] for im in images])
    irregular_shape = images.dtype == np.dtype("object")
    if K is None:
        K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]],
                     np.float32)
    Ks = K[None].repeat(len(poses), 0) if K.ndim == 2 else K
    render_poses = np.asarray(render_poses)[..., :4]
    if near_clip is None:
        near_clip = near * 0.7 + far * 0.3
    return dict(hwf=[H, W, focal], HW=HW, Ks=Ks, near=near, far=far,
                near_clip=near_clip, i_train=np.asarray(i_train),
                i_val=np.asarray(i_val), i_test=np.asarray(i_test),
                poses=np.asarray(poses), render_poses=render_poses,
                images=images, depths=depths, irregular_shape=irregular_shape)
