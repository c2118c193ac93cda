"""Camera sampling and ray generation (TPU-native, fully jittable).

Rebuilds the behavior of the reference's camera layer:
- random orbit pose sampling     (reference: nerf/provider.py:72-141)
- circle (test orbit) poses      (reference: nerf/provider.py:144-175)
- view-direction bucketing       (reference: nerf/provider.py:52-69)
- pixel -> ray transform         (reference: nerf/utils.py:42-106)

Differences from the reference (deliberate, TPU-first):
- Everything is a pure function of a `jax.random` key — no global RNG.
- The uniform-sphere-vs-orbit choice is made *per batch element* with
  `jnp.where` instead of a Python-level coin flip for the whole batch,
  so the sampler is vectorized and jit-stable.
- Ray generation is batched over cameras; the reference always used B=1.

Coordinate conventions match the reference: y-up world with cameras looking
at the origin, up = (0, -1, 0); pose is cam2world [B, 4, 4]; pixel centers at
+0.5; camera rays (x, y, 1) normalized then rotated.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

# View direction buckets (reference: nerf/provider.py:52-69 and the dir-text
# prompt list in nerf/utils.py:302): front / side / back / side / overhead / bottom.
DIR_TEXTS = ("front", "side", "back", "side", "overhead", "bottom")


def safe_normalize(x: jax.Array, eps: float = 1e-20) -> jax.Array:
    """x / ||x|| with a clamped norm (reference: nerf/utils.py:39-40)."""
    return x * jax.lax.rsqrt(jnp.clip(jnp.sum(x * x, -1, keepdims=True), eps, None))


def get_view_direction(thetas: jax.Array, phis: jax.Array, overhead: float,
                       front: float) -> jax.Array:
    """Bucket (theta, phi) [radians] into 6 view-direction classes.

    front=0: phi in [0, front); side=1: [front, pi); back=2: [pi, pi+front);
    side=3: [pi+front, 2pi); overridden by theta: top=4 if theta <= overhead,
    bottom=5 if theta >= pi - overhead. (reference: nerf/provider.py:52-69)
    """
    res = jnp.zeros(thetas.shape, dtype=jnp.int32)
    res = jnp.where((phis >= front) & (phis < jnp.pi), 1, res)
    res = jnp.where((phis >= jnp.pi) & (phis < (jnp.pi + front)), 2, res)
    res = jnp.where(phis >= (jnp.pi + front), 3, res)
    res = jnp.where(thetas <= overhead, 4, res)
    res = jnp.where(thetas >= (jnp.pi - overhead), 5, res)
    return res


def _lookat_poses(centers: jax.Array, targets: jax.Array,
                  up_noise: jax.Array | float = 0.0) -> jax.Array:
    """Build cam2world poses looking from `centers` to `targets` (y-down up vector)."""
    size = centers.shape[0]
    forward = safe_normalize(targets - centers)
    up = jnp.tile(jnp.array([0.0, -1.0, 0.0]), (size, 1))
    right = safe_normalize(jnp.cross(forward, up))
    up = safe_normalize(jnp.cross(right, forward) + up_noise)
    rot = jnp.stack((right, up, forward), axis=-1)  # [B, 3, 3] columns
    poses = jnp.tile(jnp.eye(4), (size, 1, 1))
    poses = poses.at[:, :3, :3].set(rot)
    poses = poses.at[:, :3, 3].set(centers)
    return poses


def rand_poses(
    key: jax.Array,
    size: int,
    radius_range: Tuple[float, float] = (1.0, 1.5),
    theta_range: Tuple[float, float] = (0.0, 100.0),
    phi_range: Tuple[float, float] = (0.0, 360.0),
    angle_overhead: float = 30.0,
    angle_front: float = 60.0,
    jitter: bool = False,
    uniform_sphere_rate: float = 0.5,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sample random orbit-camera poses (reference: nerf/provider.py:72-141).

    Returns (poses [size,4,4], dirs [size] int32, thetas, phis).
    Angles are given in degrees (converted internally, like the reference).
    """
    theta_range = tuple(map(math.radians, theta_range))
    phi_range = tuple(map(math.radians, phi_range))
    angle_overhead = math.radians(angle_overhead)
    angle_front = math.radians(angle_front)

    k_r, k_u, k_sph, k_tp, k_cj, k_tj, k_un = jax.random.split(key, 7)
    radius = jax.random.uniform(k_r, (size,), minval=radius_range[0],
                                maxval=radius_range[1])

    # uniform-on-sphere candidate (upper hemisphere biased: y ~ U[0,1])
    u3 = jax.random.uniform(k_sph, (size, 3))
    unit = safe_normalize(jnp.stack(
        [(u3[:, 0] - 0.5) * 2.0, u3[:, 1], (u3[:, 2] - 0.5) * 2.0], axis=-1))
    thetas_sph = jnp.arccos(jnp.clip(unit[:, 1], -1.0, 1.0))
    phis_sph = jnp.arctan2(unit[:, 0], unit[:, 2])
    phis_sph = jnp.where(phis_sph < 0, phis_sph + 2 * jnp.pi, phis_sph)
    centers_sph = unit * radius[:, None]

    # orbit candidate
    u2 = jax.random.uniform(k_tp, (size, 2))
    thetas_orb = theta_range[0] + u2[:, 0] * (theta_range[1] - theta_range[0])
    phis_orb = phi_range[0] + u2[:, 1] * (phi_range[1] - phi_range[0])
    centers_orb = jnp.stack([
        radius * jnp.sin(thetas_orb) * jnp.sin(phis_orb),
        radius * jnp.cos(thetas_orb),
        radius * jnp.sin(thetas_orb) * jnp.cos(phis_orb),
    ], axis=-1)

    use_sphere = jax.random.uniform(k_u, (size,)) < uniform_sphere_rate
    thetas = jnp.where(use_sphere, thetas_sph, thetas_orb)
    phis = jnp.where(use_sphere, phis_sph, phis_orb)
    centers = jnp.where(use_sphere[:, None], centers_sph, centers_orb)

    targets = jnp.zeros_like(centers)
    up_noise: jax.Array | float = 0.0
    if jitter:  # pose jitter (reference: nerf/provider.py:116-128)
        centers = centers + (jax.random.uniform(k_cj, (size, 3)) * 0.2 - 0.1)
        targets = targets + jax.random.normal(k_tj, (size, 3)) * 0.2
        up_noise = jax.random.normal(k_un, (size, 3)) * 0.02

    poses = _lookat_poses(centers, targets, up_noise)
    dirs = get_view_direction(thetas, phis, angle_overhead, angle_front)
    return poses, dirs, thetas, phis


def circle_poses(
    phi_deg: jax.Array,
    radius: float = 1.25,
    theta_deg: float = 60.0,
    angle_overhead: float = 30.0,
    angle_front: float = 60.0,
) -> Tuple[jax.Array, jax.Array]:
    """Deterministic orbit poses for the 360° test loop
    (reference: nerf/provider.py:144-175). `phi_deg` may be a [B] array.
    Returns (poses [B,4,4], dirs [B]).
    """
    phi = jnp.radians(jnp.atleast_1d(jnp.asarray(phi_deg, jnp.float32)))
    theta = jnp.full_like(phi, math.radians(theta_deg))
    centers = jnp.stack([
        radius * jnp.sin(theta) * jnp.sin(phi),
        radius * jnp.cos(theta),
        radius * jnp.sin(theta) * jnp.cos(phi),
    ], axis=-1)
    poses = _lookat_poses(centers, jnp.zeros_like(centers))
    dirs = get_view_direction(theta, phi, math.radians(angle_overhead),
                              math.radians(angle_front))
    return poses, dirs


class Rays(NamedTuple):
    origins: jax.Array     # [B, H*W, 3]
    directions: jax.Array  # [B, H*W, 3]


def get_rays(poses: jax.Array, intrinsics: jax.Array, H: int, W: int) -> Rays:
    """Full-image rays from cam2world poses + pinhole intrinsics.

    poses: [B, 4, 4]; intrinsics: [4] = (fx, fy, cx, cy).
    (reference: nerf/utils.py:42-106, full-image N=-1 branch; the subsampling
    branch is unnecessary here — DreamFusion always renders full frames.)
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    x = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :]  # [1, W]
    y = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None]  # [H, 1]
    xs = jnp.broadcast_to((x - cx) / fx, (H, W))
    ys = jnp.broadcast_to((y - cy) / fy, (H, W))
    dirs_cam = jnp.stack([xs, ys, jnp.ones((H, W))], axis=-1).reshape(-1, 3)
    dirs_cam = safe_normalize(dirs_cam)  # [HW, 3]
    # rotate: d_world = R @ d_cam  (== d_cam @ R^T)
    rays_d = jnp.einsum("nk,bjk->bnj", dirs_cam, poses[:, :3, :3])
    rays_o = jnp.broadcast_to(poses[:, None, :3, 3], rays_d.shape)
    return Rays(rays_o, rays_d)


def fov_to_focal(fov_deg: jax.Array | float, pixels: int) -> jax.Array:
    """focal = pixels / (2 tan(fov/2)) (reference: nerf/provider.py:212)."""
    return pixels / (2.0 * jnp.tan(jnp.radians(fov_deg) / 2.0))


def sample_train_batch(key: jax.Array, cfg, B: Optional[int] = None):
    """One training batch of cameras + rays, jit-friendly.

    Replaces NeRFDataset(train).collate (reference: nerf/provider.py:202-236):
    random orbit poses, random fov per batch, full-image rays at (h, w).
    Returns dict with rays_o/rays_d [B, h*w, 3] and dir [B].
    """
    B = B or cfg.batch_size
    k_pose, k_fov = jax.random.split(key)
    poses, dirs, _, _ = rand_poses(
        k_pose, B, radius_range=cfg.radius_range,
        angle_overhead=cfg.angle_overhead, angle_front=cfg.angle_front,
        jitter=cfg.jitter_pose, uniform_sphere_rate=cfg.uniform_sphere_rate)
    fov = jax.random.uniform(k_fov, (), minval=cfg.fovy_range[0],
                             maxval=cfg.fovy_range[1])
    focal = fov_to_focal(fov, cfg.h)
    intrinsics = jnp.stack([focal, focal, cfg.w / 2.0, cfg.h / 2.0])
    rays = get_rays(poses, intrinsics, cfg.h, cfg.w)
    return {"rays_o": rays.origins, "rays_d": rays.directions, "dir": dirs,
            "H": cfg.h, "W": cfg.w}


def sample_test_batch(index: jax.Array, size: int, cfg, H: Optional[int] = None,
                      W: Optional[int] = None):
    """Deterministic test/val batch: circle orbit at theta=60°,
    radius=1.2*r_max, mean fov (reference: nerf/provider.py:214-222)."""
    H = H or cfg.H
    W = W or cfg.W
    index = jnp.atleast_1d(jnp.asarray(index))
    phi_deg = (index.astype(jnp.float32) / size) * 360.0
    poses, dirs = circle_poses(
        phi_deg, radius=cfg.radius_range[1] * 1.2, theta_deg=60.0,
        angle_overhead=cfg.angle_overhead, angle_front=cfg.angle_front)
    fov = (cfg.fovy_range[0] + cfg.fovy_range[1]) / 2.0
    focal = fov_to_focal(fov, H)
    intrinsics = jnp.stack([focal, focal, W / 2.0, H / 2.0])
    rays = get_rays(poses, intrinsics, H, W)
    return {"rays_o": rays.origins, "rays_d": rays.directions, "dir": dirs,
            "H": H, "W": W}
