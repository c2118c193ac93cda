"""Device-mesh parallelism (ICI/DCN) for training and rendering.

The reference's only parallelism is torch DDP over replicated models
(nerf/utils.py:200-202, eval all_reduce/all_gather :787-797) plus
embarrassingly-parallel cluster job fan-out. The TPU-native equivalent:

- TRAINING (data parallel): each device samples its own cameras (fold the
  PRNG key by axis index), computes local grads, `pmean`s them over the
  'data' mesh axis (rides ICI; multi-host DCN handled identically by XLA),
  and applies the replicated update. Expressed with `jax.shard_map` so the
  collective placement is explicit.
- RENDERING (ray parallel): rays are embarrassingly parallel — shard the ray
  axis over devices, render locally, and let the out-sharding gather the
  image. This replaces the reference's sequential `max_ray_batch` chunking
  (nerf/renderer.py:631-644) as the cross-device scaling mechanism (chunking
  is still used *within* a device to bound memory).

Everything works identically on a virtual CPU mesh
(xla_force_host_platform_device_count) — how the tests run.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def data_parallel_grads(grads_fn: Callable, mesh: Mesh, axis: str = "data"):
    """Wrap grads_fn(params, step, gparams, text_z, key, grid_state) ->
    (loss, metrics, grads) into a data-parallel version: per-device keys,
    pmean over the mesh. All operands and results are replicated."""

    def shard_fn(params, step, gparams, text_z, key, grid_state):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        loss, metrics, grads = grads_fn(params, step, gparams, text_z, key,
                                        grid_state)
        return jax.lax.pmean((loss, metrics, grads), axis)

    def wrapped(params, step, gparams, text_z, key, grid_state):
        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(params, step, gparams, text_z, key, grid_state)

    return wrapped


def shard_rays_render(render_fn: Callable, mesh: Mesh, axis: str = "data"):
    """Wrap render_fn(params, rays_o, rays_d, grid_state) -> dict of
    per-ray outputs into a ray-sharded version over the mesh. The ray count
    must divide by the mesh size (callers pad; full frames do)."""

    n = mesh.devices.size

    def wrapped(params, rays_o, rays_d, grid_state=None):
        N = rays_o.shape[0]
        pad = (-N) % n
        if pad:
            rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))], 0)
            rays_d = jnp.concatenate([rays_d, jnp.ones((pad, 3))], 0)

        def shard_fn(params, ro, rd, gs):
            return render_fn(params, ro, rd, gs)

        out = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P()),
            out_specs=P(axis),
            check_vma=False,
        )(params, rays_o, rays_d, grid_state)
        if pad:
            out = jax.tree.map(lambda x: x[:N], out)
        return out

    return wrapped
