"""Microbench: occupancy-probe gather variants on the real TPU.

Motivation: the train-step trace shows a single pred[2^21] gather
(marching.py _probe_occupancy, C==1 branch) costing 16.9 ms/step for ~2M
probes (~120M probes/s). Question: is the bool (pred) element type the
slow path, and does a packed-bit / row-gather layout beat it?

Timing: one jitted program chaining R identical gathers (index perturbed
per iteration so nothing folds), one float() pull at the end; wall/R.
This is the tunnel-safe method (NOTES.md).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

H = 128
T = H * H * H           # 2,097,152
M = 2 * 1024 * 1024     # probes per gather (matches trace)
R = 30                  # chained gathers per dispatch

key = jax.random.PRNGKey(0)
# coherent-ish indices: rays march through the volume, so consecutive
# probes hit nearby cells. Model as blocks of 512 sequential cells.
base = jax.random.randint(key, (M // 512,), 0, T - 512)
idx = (base[:, None] + jnp.arange(512)[None, :]).reshape(-1).astype(jnp.int32)
idx_rand = jax.random.randint(key, (M,), 0, T).astype(jnp.int32)

occ_bool = jax.random.uniform(key, (T,)) < 0.1
tables = {
    "pred": occ_bool,
    "uint8": occ_bool.astype(jnp.uint8),
    "int32": occ_bool.astype(jnp.int32),
    "f32": occ_bool.astype(jnp.float32),
}


def run(fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(out)  # warm + compile
    best = float("inf")
    for _rep in range(3):   # min over reps: tunnel dispatch jitter
        t0 = time.perf_counter()
        _ = float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def make_take(table):
    def fn(idx):
        acc = jnp.float32(0.0)
        for i in range(R):
            v = jnp.take(table, (idx + i) & (T - 1), axis=0)
            acc = acc + jnp.sum(v.astype(jnp.float32))
        return acc
    return fn


# packed bits along z: int32 word table [T/32], probe = word >> (idx&31) & 1
packed_np = np.packbits(
    np.asarray(occ_bool).reshape(-1, 32)[:, ::-1], axis=1, bitorder="little")
packed = jnp.asarray(packed_np.view(np.uint32).reshape(-1).astype(np.int32))


def fn_packed(idx):
    acc = jnp.float32(0.0)
    for i in range(R):
        j = (idx + i) & (T - 1)
        w = jnp.take(packed, j >> 5, axis=0)
        bit = (w >> (j & 31)) & 1
        acc = acc + jnp.sum(bit.astype(jnp.float32))
    return acc


# row-gather: [H*H, H] f32 rows, gather row then one-hot column reduce
rows_f32 = occ_bool.astype(jnp.float32).reshape(H * H, H)
rows_u8 = occ_bool.astype(jnp.uint8).reshape(H * H, H)


def make_rowgather(rows):
    def fn(idx):
        acc = jnp.float32(0.0)
        for i in range(R):
            j = (idx + i) & (T - 1)
            r = jnp.take(rows, j >> 7, axis=0)          # [M, H]
            col = (j & 127)[:, None]
            onehot = (jnp.arange(H)[None, :] == col)
            v = jnp.sum(r.astype(jnp.float32) * onehot, axis=1)
            acc = acc + jnp.sum(v)
        return acc
    return fn


for label, ix in (("coherent", idx), ("random", idx_rand)):
    print(f"--- {label} indices, M={M}, R={R} chained ---", flush=True)
    for name, tab in tables.items():
        dt = run(make_take(tab), ix)
        print(f"take[{name:6s}]: {dt / R * 1e3:7.2f} ms/gather "
              f"({M * R / dt / 1e6:6.0f}M probes/s)", flush=True)
    dt = run(fn_packed, ix)
    print(f"packed-bit  : {dt / R * 1e3:7.2f} ms/gather "
          f"({M * R / dt / 1e6:6.0f}M probes/s)", flush=True)
    for rname, rows in (("f32", rows_f32), ("u8", rows_u8)):
        dt = run(make_rowgather(rows), ix)
        print(f"row+onehot[{rname}]: {dt / R * 1e3:7.2f} ms/gather "
              f"({M * R / dt / 1e6:6.0f}M probes/s)", flush=True)
