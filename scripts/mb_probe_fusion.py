"""A/B the PRODUCTION-shaped row-probe against fusion-friendlier variants.

The r3 800^2 ball trace showed the count_sort row probe split into two
kernels: a gather fusion materializing u8[20.7M, 128] (2.65 GB) and a
separate convert_reduce — 174M probes/s end-to-end vs the 318M probes/s the
isolated microbench (mb_occ_probe.py) measured when the reduce fused. This
reproduces the production shape (pred[256*128] pooled table, [N, S] index
array, count/first/last consumers) and times formulations that might let
XLA fuse the lane reduce into the gather.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/mb_probe_fusion.py
"""

import time

import jax
import jax.numpy as jnp

N, S = 647168, 32          # 800^2 padded rays x pooled probes
T = 32768                  # pooled 32^3 table
REPS = 10


def consumers(is_occ):
    """count_sort's real uses of the probe result."""
    counts = jnp.sum(is_occ, axis=1)
    idx = jnp.arange(S, dtype=jnp.float32)[None, :]
    first = jnp.min(jnp.where(is_occ, idx, jnp.inf), axis=1)
    last = jnp.max(jnp.where(is_occ, idx, -jnp.inf), axis=1)
    return counts + first.astype(jnp.int32) + last.astype(jnp.int32)


def v_u8_row(tab_bool, fidx):
    rows = tab_bool.astype(jnp.uint8).reshape(T // 128, 128)
    r = jnp.take(rows, fidx >> 7, axis=0)                    # [N, S, 128]
    onehot = (fidx & 127)[..., None] == jnp.arange(128, dtype=jnp.int32)
    return consumers(jnp.sum(r * onehot.astype(r.dtype), axis=-1) != 0)


def v_i32_row(tab_bool, fidx):
    rows = tab_bool.astype(jnp.int32).reshape(T // 128, 128)
    r = jnp.take(rows, fidx >> 7, axis=0)
    onehot = (fidx & 127)[..., None] == jnp.arange(128, dtype=jnp.int32)
    return consumers(jnp.sum(jnp.where(onehot, r, 0), axis=-1) != 0)


def v_f32_dot(tab_bool, fidx):
    rows = tab_bool.astype(jnp.float32).reshape(T // 128, 128)
    r = jnp.take(rows, fidx >> 7, axis=0)
    onehot = ((fidx & 127)[..., None]
              == jnp.arange(128, dtype=jnp.int32)).astype(jnp.float32)
    return consumers(jnp.einsum("nsl,nsl->ns", r, onehot) > 0.5)


def v_elem(tab_bool, fidx):
    return consumers(jnp.take(tab_bool.astype(jnp.uint8), fidx, axis=0) != 0)


def v_bitpack(tab_bool, fidx):
    """32 cells per i32 word, ROW-gathered: [T/4096, 128] word rows —
    128x fewer HBM bytes per probe row than the u8 row; the intermediate
    is [N, S, 128] i32 though (4x the u8 one)."""
    words = jnp.sum(tab_bool.reshape(T // 32, 32).astype(jnp.uint32)
                    << jnp.arange(32, dtype=jnp.uint32)[None, :], axis=1)
    rows = words.reshape(T // 4096, 128)                     # [8, 128]
    r = jnp.take(rows, fidx >> 12, axis=0)                   # [N, S, 128]
    lane = (fidx >> 5) & 127
    onehot = lane[..., None] == jnp.arange(128, dtype=jnp.int32)
    word = jnp.sum(jnp.where(onehot, r, 0), axis=-1)         # [N, S]
    return consumers(((word >> (fidx & 31).astype(jnp.uint32)) & 1) != 0)


def main():
    key = jax.random.PRNGKey(0)
    tab = jax.random.uniform(key, (T,)) < 0.1
    fidx = jax.random.randint(jax.random.PRNGKey(1), (N, S), 0, T,
                              dtype=jnp.int32)

    for name, fn in (("u8 row+onehot (prod)", v_u8_row),
                     ("i32 row+select", v_i32_row),
                     ("f32 row einsum", v_f32_dot),
                     ("element take u8", v_elem),
                     ("bitpacked word row", v_bitpack)):
        f = jax.jit(lambda t_, i_, fn=fn: fn(t_, i_))
        r = f(tab, fidx)
        _ = float(jnp.sum(r))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(REPS):
                r = f(tab, fidx)
            _ = float(jnp.sum(r))
            best = min(best, (time.perf_counter() - t0) / REPS)
        rate = N * S / best / 1e6
        print(f"{name:22s}: {best * 1e3:7.2f} ms ({rate:6.0f}M probes/s)",
              flush=True)


if __name__ == "__main__":
    main()
