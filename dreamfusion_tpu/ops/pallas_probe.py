"""Fused small-table probe gather for TPU (Pallas/Mosaic).

The staged eval's coarse classify pass probes a pooled occupancy grid
(32^3 = 256x128 u8 after pooling) at ~20M lattice points per 800^2 frame.
XLA lowers the element gather to the row+one-hot form (`marching._row_take`):
a kCustom gather materializing a [20M, 128] u8 row matrix in HBM (~2.7 GB
written) that a separate reduce fusion immediately re-reads (~2.8 GB) — the
round-4 eval trace shows the pair at ~63 ms/frame for ~20 MB of useful
payload (reference analog: raymarching.cu:370-376 reads one byte per probe).

This kernel keeps the whole table VMEM-resident (revisited block — Mosaic
skips the re-copy when a block index is unchanged between grid steps) and
fuses row selection (one-hot matmul on the MXU, exact for u8 payloads in
bf16) with the lane select (VPU), so HBM traffic is just idx in + one value
out per probe (~8 B/probe, ~50x less).

Only tables up to _MAX_ROWS x 128 qualify (the one-hot operand [_SUB, R]
must fit VMEM and the dot cost scales with R); the fine 128^3 occupancy
grid (16384 rows) stays on the XLA row-gather path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# probes per grid step, presented as [1, 8, _SUB]. 20M probes/frame at
# chunk 2048 meant ~10k grid steps whose fixed DMA/step cost dominated the
# kernel (53 ms/frame measured); 8192 cuts the step count 4x while the
# one-hot block [_SUB, 512] bf16 stays a comfortable 1 MiB.
_CHUNK = 8192
_SUB = _CHUNK // 8
_MAX_ROWS = 512          # table ceiling (VMEM + MXU cost scale with rows)


def _probe_kernel(idx_ref, tab_ref, out_ref):
    """One grid step: out[s, i] = tab[idx >> 7, idx & 127] for a chunk of
    _CHUNK probe indices. Row pick is a [_SUB, R] @ [R, 128] one-hot
    matmul (exact: one 0/1 weight per row, u8 payload fits bf16); lane
    pick is a one-hot masked lane reduce."""
    R = tab_ref.shape[0]
    tab = tab_ref[...]                                         # [R, 128] bf16
    riota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, R), 1)
    liota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 128), 1)
    for s in range(8):
        idx = idx_ref[0, s]                                    # [_SUB] i32
        oh = (idx[:, None] >> 7 == riota).astype(jnp.bfloat16)
        rows = jnp.dot(oh, tab,
                       preferred_element_type=jnp.float32)     # [_SUB, 128]
        lane = (idx[:, None] & 127) == liota
        out_ref[0, s] = jnp.sum(jnp.where(lane, rows, 0.0), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def probe_select_small(table_u8: jax.Array, flat_idx: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """table_u8[flat_idx] as a fused VMEM-resident gather. table_u8: [T]
    u8 with T % 128 == 0 and T / 128 <= _MAX_ROWS; flat_idx: [J] i32 in
    [0, T). Returns [J] f32 (the u8 values, exactly)."""
    T = table_u8.shape[0]
    assert T % 128 == 0 and T // 128 <= _MAX_ROWS, T
    J = flat_idx.shape[0]
    n_chunks = -(-J // _CHUNK)
    pad = n_chunks * _CHUNK - J
    if pad:
        flat_idx = jnp.pad(flat_idx, (0, pad))

    out = pl.pallas_call(
        _probe_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T // 128, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, _SUB), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, 8, _SUB), jnp.float32),
        interpret=interpret,
    )(flat_idx.astype(jnp.int32).reshape(n_chunks, 8, _SUB),
      # cast OUTSIDE the kernel (Mosaic has no u8->bf16 cast); u8 payloads
      # are exact in bf16 and the table is tiny (<=512x128)
      table_u8.astype(jnp.bfloat16).reshape(T // 128, 128))

    return out.reshape(n_chunks * _CHUNK)[:J]
