"""Input encoders: frequency (NeRF positional) and real spherical harmonics.

These replace the reference's freqencoder/ and shencoder/ CUDA extensions.
On TPU there is no reason for custom kernels here: both encoders are small
elementwise/polynomial expressions that XLA fuses directly into the consuming
matmul, and JAX autodiff reproduces the reference's hand-written backward
passes exactly (freqencoder/src/freqencoder.cu:63-94,
shencoder/src/shencoder.cu:359-383).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Frequency (positional) encoding
# ---------------------------------------------------------------------------

def freq_encode(x: jax.Array, degree: int = 4) -> jax.Array:
    """[x, sin(2^0 x), cos(2^0 x), ..., sin(2^{deg-1} x), cos(2^{deg-1} x)].

    Output dim = D + 2*D*degree (27 for D=3, degree=4), layout matching the
    reference (freqencoder/src/freqencoder.cu:30-58: identity first, then per
    frequency [sin(f*x_0..x_D), cos(f*x_0..x_D)]).
    """
    x = x.astype(jnp.float32)  # force f32 like the reference's custom_fwd
    outs = [x]
    for f in range(degree):
        sx = x * (2.0 ** f)
        outs.append(jnp.sin(sx))
        outs.append(jnp.cos(sx))
    return jnp.concatenate(outs, axis=-1)


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + 2 * input_dim * degree


# ---------------------------------------------------------------------------
# Real spherical harmonics
# ---------------------------------------------------------------------------
#
# Real SH basis with Condon-Shortley phase, identical convention to the
# reference's hardcoded polynomial table (shencoder/src/shencoder.cu:28-356,
# e.g. Y_1,-1 = -0.4886 y, Y_1,0 = +0.4886 z). Instead of 64 hardcoded
# polynomials we build the basis from Cartesian recurrences, which is exact
# for any degree and stays fully fusible:
#   A_m + i B_m = (x + i y)^m                (sin^m(theta) * e^{i m phi})
#   Pb_l^m = P_l^m / sin^m(theta)            (polynomial in z)
# with  Pb_m^m = (-1)^m (2m-1)!!,
#       Pb_{m+1}^m = z (2m+1) Pb_m^m,
#       Pb_l^m = ((2l-1) z Pb_{l-1}^m - (l+m-1) Pb_{l-2}^m) / (l - m).
# Then Y_{l,m>0} = sqrt(2) K_l^m Pb_l^m A_m,  Y_{l,-m} = sqrt(2) K_l^m Pb_l^m B_m,
# Y_{l,0} = K_l^0 Pb_l^0, with K_l^m = sqrt((2l+1)/(4pi) (l-m)!/(l+m)!).
# Ordering: index l^2 + l + m for m in [-l, l] (same as the reference table).

def _sh_norm(l: int, m: int) -> float:
    return math.sqrt((2 * l + 1) / (4 * math.pi)
                     * math.factorial(l - m) / math.factorial(l + m))


def sh_encode(dirs: jax.Array, degree: int = 4) -> jax.Array:
    """Real SH basis values for unit directions. Output dim = degree**2.

    dirs: [..., 3] unit vectors (the reference divides by `size` first;
    callers should normalize). Supports degree in [1, 8] like the reference
    (shencoder/sphere_harmonics.py:67-68).
    """
    assert 1 <= degree <= 8, "SH degree must be in [1, 8]"
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    z = z.astype(jnp.float32)

    L = degree  # bands 0..L-1
    # azimuthal Cartesian recurrence: (A_m, B_m) = Re/Im (x + iy)^m
    A = [jnp.ones_like(x)]
    B = [jnp.zeros_like(x)]
    for m in range(1, L):
        A.append(x * A[m - 1] - y * B[m - 1])
        B.append(x * B[m - 1] + y * A[m - 1])

    # scaled associated Legendre Pb[l][m]
    Pb = [[None] * L for _ in range(L)]
    for m in range(L):
        pmm = 1.0
        for k in range(1, m + 1):  # (-1)^m (2m-1)!!
            pmm *= -(2 * k - 1)
        Pb[m][m] = jnp.full_like(z, pmm)
        if m + 1 < L:
            Pb[m + 1][m] = z * (2 * m + 1) * Pb[m][m]
        for l in range(m + 2, L):
            Pb[l][m] = ((2 * l - 1) * z * Pb[l - 1][m]
                        - (l + m - 1) * Pb[l - 2][m]) / (l - m)

    out = []
    for l in range(L):
        row = [None] * (2 * l + 1)
        row[l] = _sh_norm(l, 0) * Pb[l][0]  # m = 0
        for m in range(1, l + 1):
            c = math.sqrt(2.0) * _sh_norm(l, m)
            row[l + m] = c * Pb[l][m] * A[m]
            row[l - m] = c * Pb[l][m] * B[m]
        out.extend(row)
    return jnp.stack(out, axis=-1)


def sh_output_dim(degree: int) -> int:
    return degree * degree


# ---------------------------------------------------------------------------
# Encoder factory (reference: encoding.py:5-33)
# ---------------------------------------------------------------------------

def get_encoder(encoding: str, input_dim: int = 3, multires: int = 6,
                degree: int = 4, **grid_kwargs
                ) -> Tuple[Callable[..., jax.Array], int]:
    """String -> (pure encode fn, output_dim).

    'None' | 'frequency' | 'sphere_harmonics' are parameter-free functions.
    'hashgrid' | 'tiledgrid' return a GridEncoderSpec-bound fn; see
    dreamfusion_tpu.ops.grid_encoder.
    """
    if encoding == "None":
        return (lambda x, **kw: x), input_dim
    if encoding == "frequency":
        return partial(freq_encode, degree=multires), freq_output_dim(input_dim, multires)
    if encoding == "sphere_harmonics":
        return partial(sh_encode, degree=degree), sh_output_dim(degree)
    if encoding in ("hashgrid", "tiledgrid"):
        from dreamfusion_tpu.ops.grid_encoder import GridEncoderSpec

        spec = GridEncoderSpec(input_dim=input_dim,
                               gridtype="hash" if encoding == "hashgrid" else "tiled",
                               **grid_kwargs)
        return spec, spec.output_dim
    raise NotImplementedError(
        "Unknown encoding, choose from [None, frequency, sphere_harmonics, "
        f"hashgrid, tiledgrid]; got {encoding!r}")
