"""TPU-native compute ops: encoders, activations, compositing, ray marching.

These replace the reference's four CUDA extensions (gridencoder/,
freqencoder/, shencoder/, raymarching/) with pure-JAX implementations plus
Pallas TPU kernels for the hot paths. The pure-JAX versions are kept forever
as oracles for kernel golden tests.
"""

from dreamfusion_tpu.ops.activation import trunc_exp  # noqa: F401
from dreamfusion_tpu.ops.encoders import freq_encode, sh_encode, get_encoder  # noqa: F401
