"""Field networks: grid (instant-ngp style), vanilla (freq+ResMLP), and the
DVGO family (voxel grids, pipeline 3) + the frozen-geometry editing bridge."""

from dreamfusion_tpu.models.networks import (  # noqa: F401
    NeRFGridNetwork,
    NeRFVanillaNetwork,
    SHADING_ALBEDO,
    SHADING_LAMBERTIAN,
    SHADING_TEXTURELESS,
    SHADING_NORMAL,
    build_model,
)
