from dreamfusion_tpu.export.mesh import export_textured_mesh  # noqa: F401
