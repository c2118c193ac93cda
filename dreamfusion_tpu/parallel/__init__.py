from dreamfusion_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, data_parallel_grads, shard_rays_render)
