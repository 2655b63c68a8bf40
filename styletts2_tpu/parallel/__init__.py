from styletts2_tpu.parallel.mesh import (  # noqa: F401
    data_sharding, make_mesh, replicated, shard_batch)
