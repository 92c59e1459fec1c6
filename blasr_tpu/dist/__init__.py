from blasr_tpu.dist.mesh import (  # noqa: F401
    make_mesh, map_batch_data_parallel, map_batch_ref_sharded, shard_index)
