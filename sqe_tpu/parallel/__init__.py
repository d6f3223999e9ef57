from sqe_tpu.parallel.mesh import make_mesh, best_devices  # noqa: F401
from sqe_tpu.parallel.sharded_index import ShardedFlatIndex, ShardedHNSWIndex  # noqa: F401
