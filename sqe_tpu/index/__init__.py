from sqe_tpu.index.flat import FlatIndex  # noqa: F401
from sqe_tpu.index.hnsw import HNSWIndex  # noqa: F401
from sqe_tpu.index.ivf import IVFIndex  # noqa: F401
from sqe_tpu.index.router import AutoIndex, choose_index_kind  # noqa: F401
