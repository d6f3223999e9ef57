from sqe_tpu.ops.attention import multihead_attention  # noqa: F401
from sqe_tpu.ops.distance import l2_normalize, cosine_scores  # noqa: F401
