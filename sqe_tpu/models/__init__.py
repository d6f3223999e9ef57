from sqe_tpu.models.embedder import (  # noqa: F401
    Embedder,
    embed_forward,
    init_embedder_params,
)
