from sqe_tpu.cache.semantic_cache import DeviceLFUCache  # noqa: F401
