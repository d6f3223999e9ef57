from sqe_tpu.config import EngineConfig, cli_overrides


def test_defaults_mirror_reference_constants():
    cfg = EngineConfig()
    assert cfg.chunk_size == 512
    assert cfg.batch_size == 64
    assert cfg.model.embed_dim == 1024
    assert cfg.cache.capacity == 1000
    assert cfg.cache.sim_threshold == 0.96
    assert cfg.serve.top_k_default == 3
    assert cfg.serve.max_generate_concurrency == 5


def test_from_env_compatibility():
    cfg = EngineConfig.from_env({"EMB_DIR": "notes", "CHUNK_SIZE": "256",
                                 "BATCH_SIZE": "32", "EMBED_DIM": "512"})
    assert cfg.corpus_dir == "notes"
    assert cfg.chunk_size == 256
    assert cfg.batch_size == 32
    assert cfg.model.embed_dim == 512


def test_cli_overrides_nested_and_typed():
    cfg = cli_overrides(EngineConfig(), [
        "--chunk_size=128",
        "--index_kind=hnsw",
        "--hnsw.M=32",
        "--hnsw.ef_search=64",
        "--cache.sim_threshold=0.9",
        "--serve.port=9000",
        "ignored_positional",
    ])
    assert cfg.chunk_size == 128
    assert cfg.index_kind == "hnsw"
    assert cfg.hnsw.M == 32 and cfg.hnsw.ef_search == 64
    assert abs(cfg.cache.sim_threshold - 0.9) < 1e-9
    assert cfg.serve.port == 9000
    # untouched sections keep defaults
    assert cfg.hnsw.ef_construction == 200
