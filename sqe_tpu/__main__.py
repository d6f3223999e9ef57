"""CLI: ``python -m sqe_tpu <command>``.

Commands:
  serve         build/load the index and run the HTTP+WS server (default)
  build-index   chunk+embed+index a corpus, write a checkpoint, exit
  bench         run the headline retrieval benchmark

All commands accept ``--dotted.key=value`` config overrides
(see sqe_tpu.config.cli_overrides), e.g.::

  python -m sqe_tpu serve --corpus_dir=PMC --index_kind=hnsw --serve.port=8000
  python -m sqe_tpu build-index --corpus_dir=PMC --checkpoint_dir=ckpt
"""

from __future__ import annotations

import sys


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    command = "serve"
    if argv and not argv[0].startswith("--"):
        command = argv.pop(0)

    from sqe_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    if command == "serve":
        from sqe_tpu.serving.app import main as serve_main

        serve_main(argv)
    elif command == "build-index":
        from sqe_tpu.config import EngineConfig, cli_overrides
        from sqe_tpu.serving.engine import RAGEngine

        cfg = cli_overrides(EngineConfig.from_env(), argv)
        engine = RAGEngine(cfg)
        n = engine.build_from_corpus()
        if cfg.checkpoint_dir:
            engine.save_checkpoint()
        print(f"indexed {n} chunks")
    elif command == "bench":
        import runpy

        runpy.run_path("bench.py", run_name="__main__")
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    main()
