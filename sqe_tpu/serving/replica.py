"""Serving replica router: health-checked failover across engine replicas.

The reference had no failure-detection story — one FastAPI process, one
OpenSearch node (docker-compose.yml:48). For multi-host deployments this
framework scales serving with DP replicas (each host runs `sqe_tpu serve`
over its own chip(s); the index is replicated or host-sharded) fronted by
this router:

- background health loop probes every replica's ``/health``;
- requests go to healthy replicas round-robin;
- requests carrying a chat identity are STICKY: chat memory lives inside a
  replica process (as the reference's did, app/main.py:483-489), so
  ``(user_id, chat_id)`` maps to a replica by rendezvous (highest-random-
  weight) hashing over the healthy pool — the same chat keeps hitting the
  same replica, failover deterministically walks to the next-highest weight
  while it's down, and the original assignment resumes on recovery;
- a failed request fails over to the next healthy replica within the same
  request (the client sees one answer or one 503, never a half-dead hop);
- replicas that recover are picked up automatically by the next probe.

Run: ``python -m sqe_tpu router --backends=host1:8000,host2:8000 --port=8080``
"""

from __future__ import annotations

import asyncio
import hashlib
import itertools
import json
from typing import Dict, List, Optional

from sqe_tpu.serving.http import HTTPError, Request, Response, Router, Server
from sqe_tpu.utils.logging import get_logger

try:
    import httpx
except Exception:  # pragma: no cover
    httpx = None

log = get_logger("serving.replica")


class ReplicaRouter:
    def __init__(
        self,
        backends: List[str],
        health_interval_s: float = 2.0,
        request_timeout_s: float = 120.0,
    ):
        assert backends, "need at least one backend"
        self.backends = [
            b if b.startswith("http") else f"http://{b}" for b in backends
        ]
        self.health_interval_s = health_interval_s
        self.request_timeout_s = request_timeout_s
        self.healthy: Dict[str, bool] = {b: True for b in self.backends}
        self._rr = itertools.count()
        self._health_task: Optional[asyncio.Task] = None
        self._client: Optional["httpx.AsyncClient"] = None

    # ------------------------------------------------------------------ state

    @staticmethod
    def _hrw(key: str, backend: str) -> int:
        """Rendezvous weight: stable across pool-membership changes, so a
        replica outage only remaps the chats that lived on it."""
        return int.from_bytes(
            hashlib.blake2b(
                f"{key}|{backend}".encode(), digest_size=8
            ).digest(), "big",
        )

    def _candidates(self, sticky_key: Optional[str] = None) -> List[str]:
        up = [b for b in self.backends if self.healthy[b]]
        # All down: optimistically try everything (a probe may be stale).
        pool = up or self.backends
        if sticky_key is not None:
            return sorted(pool, key=lambda b: self._hrw(sticky_key, b),
                          reverse=True)
        start = next(self._rr) % len(pool)
        return pool[start:] + pool[:start]

    async def _health_loop(self) -> None:
        while True:
            for b in self.backends:
                try:
                    r = await self._client.get(f"{b}/health", timeout=3.0)
                    ok = r.status_code == 200
                except Exception:  # noqa: BLE001
                    ok = False
                if ok != self.healthy[b]:
                    log.warning("replica %s -> %s", b, "up" if ok else "DOWN")
                self.healthy[b] = ok
            await asyncio.sleep(self.health_interval_s)

    async def start(self) -> None:
        assert httpx is not None, "httpx required for the router"
        self._client = httpx.AsyncClient()
        self._health_task = asyncio.create_task(self._health_loop())

    async def stop(self) -> None:
        if self._health_task:
            self._health_task.cancel()
        if self._client:
            await self._client.aclose()

    # ----------------------------------------------------------------- proxy

    @staticmethod
    def sticky_key_from_body(body: bytes) -> Optional[str]:
        """(user_id, chat_id) identity from an /ask JSON body, or None for
        chat-free requests (those stay round-robin)."""
        try:
            payload = json.loads(body)
        except (json.JSONDecodeError, UnicodeDecodeError):
            return None
        if not isinstance(payload, dict) or not payload.get("chat_id"):
            return None
        return f"{payload.get('user_id', '')}\x00{payload['chat_id']}"

    async def forward(self, method: str, path: str, body: bytes,
                      content_type: str,
                      sticky_key: Optional[str] = None) -> Response:
        last_err: Optional[Exception] = None
        for backend in self._candidates(sticky_key):
            try:
                r = await self._client.request(
                    method, f"{backend}{path}", content=body,
                    headers={"Content-Type": content_type} if content_type else {},
                    timeout=self.request_timeout_s,
                )
                return Response(
                    status=r.status_code, body=r.content,
                    content_type=r.headers.get("content-type",
                                               "application/json"),
                )
            except Exception as exc:  # noqa: BLE001 — fail over
                log.warning("replica %s failed (%s); failing over",
                            backend, exc)
                self.healthy[backend] = False
                last_err = exc
        raise HTTPError(503, f"all replicas unavailable: {last_err}")

    def build_router(self) -> Router:
        router = Router()

        @router.route("GET", "/health")
        async def health(_req: Request) -> Response:
            up = [b for b, ok in self.healthy.items() if ok]
            status = 200 if up else 503
            return Response(
                status=status,
                body=json.dumps(
                    {"status": "ok" if up else "unavailable",
                     "replicas_up": len(up),
                     "replicas": self.healthy}
                ).encode(),
                content_type="application/json",
            )

        @router.route("POST", "/ask")
        async def ask(req: Request) -> Response:
            return await self.forward(
                "POST", "/ask", req.body,
                req.headers.get("content-type", "application/json"),
                sticky_key=self.sticky_key_from_body(req.body),
            )

        @router.route("POST", "/upload_text")
        async def upload(req: Request) -> Response:
            return await self.forward(
                "POST", "/upload_text", req.body,
                req.headers.get("content-type", ""),
            )

        @router.route("GET", "/stats")
        async def stats(_req: Request) -> Response:
            out = {}
            for b in self.backends:
                if not self.healthy[b]:
                    out[b] = {"healthy": False}
                    continue
                try:
                    r = await self._client.get(f"{b}/stats", timeout=5.0)
                    out[b] = {"healthy": True, **r.json()}
                except Exception:  # noqa: BLE001
                    out[b] = {"healthy": False}
            return Response.json(out)

        return router


async def serve_router(backends: List[str], host: str = "0.0.0.0",
                       port: int = 8080) -> None:
    rr = ReplicaRouter(backends)
    await rr.start()
    server = Server(rr.build_router(), host, port)
    try:
        await server.serve_forever()
    finally:
        await rr.stop()
