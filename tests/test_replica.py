"""Replica router: health detection, round-robin, in-request failover."""

import asyncio
import json

import pytest

from sqe_tpu.data.corpus import Chunk
from sqe_tpu.serving.app import build_router
from sqe_tpu.serving.engine import RAGEngine
from sqe_tpu.serving.http import Server
from sqe_tpu.serving.replica import ReplicaRouter

P1, P2, PR = 8951, 8952, 8953


@pytest.fixture(scope="module")
def engines(small_engine_cfg, cpu_device):
    e1 = RAGEngine(small_engine_cfg, device=cpu_device)
    e1.ingest_chunks([Chunk(f"PMC{i}.txt", 0, f"doc {i} gene{i}") for i in range(8)])
    e2 = RAGEngine(small_engine_cfg, device=cpu_device, cache=None)
    e2.ingest_chunks([Chunk(f"PMC{i}.txt", 0, f"doc {i} gene{i}") for i in range(8)])
    return e1, e2


def test_router_failover_and_recovery(engines):
    import httpx

    e1, e2 = engines

    async def main():
        s1 = Server(build_router(e1), "127.0.0.1", P1)
        s2 = Server(build_router(e2), "127.0.0.1", P2)
        await s1.start()
        await s2.start()
        rr = ReplicaRouter([f"127.0.0.1:{P1}", f"127.0.0.1:{P2}"],
                           health_interval_s=0.2, request_timeout_s=10.0)
        await rr.start()
        router_srv = Server(rr.build_router(), "127.0.0.1", PR)
        await router_srv.start()
        try:
            async with httpx.AsyncClient() as client:
                url = f"http://127.0.0.1:{PR}"
                # both up: requests succeed and spread
                for i in range(4):
                    r = await client.post(f"{url}/ask", json={
                        "query": f"gene{i}", "chat_id": "c", "top_k": 2})
                    assert r.status_code == 200
                    assert "Document PMC" in r.json()["answer"]
                h = (await client.get(f"{url}/health")).json()
                assert h["replicas_up"] == 2

                # kill replica 1 -> requests fail over, health notices
                await s1.stop()
                for i in range(4):
                    r = await client.post(f"{url}/ask", json={
                        "query": f"gene{i}", "chat_id": "c", "top_k": 2},
                        timeout=30)
                    assert r.status_code == 200
                await asyncio.sleep(0.6)
                h = (await client.get(f"{url}/health")).json()
                assert h["replicas_up"] == 1

                # replica 1 comes back -> health recovers
                s1b = Server(build_router(e1), "127.0.0.1", P1)
                await s1b.start()
                await asyncio.sleep(0.6)
                h = (await client.get(f"{url}/health")).json()
                assert h["replicas_up"] == 2
                await s1b.stop()
        finally:
            await router_srv.stop()
            await rr.stop()
            await s2.stop()

    asyncio.run(main())


def test_router_all_down_503(engines):
    import httpx

    async def main():
        rr = ReplicaRouter(["127.0.0.1:1"], health_interval_s=0.2)
        await rr.start()
        srv = Server(rr.build_router(), "127.0.0.1", PR + 1)
        await srv.start()
        try:
            async with httpx.AsyncClient() as client:
                r = await client.post(
                    f"http://127.0.0.1:{PR + 1}/ask",
                    json={"query": "x", "chat_id": "c"}, timeout=30)
                assert r.status_code == 503
        finally:
            await srv.stop()
            await rr.stop()

    asyncio.run(main())


def test_sticky_sessions_chat_affinity(engines):
    """Requests with a chat identity stick to one replica (chat memory lives
    per-process); chat-free requests stay round-robin; a dead sticky replica
    fails over deterministically and resumes on recovery."""
    import httpx

    e1, e2 = engines

    async def main():
        s1 = Server(build_router(e1), "127.0.0.1", P1)
        s2 = Server(build_router(e2), "127.0.0.1", P2)
        await s1.start()
        await s2.start()
        rr = ReplicaRouter([f"127.0.0.1:{P1}", f"127.0.0.1:{P2}"],
                           health_interval_s=0.2, request_timeout_s=10.0)
        await rr.start()
        try:
            # Candidate order for one chat is stable call-to-call...
            key = rr.sticky_key_from_body(
                json.dumps({"user_id": "u1", "chat_id": "c7",
                            "query": "x"}).encode())
            assert key is not None
            order = rr._candidates(key)
            for _ in range(5):
                assert rr._candidates(key) == order
            # ...while chat-free requests rotate.
            assert rr.sticky_key_from_body(b'{"query": "x"}') is None
            assert rr._candidates() != rr._candidates() or \
                len(rr.backends) == 1

            # Different chats spread: with 2 replicas some key maps to each.
            firsts = {
                rr._candidates(rr.sticky_key_from_body(
                    json.dumps({"chat_id": f"c{i}", "query": "x"}).encode()
                ))[0]
                for i in range(16)
            }
            assert len(firsts) == 2

            # Sticky replica down -> deterministic failover target...
            home = order[0]
            rr.healthy[home] = False
            assert rr._candidates(key) == [b for b in order if b != home]
            # ...and the original assignment resumes on recovery.
            rr.healthy[home] = True
            assert rr._candidates(key) == order

            # End-to-end through the proxy: chat memory accumulates on ONE
            # replica across requests.
            router_srv = Server(rr.build_router(), "127.0.0.1", PR + 2)
            await router_srv.start()
            try:
                async with httpx.AsyncClient() as client:
                    url = f"http://127.0.0.1:{PR + 2}"
                    for i in range(3):
                        r = await client.post(f"{url}/ask", json={
                            "user_id": "u1", "chat_id": "sticky1",
                            "query": f"unique affinity probe {i} kinase",
                            "top_k": 2}, timeout=30)
                        assert r.status_code == 200
                mems = [len(e.memory.get("sticky1").turns)
                        for e in (e1, e2)]
                assert sorted(mems) == [0, 3]
            finally:
                await router_srv.stop()
        finally:
            await rr.stop()
            await s1.stop()
            await s2.stop()

    asyncio.run(main())
