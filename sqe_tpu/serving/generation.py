"""Pluggable answer-generation backends.

The reference hardwires two external LLM clients: a BlueHive completion POST
(app/main.py:183-242) for HTTP /ask and a legacy-SDK OpenAI GPT-4o stream
(app/main.py:611-647) for WS /ws/ask. Here both are implementations of one
``GenerationBackend`` protocol (non-streaming ``generate`` + streaming
``stream``), concurrency-limited with a semaphore as in the reference
(MAX_BLUEHIVE_CONCURRENCY=5, app/main.py:31,186), plus an offline
deterministic ``EchoBackend`` used by tests and by default in environments
with no external LLM (this build runs zero-egress).

Error contracts preserved: ``generate`` returns ``None`` on failure
(app/main.py:232-242); ``stream`` yields a final ``"[ERROR] ..."`` chunk on
mid-stream failure (app/main.py:645-647).
"""

from __future__ import annotations

import asyncio
import json
import re
from typing import AsyncGenerator, Optional, Protocol

from sqe_tpu.utils.logging import get_logger

try:  # httpx is available in this image; guard anyway.
    import httpx
except Exception:  # pragma: no cover
    httpx = None

log = get_logger("serving.generation")


class GenerationBackend(Protocol):
    async def generate(self, prompt: str, system_msg: str = "") -> Optional[str]:
        ...

    def stream(self, prompt: str, system_msg: str = "") -> AsyncGenerator[str, None]:
        ...


class EchoBackend:
    """Deterministic offline backend: answers with the cited document IDs.

    Used in tests and as the default zero-egress generation path; it extracts
    the document IDs from the prompt's context blocks so the citation-format
    contract stays exercised end-to-end.
    """

    def __init__(self, delay_s: float = 0.0):
        self.delay_s = delay_s

    def _answer(self, prompt: str) -> str:
        doc_ids = re.findall(r"--- Document ID: (\S+) ---", prompt)
        seen = list(dict.fromkeys(doc_ids))
        trimmed = [re.sub(r"\.txt$", "", d) for d in seen]
        if not trimmed:
            return "I lack the context to answer your question."
        refs = ", ".join(f"Document {d}" for d in trimmed)
        return f"Based on the retrieved context, see: {refs}."

    async def generate(self, prompt: str, system_msg: str = "") -> Optional[str]:
        if self.delay_s:
            await asyncio.sleep(self.delay_s)
        return self._answer(prompt)

    async def stream(self, prompt: str, system_msg: str = "") -> AsyncGenerator[str, None]:
        answer = self._answer(prompt)
        for word in answer.split(" "):
            if self.delay_s:
                await asyncio.sleep(self.delay_s)
            yield word + " "


class HTTPChatBackend:
    """BlueHive-compatible completion client (reference app/main.py:183-242).

    POSTs ``{prompt, systemMessage}`` with a bearer token and parses
    ``choices[0].message.content``; returns None on any failure.
    """

    def __init__(
        self,
        url: str,
        bearer_token: str = "",
        max_concurrency: int = 5,
        timeout_s: float = 30.0,
    ):
        self.url = url
        self.bearer_token = bearer_token
        self.timeout_s = timeout_s
        self._sem = asyncio.Semaphore(max_concurrency)

    async def generate(self, prompt: str, system_msg: str = "") -> Optional[str]:
        if httpx is None or not self.url:
            return None
        headers = {
            "Authorization": f"Bearer {self.bearer_token}",
            "Content-Type": "application/json",
        }
        payload = {"prompt": prompt, "systemMessage": system_msg}
        try:
            async with self._sem:
                async with httpx.AsyncClient() as client:
                    resp = await client.post(
                        self.url, json=payload, headers=headers, timeout=self.timeout_s
                    )
                    resp.raise_for_status()
                    data = resp.json()
            choices = data.get("choices", [])
            if not choices:
                log.error("no choices in completion response")
                return None
            content = choices[0].get("message", {}).get("content", "")
            return content.strip()
        except Exception as exc:
            log.error("generation request failed: %s", exc)
            return None

    async def stream(self, prompt: str, system_msg: str = "") -> AsyncGenerator[str, None]:
        # Non-streaming API exposed through the streaming interface.
        answer = await self.generate(prompt, system_msg)
        if answer is None:
            yield "[ERROR] generation failed"
        else:
            yield answer


class OpenAIStreamBackend:
    """OpenAI-compatible streaming chat client (reference app/main.py:611-647,
    modernized from the legacy pre-1.0 SDK call to a direct SSE request —
    SURVEY.md B7)."""

    def __init__(
        self,
        api_key: str,
        model: str = "gpt-4o",
        base_url: str = "https://api.openai.com/v1",
        max_tokens: int = 1024,
        temperature: float = 0.7,
        max_concurrency: int = 5,
        timeout_s: float = 60.0,
    ):
        self.api_key = api_key
        self.model = model
        self.base_url = base_url.rstrip("/")
        self.max_tokens = max_tokens
        self.temperature = temperature
        self.timeout_s = timeout_s
        self._sem = asyncio.Semaphore(max_concurrency)

    async def stream(self, prompt: str, system_msg: str = "") -> AsyncGenerator[str, None]:
        if httpx is None:
            yield "[ERROR] httpx unavailable"
            return
        payload = {
            "model": self.model,
            "messages": [
                {"role": "system", "content": system_msg},
                {"role": "user", "content": prompt},
            ],
            "max_tokens": self.max_tokens,
            "temperature": self.temperature,
            "stream": True,
        }
        headers = {"Authorization": f"Bearer {self.api_key}"}
        try:
            async with self._sem:
                async with httpx.AsyncClient(timeout=self.timeout_s) as client:
                    async with client.stream(
                        "POST",
                        f"{self.base_url}/chat/completions",
                        json=payload,
                        headers=headers,
                    ) as resp:
                        resp.raise_for_status()
                        async for line in resp.aiter_lines():
                            if not line.startswith("data:"):
                                continue
                            data = line[5:].strip()
                            if data == "[DONE]":
                                break
                            try:
                                chunk = json.loads(data)
                            except json.JSONDecodeError:
                                continue
                            choices = chunk.get("choices", [])
                            if not choices:
                                continue
                            token = choices[0].get("delta", {}).get("content", "")
                            if token:
                                yield token
        except Exception as exc:
            yield f"[ERROR] {exc}"

    async def generate(self, prompt: str, system_msg: str = "") -> Optional[str]:
        parts = []
        async for chunk in self.stream(prompt, system_msg):
            if chunk.startswith("[ERROR]") and not parts:
                return None
            parts.append(chunk)
        return "".join(parts).strip() or None
