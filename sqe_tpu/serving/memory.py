"""Per-chat conversation memory.

The reference *intended* per-chat ``ConversationBufferMemory`` but referenced
``self.memory_store`` without ever initializing it, so every non-cached /ask
with a chat_id crashed (app/main.py:484-489 vs :408-411 — SURVEY.md bug B1).
This is the working implementation: a bounded per-chat turn buffer with the
same "Human: ... / AI: ..." string rendering the prompt builder consumes.
"""

from __future__ import annotations

import threading
from collections import OrderedDict, deque
from typing import Deque, Tuple


class ChatMemory:
    """Bounded conversation buffer for one chat."""

    def __init__(self, max_turns: int = 16):
        self.turns: Deque[Tuple[str, str]] = deque(maxlen=max_turns)

    def save_context(self, user_input: str, ai_output: str) -> None:
        self.turns.append((user_input, ai_output))

    @property
    def buffer_as_str(self) -> str:
        return "\n".join(
            f"Human: {user}\nAI: {ai}" for user, ai in self.turns
        )


class ChatMemoryStore:
    """Thread-safe chat_id -> ChatMemory map with LRU bound on chat count."""

    def __init__(self, max_turns: int = 16, max_chats: int = 10000):
        self.max_turns = max_turns
        self.max_chats = max_chats
        self._store: "OrderedDict[str, ChatMemory]" = OrderedDict()
        self._lock = threading.Lock()

    def get(self, chat_id: str) -> ChatMemory:
        with self._lock:
            mem = self._store.get(chat_id)
            if mem is None:
                mem = ChatMemory(self.max_turns)
                self._store[chat_id] = mem
                while len(self._store) > self.max_chats:
                    self._store.popitem(last=False)
            else:
                self._store.move_to_end(chat_id)
            return mem

    def __len__(self) -> int:
        with self._lock:
            return len(self._store)
