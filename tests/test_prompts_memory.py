from sqe_tpu.serving.memory import ChatMemoryStore
from sqe_tpu.serving.prompts import build_prompt, merge_context, render_context


def test_merge_context_groups_by_doc_id():
    results = [
        ({"doc_id": "A", "text": "first"}, 0.9),
        ({"doc_id": "B", "text": "other"}, 0.8),
        ({"doc_id": "A", "text": "second"}, 0.7),
    ]
    merged = merge_context(results)
    assert merged == {"A": "first\nsecond", "B": "other"}
    # insertion order preserved (reference dict semantics, app/main.py:500-513)
    assert list(merged) == ["A", "B"]


def test_render_context_blocks():
    text = render_context({"PMC1.txt": "chunk text"})
    assert "--- Document ID: PMC1.txt ---" in text
    assert "chunk text" in text


def test_build_prompt_with_and_without_history():
    p = build_prompt("why?", "CTX", chat_history="Human: hi\nAI: hello")
    assert p.startswith("Chat History: Human: hi")
    assert "User Query:\nwhy?" in p
    assert "--- End of context ---" in p
    p2 = build_prompt("why?", "CTX")
    assert not p2.startswith("Chat History")


def test_chat_memory_roundtrip():
    store = ChatMemoryStore(max_turns=2)
    mem = store.get("chat1")
    mem.save_context("q1", "a1")
    mem.save_context("q2", "a2")
    mem.save_context("q3", "a3")  # evicts q1 (bounded buffer)
    s = mem.buffer_as_str
    assert "q1" not in s and "Human: q2" in s and "AI: a3" in s
    assert store.get("chat1") is mem
    assert store.get("chat2") is not mem


def test_chat_store_lru_bound():
    store = ChatMemoryStore(max_turns=2, max_chats=2)
    store.get("a")
    store.get("b")
    store.get("c")
    assert len(store) == 2
