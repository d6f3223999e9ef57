"""Prompt assembly: context merge + system message.

Behavioral parity with the reference's prompt construction (app/main.py:500-535
for HTTP, :685-715 for WS — which were copy-pasted duplicates; here there is
one implementation used by both transports, SURVEY.md §3.3 note):

- Retrieved chunks are grouped per ``doc_id`` and joined with newlines in
  retrieval order (app/main.py:500-513).
- Context blocks are rendered as ``--- Document ID: <id> ---`` sections.
- The system message enforces grounded, citation-bearing answers (the
  reference's 6 rules, app/main.py:519-528).
- Chat history, when present, is prepended (app/main.py:529-535).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

SYSTEM_MESSAGE = (
    "You are a helpful AI assistant chatbot. You must follow these rules:\n"
    "1) Cite document IDs from the context exactly as 'Document XYZ', with no "
    "file extensions such as '.txt'.\n"
    "2) Every answer must end with references to the IDs of the documents the "
    "information was extracted from.\n"
    "3) If the context does not relate to the query, say 'I lack the context "
    "to answer your question.' and do not answer from unrelated context.\n"
    "4) Never answer from your own knowledge; only extract information from "
    "the provided context, and never answer without document ID references.\n"
    "5) If you lack context, say so.\n"
    "6) Do not add chain-of-thought.\n"
)


def merge_context(results: List[Tuple[Dict[str, Any], float]]) -> Dict[str, str]:
    """Group retrieved chunks by doc_id, concatenating chunk texts."""
    context_map: Dict[str, str] = {}
    for source, _score in results:
        doc_id = source.get("doc_id", "")
        text = source.get("text", "")
        if doc_id in context_map:
            context_map[doc_id] += "\n" + text
        else:
            context_map[doc_id] = text
    return context_map


def render_context(context_map: Dict[str, str]) -> str:
    return "".join(
        f"--- Document ID: {doc_id} ---\n{content}\n\n"
        for doc_id, content in context_map.items()
    )


def build_prompt(query: str, context_text: str, chat_history: str = "") -> str:
    parts = []
    if chat_history:
        parts.append(f"Chat History: {chat_history}\n\n")
    parts.append(f"User Query:\n{query}\n\n")
    parts.append(f"Context:\n{context_text}\n")
    parts.append("--- End of context ---\n\n")
    parts.append("Provide your concise answer now.")
    return "".join(parts)
