"""Corpus loading, cleaning, and chunking.

Mirrors the reference's preprocessing semantics exactly so retrieval behavior
is comparable:

- ``basic_cleaning``: newline -> space, strip (reference app/main.py:379-380).
- ``chunk_text``: whitespace-split into ~``chunk_size``-word chunks, each chunk
  re-joined with single spaces and stripped (reference app/main.py:383-393;
  duplicated at app/embedding_gen.py:128-137 — here there is one shared impl).
- ``read_text_file``: utf-8 with latin-1 fallback (reference app/main.py:434-438,
  app/embedding_gen.py:374-380).
- ``load_corpus``: reads ``PMC*.txt`` files from a directory (reference filter at
  app/main.py:431) and yields per-chunk records ``{doc_id, text}`` where doc_id
  is the source filename, matching the reference's doc merging key
  (app/main.py:443).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Optional


@dataclass(frozen=True)
class Chunk:
    doc_id: str
    chunk_index: int
    text: str

    @property
    def uid(self) -> str:
        # Matches the reference's OpenSearch `_id = f"{doc_id}_{i}"` scheme
        # (app/main.py:325, app/embedding_gen.py:221).
        return f"{self.doc_id}_{self.chunk_index}"


def basic_cleaning(text: str) -> str:
    return text.replace("\n", " ").strip()


def chunk_text(text: str, chunk_size: int = 512) -> List[str]:
    """Split ``text`` into chunks of at most ``chunk_size`` whitespace words."""
    words = text.split()
    return [
        " ".join(words[i : i + chunk_size]).strip()
        for i in range(0, len(words), chunk_size)
    ]


def read_text_file(path: str) -> str:
    try:
        with open(path, "r", encoding="utf-8") as f:
            return f.read()
    except UnicodeDecodeError:
        with open(path, "r", encoding="latin-1") as f:
            return f.read()


def iter_corpus_files(
    corpus_dir: str,
    prefix: str = "PMC",
    suffix: str = ".txt",
    limit: Optional[int] = None,
) -> Iterator[str]:
    names = sorted(
        n for n in os.listdir(corpus_dir) if n.startswith(prefix) and n.endswith(suffix)
    )
    if limit is not None:
        names = names[:limit]
    for name in names:
        yield os.path.join(corpus_dir, name)


def chunk_document(doc_id: str, text: str, chunk_size: int = 512) -> List[Chunk]:
    cleaned = basic_cleaning(text)
    return [
        Chunk(doc_id=doc_id, chunk_index=i, text=chunk)
        for i, chunk in enumerate(chunk_text(cleaned, chunk_size))
    ]


def load_corpus(
    corpus_dir: str,
    chunk_size: int = 512,
    prefix: str = "PMC",
    limit_files: Optional[int] = None,
) -> List[Chunk]:
    """Read, clean, and chunk an on-disk corpus directory."""
    chunks: List[Chunk] = []
    for path in iter_corpus_files(corpus_dir, prefix=prefix, limit=limit_files):
        doc_id = os.path.basename(path)
        chunks.extend(chunk_document(doc_id, read_text_file(path), chunk_size))
    return chunks


def texts_of(chunks: Iterable[Chunk]) -> List[str]:
    return [c.text for c in chunks]
