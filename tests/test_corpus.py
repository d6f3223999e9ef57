"""Chunker/cleaning semantics — must mirror reference app/main.py:376-393."""

import os

from sqe_tpu.data import basic_cleaning, chunk_text, load_corpus, read_text_file
from sqe_tpu.data.corpus import chunk_document


def test_basic_cleaning_newlines_and_strip():
    assert basic_cleaning("  a\nb\n c ") == "a b  c"


def test_chunk_exact_512_boundary():
    words = [f"w{i}" for i in range(1024)]
    chunks = chunk_text(" ".join(words), 512)
    assert len(chunks) == 2
    assert chunks[0].split() == words[:512]
    assert chunks[1].split() == words[512:]


def test_chunk_remainder():
    text = " ".join(["x"] * 1025)
    chunks = chunk_text(text, 512)
    assert [len(c.split()) for c in chunks] == [512, 512, 1]


def test_chunk_collapses_whitespace():
    chunks = chunk_text("a   b\t\tc", 512)
    assert chunks == ["a b c"]


def test_chunk_empty():
    assert chunk_text("", 512) == []
    assert chunk_text("   ", 512) == []


def test_chunk_document_ids():
    chunks = chunk_document("PMC1.txt", " ".join(["w"] * 600), chunk_size=512)
    assert [c.uid for c in chunks] == ["PMC1.txt_0", "PMC1.txt_1"]
    assert all(c.doc_id == "PMC1.txt" for c in chunks)


def test_encoding_fallback(tmp_path):
    p = tmp_path / "PMClatin.txt"
    p.write_bytes("caf\xe9 words".encode("latin-1"))
    assert "caf" in read_text_file(str(p))


def test_load_corpus_filters_prefix(tmp_path):
    (tmp_path / "PMC1.txt").write_text("alpha beta gamma")
    (tmp_path / "notes.txt").write_text("should be skipped")
    (tmp_path / "PMC2.md").write_text("wrong suffix")
    chunks = load_corpus(str(tmp_path), chunk_size=2)
    assert {c.doc_id for c in chunks} == {"PMC1.txt"}
    assert [c.text for c in chunks] == ["alpha beta", "gamma"]
