"""Index / cache checkpointing.

The reference's only persistence was "skip embedding if OpenSearch already has
data" (app/main.py:422-424) — the index itself lived inside OpenSearch. Here
the engine owns its state, so vectors, the flat HNSW graph, pivot metadata and
the semantic-cache snapshot serialize to an ``.npz`` + JSON sidecar and reload
straight to HBM at startup. Chunk metadata (doc_id/text) goes in a JSONL file.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

FORMAT_VERSION = 1


def _atomic_savez(path: str, **arrays) -> None:
    """np.savez via tmp + os.replace: a crash mid-write (device-stall kill
    during a periodic checkpoint — the exact failure periodic saves insure
    against) must never leave a torn .npz behind a valid manifest."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _atomic_write(path: str, text: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
    os.replace(tmp, path)


def save_index(
    path: str,
    vectors: np.ndarray,
    metas: List[Dict[str, Any]],
    graph: Optional[np.ndarray] = None,
    levels: Optional[np.ndarray] = None,
    extra: Optional[dict] = None,
) -> None:
    os.makedirs(path, exist_ok=True)
    # npz can't roundtrip ml_dtypes (bfloat16) arrays; store float32.
    arrays = {"vectors": np.asarray(vectors).astype(np.float32)}
    if graph is not None:
        arrays["graph"] = graph
    if levels is not None:
        arrays["levels"] = levels
    _atomic_savez(os.path.join(path, "index.npz"), **arrays)
    _atomic_write(os.path.join(path, "metas.jsonl"),
                  "".join(json.dumps(m) + "\n" for m in metas))
    manifest = {"version": FORMAT_VERSION, "n": int(vectors.shape[0])}
    if extra:
        manifest.update(extra)
    _atomic_write(os.path.join(path, "manifest.json"), json.dumps(manifest))


def load_index(path: str) -> Optional[dict]:
    manifest_path = os.path.join(path, "manifest.json")
    if not os.path.exists(manifest_path):
        return None
    with open(manifest_path) as f:
        manifest = json.load(f)
    data = np.load(os.path.join(path, "index.npz"))
    metas: List[Dict[str, Any]] = []
    with open(os.path.join(path, "metas.jsonl"), encoding="utf-8") as f:
        for line in f:
            if line.strip():
                metas.append(json.loads(line))
    out = {"manifest": manifest, "vectors": data["vectors"], "metas": metas}
    for key in ("graph", "levels"):
        if key in data:
            out[key] = data[key]
    return out


def save_cache(path: str, snapshot: dict) -> None:
    os.makedirs(path, exist_ok=True)
    _atomic_savez(
        os.path.join(path, "cache.npz"),
        keys=snapshot["keys"],
        freqs=snapshot["freqs"],
        valid=snapshot["valid"],
    )
    _atomic_write(
        os.path.join(path, "cache_responses.json"),
        json.dumps({"responses": snapshot["responses"],
                    "size": snapshot["size"]}),
    )


def load_cache(path: str) -> Optional[dict]:
    npz = os.path.join(path, "cache.npz")
    side = os.path.join(path, "cache_responses.json")
    if not (os.path.exists(npz) and os.path.exists(side)):
        return None
    data = np.load(npz)
    with open(side, encoding="utf-8") as f:
        host = json.load(f)
    return {
        "keys": data["keys"],
        "freqs": data["freqs"],
        "valid": data["valid"],
        "responses": host["responses"],
        "size": host["size"],
    }


def save_model(
    path: str,
    params: Any,
    model_cfg: Dict[str, Any],
    tokenizer_state: Optional[dict] = None,
) -> None:
    """Persist embedder params (pytree leaves in deterministic order), the
    ModelConfig needed to rebuild the tree structure, and the tokenizer state.
    The reference's model lived in the external Ollama server; here trained
    params are first-class checkpoint content so a corpus-fit embedder
    (train/fit.py) actually serves."""
    import jax

    os.makedirs(path, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(params)
    _atomic_savez(
        os.path.join(path, "model.npz"),
        **{f"p{i}": np.asarray(leaf, dtype=np.float32) for i, leaf in enumerate(leaves)},
    )
    manifest = {
        "version": FORMAT_VERSION,
        "model_cfg": model_cfg,
        "n_leaves": len(leaves),
    }
    _atomic_write(os.path.join(path, "model_manifest.json"),
                  json.dumps(manifest))
    if tokenizer_state is not None:
        _atomic_write(os.path.join(path, "tokenizer.json"),
                      json.dumps(tokenizer_state))


def load_model(path: str) -> Optional[dict]:
    """Returns {"model_cfg", "leaves", "tokenizer_state"} or None."""
    manifest_path = os.path.join(path, "model_manifest.json")
    if not os.path.exists(manifest_path):
        return None
    with open(manifest_path) as f:
        manifest = json.load(f)
    data = np.load(os.path.join(path, "model.npz"))
    leaves = [data[f"p{i}"] for i in range(manifest["n_leaves"])]
    tok_path = os.path.join(path, "tokenizer.json")
    tokenizer_state = None
    if os.path.exists(tok_path):
        with open(tok_path, encoding="utf-8") as f:
            tokenizer_state = json.load(f)
    return {
        "model_cfg": manifest["model_cfg"],
        "leaves": leaves,
        "tokenizer_state": tokenizer_state,
    }


class IngestJournal:
    """Append-only write-ahead journal for document ingestion.

    The reference persisted uploads to disk before indexing
    (embedding_gen.py:360-367) but a crash between accepting a file and
    OpenSearch indexing lost the index entry. Here every /upload_text ingest
    appends (namespace, doc_id, text) — fsync'd — BEFORE any embedding work;
    startup replays entries whose doc_id is missing from the restored index,
    and a successful full checkpoint compacts the journal.
    """

    def __init__(self, ckpt_dir: str):
        os.makedirs(ckpt_dir, exist_ok=True)
        self.path = os.path.join(ckpt_dir, "ingest_journal.jsonl")

    def append(self, namespace: str, doc_id: str, text: str) -> None:
        rec = json.dumps(
            {"namespace": namespace, "doc_id": doc_id, "text": text}
        )
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(rec + "\n")
            f.flush()
            os.fsync(f.fileno())

    def entries(self) -> List[Dict[str, Any]]:
        if not os.path.exists(self.path):
            return []
        out: List[Dict[str, Any]] = []
        with open(self.path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    # torn tail write from a crash mid-append: ignore
                    continue
        return out

    def compact(self) -> None:
        """Drop all entries (call only after their state is durably saved)."""
        if os.path.exists(self.path):
            os.remove(self.path)


class CacheJournal:
    """Append-only journal of semantic-cache puts since the last checkpoint.

    ``save_cache`` persists the full device cache state (keys, LFU
    frequencies, responses), but answers cached *between* checkpoints lived
    only in memory — a restart forgot them and re-paid generation for every
    recently-asked query (the reference kept this state durable inside Redis,
    app/main.py:53-128). Each put appends (embedding, response) — fsync'd —
    on the generation path (where seconds-scale LLM latency dwarfs the
    write); startup replays the journal on top of the restored snapshot and
    a successful checkpoint compacts it.

    LFU frequency bumps are journaled too (``append_bumps``) so replay
    reproduces the EXACT eviction order the pre-crash cache would have used
    (Redis kept frequencies durable, app/main.py:92-96). Durability contract:
    every bump batch is ``write()``n immediately — which survives a process
    crash/kill (the bytes live in the OS page cache) — but ``fsync`` is
    amortized to every ``bump_fsync_every`` batches, so only a whole-machine
    crash can lose the tail between fsyncs. An fsync per cache *hit* would
    put disk on the device fast path to save one int.
    """

    def __init__(self, ckpt_dir: str, bump_fsync_every: int = 16):
        os.makedirs(ckpt_dir, exist_ok=True)
        self.path = os.path.join(ckpt_dir, "cache_journal.jsonl")
        self.bump_fsync_every = bump_fsync_every
        self._bumps_since_sync = 0

    def append(self, emb: np.ndarray, response: str,
               model_fp: Optional[str] = None) -> None:
        import base64

        rec = json.dumps({
            "emb": base64.b64encode(
                np.asarray(emb, np.float32).tobytes()
            ).decode("ascii"),
            "response": response,
            # Embeddings are only meaningful against the model that made
            # them; replay filters on this so a model swap between runs
            # can't inject stale-geometry cache keys.
            "fp": model_fp,
        })
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(rec + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._bumps_since_sync = 0  # the put's fsync covered pending bumps

    def append_bumps(self, bumps: Dict[int, int]) -> None:
        """Journal one probe's LFU frequency bumps ({slot: count}). Written
        immediately (survives process death), fsync'd every Nth batch."""
        if not bumps:
            return
        rec = json.dumps({"bumps": [[int(s), int(n)] for s, n in
                                    sorted(bumps.items())]})
        self._bumps_since_sync += 1
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(rec + "\n")
            f.flush()
            if self._bumps_since_sync >= self.bump_fsync_every:
                os.fsync(f.fileno())
                self._bumps_since_sync = 0

    def entries(self) -> List[Dict[str, Any]]:
        import base64

        if not os.path.exists(self.path):
            return []
        out: List[Dict[str, Any]] = []
        with open(self.path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    if "bumps" in rec:
                        rec["bumps"] = {int(s): int(n) for s, n in rec["bumps"]}
                    else:
                        rec["emb"] = np.frombuffer(
                            base64.b64decode(rec["emb"]), np.float32
                        )
                except (json.JSONDecodeError, KeyError, ValueError, TypeError):
                    # torn tail write from a crash mid-append: ignore
                    continue
                out.append(rec)
        return out

    def compact(self) -> None:
        """Drop all entries (call only after a full cache snapshot saved)."""
        if os.path.exists(self.path):
            os.remove(self.path)
        self._bumps_since_sync = 0
