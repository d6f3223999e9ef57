"""Mined-hard-negative machinery: neighbor mining (train/mine.py) and
neighborhood batch assembly (train/data.py hard_neighbors path)."""

import numpy as np

from sqe_tpu.data.corpus import Chunk
from sqe_tpu.data.tokenizer import HashingTokenizer
from sqe_tpu.train.data import pair_batches
from sqe_tpu.train.mine import mine_hard_neighbors


def _clustered_emb(n_clusters=8, per_cluster=12, d=32, seed=0):
    """Clustered unit vectors: same-cluster cosines ~0.9, cross ~0."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(n_clusters):
        noise = 0.05 * rng.normal(size=(per_cluster, d))
        v = centers[c] + noise
        rows.append(v / np.linalg.norm(v, axis=1, keepdims=True))
    return np.concatenate(rows), per_cluster


def test_mine_finds_cluster_mates_and_excludes_self():
    emb, per = _clustered_emb()
    k = per - 1
    nbrs = mine_hard_neighbors(emb, k=k, block=16)
    assert nbrs.shape == (emb.shape[0], k)
    for row in range(emb.shape[0]):
        assert row not in nbrs[row]
        mates = set(range((row // per) * per, (row // per + 1) * per)) - {row}
        found = set(int(x) for x in nbrs[row] if x >= 0)
        # All mined neighbors should be cluster mates (cross-cluster cosine
        # is near zero while in-cluster is ~0.9).
        assert found and found <= mates


def test_mine_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(40, 16)).astype(np.float32)
    k = 5
    nbrs = mine_hard_neighbors(emb, k=k, block=7, dup_cos=2.0)
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    scores = unit @ unit.T
    np.fill_diagonal(scores, -np.inf)
    oracle = np.argsort(-scores, axis=1)[:, :k]
    np.testing.assert_array_equal(nbrs, oracle.astype(np.int32))


def test_mine_drops_near_duplicates():
    base = np.random.default_rng(4).normal(size=(6, 8)).astype(np.float32)
    emb = np.concatenate([base, base[:1] + 1e-4])  # row 6 duplicates row 0
    nbrs = mine_hard_neighbors(emb, k=3, block=4, dup_cos=0.98)
    assert 6 not in nbrs[0]
    assert 0 not in nbrs[6]


def _chunks(n=48):
    rng = np.random.default_rng(7)
    out = []
    for i in range(n):
        words = [f"w{int(x)}" for x in rng.integers(0, 99, size=40)]
        out.append(Chunk(f"d{i}", 0, " ".join(words)))
    return out


def test_hard_batches_group_neighbors_without_duplicates():
    chunks = _chunks(48)
    tok = HashingTokenizer(512, 32)
    # Ring neighborhoods: chunk i's mined neighbors are i+1..i+3 (mod n).
    n = len(chunks)
    nbrs = np.stack([(np.arange(1, 4) + i) % n for i in range(n)]) \
        .astype(np.int32)
    batches = list(pair_batches(
        chunks, tok, batch_size=8, max_len=32, epochs=2, style="asym",
        hard_neighbors=nbrs, hard_group=4, hard_frac=1.0, seed=5,
    ))
    assert batches, "hard path yields batches"
    grouped = 0
    for b in batches:
        rows = [tuple(r) for r in b["p_ids"]]
        assert len(set(rows)) == len(rows), "no duplicate passages in batch"
        assert b["q_ids"].shape == (8, 32)
    # Reconstruct row identity via token rows: instead, rerun the row
    # streamer logic indirectly — with hard_frac=1.0 and group 4, each batch
    # of 8 must contain at least one seed together with one of its ring
    # neighbors. Check via passage equality against the tokenized corpus.
    ids, _ = tok.encode_batch([c.text for c in chunks], max_len=32)
    key_to_row = {tuple(r): i for i, r in enumerate(ids)}
    for b in batches:
        rows = [key_to_row[tuple(r)] for r in b["p_ids"]]
        hits = sum(
            1 for r in rows
            if any(((r + d) % n) in rows for d in (1, 2, 3))
        )
        grouped += hits
    assert grouped >= len(batches) * 4, \
        "most batch members sit next to a ring neighbor"


def test_hard_frac_zero_matches_plain_batching():
    chunks = _chunks(32)
    tok = HashingTokenizer(512, 32)
    nbrs = np.zeros((len(chunks), 4), np.int32)
    plain = list(pair_batches(chunks, tok, batch_size=8, max_len=32,
                              epochs=1, style="asym", seed=9))
    for frac in (0.0, 0.01):  # 0.01 rounds to a zero hard quota at B=8
        gated = list(pair_batches(chunks, tok, batch_size=8, max_len=32,
                                  epochs=1, style="asym", seed=9,
                                  hard_neighbors=nbrs, hard_frac=frac))
        assert len(plain) == len(gated)
        for a, b in zip(plain, gated):
            np.testing.assert_array_equal(a["p_ids"], b["p_ids"])
            np.testing.assert_array_equal(a["q_ids"], b["q_ids"])


def test_fit_accepts_hard_neighbors(cpu_device):
    from sqe_tpu.config import ModelConfig
    from sqe_tpu.train.fit import fit_embedder

    cfg = ModelConfig(d_model=32, n_layers=1, n_heads=2, d_ff=64, max_len=32,
                      vocab_size=512, embed_dim=32)
    chunks = _chunks(32)
    n = len(chunks)
    nbrs = np.stack([(np.arange(1, 5) + i) % n for i in range(n)]) \
        .astype(np.int32)
    params, losses = fit_embedder(
        chunks, cfg, steps=6, batch_size=8, pair_max_len=32, lr=3e-3,
        style="asym", hard_neighbors=nbrs, hard_group=4, hard_frac=0.5,
    )
    assert len(losses) == 6
    assert np.isfinite(losses).all()
