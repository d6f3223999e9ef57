"""Self-supervised corpus adaptation: pairs are well-formed and training
improves retrieval alignment (positives rank above in-batch negatives)."""

import numpy as np

from sqe_tpu.config import ModelConfig
from sqe_tpu.data.corpus import Chunk
from sqe_tpu.data.tokenizer import HashingTokenizer
from sqe_tpu.models import Embedder
from sqe_tpu.train.data import pair_batches, span_pair
from sqe_tpu.train.fit import fit_embedder

CFG = ModelConfig(d_model=64, n_layers=1, n_heads=2, d_ff=128, max_len=32,
                  vocab_size=1024, embed_dim=64)


def _chunks(n=64):
    rng = np.random.default_rng(0)
    vocab = [f"term{i}" for i in range(200)]
    out = []
    for i in range(n):
        words = [vocab[int(x)] for x in rng.integers(0, 200, size=80)]
        # Give each chunk a UNIQUE topical signature: shared topics would
        # make same-topic chunks near-duplicates, so "own passage ranks
        # top-1" stops being well-defined once the model learns the topic
        # structure (alignment measured 0.75 with 4-way topic aliasing
        # precisely because training worked).
        words += [f"topic{i}"] * 40
        rng.shuffle(words)
        out.append(Chunk(f"d{i}", 0, " ".join(words)))
    return out


def test_span_pair_shapes():
    rng = np.random.default_rng(1)
    words = [f"w{i}" for i in range(100)]
    a, b = span_pair(words, rng)
    assert 16 <= len(a.split()) <= 64
    assert 16 <= len(b.split()) <= 64
    short = ["a", "b", "c"]
    a, b = span_pair(short, rng)
    assert a and b


def test_pair_batches_static_shapes():
    tok = HashingTokenizer(CFG.vocab_size, CFG.max_len)
    batches = list(pair_batches(_chunks(40), tok, batch_size=8, max_len=32,
                                epochs=1))
    assert len(batches) == 5
    for b in batches:
        assert b["q_ids"].shape == (8, 32)
        assert b["p_mask"].shape == (8, 32)


def test_fit_improves_pair_alignment(cpu_device):
    chunks = _chunks(64)
    params, losses = fit_embedder(
        chunks, CFG, steps=30, batch_size=16, pair_max_len=32, lr=3e-3,
    )
    assert losses[-1] < losses[0]

    def alignment(embedder):
        rng = np.random.default_rng(7)
        qs, ps = [], []
        for c in chunks[:16]:
            a, b = span_pair(c.text.split(), rng)
            qs.append(a)
            ps.append(b)
        qe = embedder.embed_texts(qs, batch_size=16, max_len=32)
        pe = embedder.embed_texts(ps, batch_size=16, max_len=32)
        sims = qe @ pe.T
        # fraction of queries whose own passage is the top match
        return float(np.mean(np.argmax(sims, axis=1) == np.arange(16)))

    before = alignment(Embedder(CFG, attn_impl="xla", device=cpu_device))
    after = alignment(Embedder(CFG, params=params, attn_impl="xla",
                               device=cpu_device))
    assert after >= before
    assert after >= 0.5


class _BagOfWordsEmbedder:
    """Deterministic lexical embedder: normalized hashed bag-of-words.
    Retrieves correctly iff query and chunk share content vocabulary —
    isolates the eval harness from model quality."""

    def embed_texts(self, texts, batch_size=64, max_len=None):
        import zlib

        out = np.zeros((len(texts), 1024), np.float32)
        for i, t in enumerate(texts):
            for w in t.lower().split():
                w = w.strip(".,;:!?")
                out[i, zlib.crc32(w.encode()) % 1024] += 1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-6)


def test_make_question_is_not_a_contiguous_span():
    from collections import Counter

    from sqe_tpu.train.eval import _fold_word, make_question

    chunks = _chunks(16)
    rng = np.random.default_rng(3)
    df = Counter()
    for c in chunks:
        df.update({_fold_word(w) for w in c.text.split()})
    text = chunks[0].text
    q = make_question(text, rng, df)
    assert q is not None and q.endswith("?")
    # Question terms come from the chunk's vocabulary...
    q_words = [w.strip(",?") for w in q.split()]
    content = [w for w in q_words if w.startswith(("term", "topic"))]
    assert len(content) >= 2
    assert all(w in text.split() for w in content)
    # ...but the question itself is NOT a contiguous substring of the chunk.
    assert q not in text


def test_question_eval_rewards_shared_vocabulary():
    from sqe_tpu.train.eval import question_eval

    chunks = _chunks(64)
    m = question_eval(_BagOfWordsEmbedder(), chunks, n_queries=32, k=5)
    # Each question anchors on its chunk's unique topic word, so BoW
    # retrieval succeeds iff the harness wires queries to the right source
    # rows (template boilerplate adds hash noise, hence not 1.0 at top-1).
    assert m["acc@1"] >= 0.7
    assert m["acc@5"] >= 0.95
    assert m["n_queries"] == 32.0


def test_q_dropout_subsets_passage_tokens():
    """Dropped-out query spans stay subsets (not necessarily contiguous
    slices) of their passage's token row."""
    from sqe_tpu.data.tokenizer import CLS_ID

    tok = HashingTokenizer(CFG.vocab_size, CFG.max_len)
    batches = list(pair_batches(_chunks(16), tok, batch_size=8, max_len=32,
                                epochs=1, style="asym", q_max_len=16,
                                q_dropout=0.3))
    assert batches
    for b in batches:
        for j in range(8):
            q_len = int(b["q_mask"][j].sum())
            assert q_len >= 2  # CLS + at least one surviving token
            assert b["q_ids"][j, 0] == CLS_ID
            span = set(b["q_ids"][j, 1:q_len].tolist())
            passage = set(b["p_ids"][j, 1:].tolist())
            assert span <= passage


def test_q_shuffle_permutes_within_passage():
    """Shuffled queries keep the same token multiset (still drawn from the
    passage) but at least one query must break contiguity — the
    order-free question shape (train/eval.py question_eval)."""
    from sqe_tpu.data.tokenizer import CLS_ID

    tok = HashingTokenizer(CFG.vocab_size, CFG.max_len)
    batches = list(pair_batches(_chunks(16), tok, batch_size=8, max_len=32,
                                epochs=2, style="asym", q_max_len=16,
                                q_shuffle=1.0, seed=5))
    assert batches
    non_contiguous = 0
    for b in batches:
        for j in range(8):
            q_len = int(b["q_mask"][j].sum())
            assert b["q_ids"][j, 0] == CLS_ID
            span = b["q_ids"][j, 1:q_len].tolist()
            passage = b["p_ids"][j, 1:].tolist()
            assert set(span) <= set(passage)
            if not any(passage[s:s + len(span)] == span
                       for s in range(len(passage) - len(span) + 1)):
                non_contiguous += 1
    assert non_contiguous > 0


def test_warm_start_resumes_from_params():
    """init_params warm-starts the train state: the first-step loss of a
    warm-started fit must match continuing the original fit, not a fresh
    random init."""
    import jax

    from sqe_tpu.train.contrastive import make_train_state

    cfg = CFG
    st_fresh, _ = make_train_state(cfg, key=jax.random.PRNGKey(0))
    st_warm, _ = make_train_state(cfg, key=jax.random.PRNGKey(1),
                                  init_params=st_fresh.params)
    a = jax.tree_util.tree_leaves(st_fresh.params)
    b = jax.tree_util.tree_leaves(st_warm.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_asym_pairs_are_token_subspans():
    """Token-space query spans must be contiguous slices of their passage's
    token row (CLS re-prepended), with serving-shaped lengths."""
    from sqe_tpu.data.tokenizer import CLS_ID

    tok = HashingTokenizer(CFG.vocab_size, CFG.max_len)
    batches = list(pair_batches(_chunks(16), tok, batch_size=8, max_len=32,
                                epochs=1, style="asym", q_max_len=16))
    assert batches
    for b in batches:
        assert b["q_ids"].shape == (8, 16)
        assert b["p_ids"].shape == (8, 32)
        for j in range(8):
            q_len = int(b["q_mask"][j].sum())
            assert b["q_ids"][j, 0] == CLS_ID
            span = b["q_ids"][j, 1:q_len].tolist()
            assert 1 <= len(span) <= 15
            passage = b["p_ids"][j, 1:].tolist()
            # contiguous subsequence check
            found = any(
                passage[s:s + len(span)] == span
                for s in range(len(passage) - len(span) + 1)
            )
            assert found
