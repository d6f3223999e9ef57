import numpy as np

from sqe_tpu.data.tokenizer import CLS_ID, N_SPECIAL, PAD_ID, UNK_ID, HashingTokenizer


def test_determinism():
    t1 = HashingTokenizer(4096, 16)
    t2 = HashingTokenizer(4096, 16)
    assert t1.tokenize("The heart pumps blood") == t2.tokenize("the HEART pumps blood")


def test_id_range():
    t = HashingTokenizer(4096, 16)
    ids = t.tokenize("alpha beta gamma delta")
    assert all(N_SPECIAL <= i < 4096 for i in ids)


def test_static_shapes_and_mask():
    t = HashingTokenizer(4096, 8)
    ids, mask = t.encode_batch(["one two three", ""])
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert ids[0, 0] == CLS_ID
    assert mask[0].sum() == 4  # CLS + 3 words
    # empty text -> CLS + UNK
    assert ids[1, 1] == UNK_ID
    assert ids[0, 4] == PAD_ID


def test_truncation():
    t = HashingTokenizer(4096, 4)
    ids, mask = t.encode_batch(["a b c d e f g"])
    assert mask[0].sum() == 4
    assert ids.shape == (1, 4)


def test_native_matches_python():
    """The C++ fast path must produce identical ids/mask to the Python impl
    on real corpus text (tests skip silently if no compiler)."""
    from sqe_tpu.data.tokenizer import _native_lib

    if _native_lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    import os

    texts = [
        "The Heart pumps BLOOD through 42 vessels!",
        "",
        "   ",
        "naïve café θεωρία mixed-UNICODE text 123",
        "x" * 5000,
        " ".join(f"word{i}" for i in range(600)),  # > max_len truncation
    ]
    pmc = "/root/reference/PMC"
    if os.path.isdir(pmc):
        from sqe_tpu.data import load_corpus

        texts += [c.text for c in load_corpus(pmc, 512, limit_files=3)][:20]
    t_native = HashingTokenizer(4096, 128, use_native=True)
    t_python = HashingTokenizer(4096, 128, use_native=False)
    ids_n, mask_n = t_native.encode_batch(texts)
    ids_p, mask_p = t_python.encode_batch(texts)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


class TestVocabTokenizer:
    def test_frequent_words_get_private_ids(self):
        from sqe_tpu.data.tokenizer import N_SPECIAL, VocabTokenizer

        texts = ["cardiac muscle cardiac tissue"] * 10 + ["rare xyzzy"]
        tok = VocabTokenizer.train(texts, vocab_size=128, max_len=16,
                                   hash_tail=32)
        ids = tok.tokenize("cardiac muscle")
        assert all(N_SPECIAL <= i < 128 - 32 for i in ids)  # learned region
        assert ids[0] != ids[1]
        # OOV word hashes into the tail deterministically
        oov = tok.tokenize("completelyunseenword")[0]
        assert 128 - 32 <= oov < 128
        assert oov == tok.tokenize("completelyunseenword")[0]

    def test_encode_batch_contract_matches_hashing(self):
        """Same static-shape [B, L] + CLS + mask contract as the hashing
        tokenizer (the embedder is tokenizer-agnostic)."""
        from sqe_tpu.data.tokenizer import CLS_ID, VocabTokenizer

        tok = VocabTokenizer.train(["alpha beta gamma"], vocab_size=64,
                                   max_len=8, hash_tail=16)
        ids, mask = tok.encode_batch(["alpha beta", ""], max_len=8)
        assert ids.shape == (2, 8) and mask.shape == (2, 8)
        assert ids[0, 0] == CLS_ID
        assert mask[0].sum() == 3  # CLS + 2 words
        assert mask[1].sum() == 2  # CLS + UNK for empty text

    def test_roundtrip_dict(self):
        from sqe_tpu.data.tokenizer import VocabTokenizer, tokenizer_from_dict

        tok = VocabTokenizer.train(["one two three two three three"],
                                   vocab_size=64, max_len=8, hash_tail=16)
        tok2 = tokenizer_from_dict(tok.to_dict(), 64, 8)
        assert tok2.tokenize("three two one zzz") == tok.tokenize("three two one zzz")


def test_vocab_native_matches_python():
    """The learned-vocabulary C++ fast path must produce identical ids/mask
    to the Python impl: vocab hits, OOV tail hashes, truncation, empties."""
    import os

    import pytest

    from sqe_tpu.data.tokenizer import VocabTokenizer, _native_lib

    if _native_lib() is None:
        pytest.skip("no native toolchain")
    corpus = [
        "the heart pumps blood through the aorta",
        "cardiac enzymes regulate blood pressure",
        "unrelated astronomy text about galaxies",
    ] * 10
    texts = [
        "The Heart pumps BLOOD through 42 vessels!",
        "totally novel oovwords qqzzy galaxies",
        "",
        "   ",
        "naïve café θεωρία mixed-UNICODE text 123",
        " ".join(f"word{i}" for i in range(600)),
    ]
    pmc = "/root/reference/PMC"
    if os.path.isdir(pmc):
        from sqe_tpu.data import load_corpus

        chunks = [c.text for c in load_corpus(pmc, 512, limit_files=3)]
        corpus += chunks
        texts += chunks[:20]
    t_native = VocabTokenizer.train(corpus, 4096, 128)
    t_python = VocabTokenizer(dict(t_native.vocab), vocab_size=4096,
                              max_len=128, hash_tail=t_native.hash_tail,
                              use_native=False)
    assert t_native.use_native
    ids_n, mask_n = t_native.encode_batch(texts)
    ids_p, mask_p = t_python.encode_batch(texts)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_python_fold_matches_native_on_unicode_casefolds():
    """Unicode codepoints that str.lower() would fold INTO ascii word chars
    (Kelvin sign U+212A -> 'k', U+0130 -> 'i'+dot) must NOT create divergent
    tokens between the native scanner and the Python fallback."""
    from sqe_tpu.data.tokenizer import VocabTokenizer, _native_lib, _words

    # the shared fold is ASCII-only: U+212A is not a word char on either path
    assert _words("temperature 300K reading") == \
        ["temperature", "300", "reading"]
    assert _words("İstanbul") == ["stanbul"]
    if _native_lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    texts = ["temperature 300K reading", "İstanbul IS big",
             "Straße KKM"]
    corpus = ["temperature reading 300k kelvin"] * 4
    t_native = VocabTokenizer.train(corpus, 1024, 64)
    t_python = VocabTokenizer(dict(t_native.vocab), 1024, 64,
                              t_native.hash_tail, use_native=False)
    n = t_native.encode_batch(texts)
    p = t_python.encode_batch(texts)
    np.testing.assert_array_equal(n[0], p[0])
    np.testing.assert_array_equal(n[1], p[1])
