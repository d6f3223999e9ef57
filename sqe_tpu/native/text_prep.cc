// Native batch tokenizer for the ingestion pipeline.
//
// The reference's data path shipped raw text over HTTP and let llama.cpp
// tokenize inside Ollama (app/main.py:134-145). Here tokenization is
// in-process (sqe_tpu/data/tokenizer.py); this is its native fast path for
// corpus-scale ingestion: same semantics — lowercase [a-z0-9]+ word runs,
// FNV-1a 64-bit hash into [N_SPECIAL, vocab), CLS prepended, truncate/pad to
// max_len — emitted directly into the caller's [B, L] int32 id and float mask
// buffers with zero Python-level per-word work.
//
// Exposed via C ABI for ctypes:
//   hash_tokenize_batch(data, offsets, n_texts, max_len, vocab_size, ids, mask)
//   vocab_tokenize_batch(..., table_hashes, table_ids, table_size,
//                        tail_base, hash_tail, ids, mask)
// where `data` is the concatenated UTF-8 text and offsets[i]..offsets[i+1]
// bounds text i. The vocab variant looks each word up in an open-addressing
// table of FNV-1a(word) hashes built host-side by VocabTokenizer (linear
// probing, power-of-two size); misses hash into the reserved OOV tail —
// the learned-vocabulary semantics of data/tokenizer.py::VocabTokenizer.

#include <cstdint>

namespace {

constexpr std::int32_t kPad = 0;
constexpr std::int32_t kCls = 1;
constexpr std::int32_t kUnk = 2;
constexpr std::int32_t kNSpecial = 3;

constexpr std::uint64_t kFnvOffset = 0xCBF29CE484222325ull;
constexpr std::uint64_t kFnvPrime = 0x100000001B3ull;

inline bool is_word_byte(unsigned char c, unsigned char* lowered) {
  if (c >= 'a' && c <= 'z') { *lowered = c; return true; }
  if (c >= 'A' && c <= 'Z') { *lowered = c - 'A' + 'a'; return true; }
  if (c >= '0' && c <= '9') { *lowered = c; return true; }
  return false;
}

}  // namespace

extern "C" {

int hash_tokenize_batch(const char* data, const std::int64_t* offsets,
                        std::int64_t n_texts, std::int64_t max_len,
                        std::int64_t vocab_size, std::int32_t* ids,
                        float* mask) {
  if (max_len <= 0 || vocab_size <= kNSpecial) return -1;
  const std::uint64_t buckets = std::uint64_t(vocab_size - kNSpecial);
  for (std::int64_t t = 0; t < n_texts; ++t) {
    std::int32_t* row = ids + t * max_len;
    float* mrow = mask + t * max_len;
    std::int64_t pos = 0;
    row[pos] = kCls;
    mrow[pos] = 1.0f;
    ++pos;

    const char* p = data + offsets[t];
    const char* end = data + offsets[t + 1];
    bool any_word = false;
    while (p < end && pos < max_len) {
      unsigned char lowered;
      // skip non-word bytes
      while (p < end && !is_word_byte(static_cast<unsigned char>(*p), &lowered))
        ++p;
      if (p >= end) break;
      // hash the word run
      std::uint64_t h = kFnvOffset;
      while (p < end && is_word_byte(static_cast<unsigned char>(*p), &lowered)) {
        h ^= lowered;
        h *= kFnvPrime;
        ++p;
      }
      any_word = true;
      row[pos] = kNSpecial + std::int32_t(h % buckets);
      mrow[pos] = 1.0f;
      ++pos;
    }
    if (!any_word && pos < max_len) {
      row[pos] = kUnk;
      mrow[pos] = 1.0f;
      ++pos;
    }
    for (; pos < max_len; ++pos) {
      row[pos] = kPad;
      mrow[pos] = 0.0f;
    }
  }
  return 0;
}

int vocab_tokenize_batch(const char* data, const std::int64_t* offsets,
                         std::int64_t n_texts, std::int64_t max_len,
                         const std::uint64_t* table_hashes,
                         const std::int32_t* table_ids,
                         std::int64_t table_size,   // power of two
                         std::int64_t tail_base, std::int64_t hash_tail,
                         std::int32_t* ids, float* mask) {
  if (max_len <= 0 || table_size <= 0 || (table_size & (table_size - 1)) != 0
      || hash_tail <= 0)
    return -1;
  const std::uint64_t tmask = std::uint64_t(table_size - 1);
  for (std::int64_t t = 0; t < n_texts; ++t) {
    std::int32_t* row = ids + t * max_len;
    float* mrow = mask + t * max_len;
    std::int64_t pos = 0;
    row[pos] = kCls;
    mrow[pos] = 1.0f;
    ++pos;

    const char* p = data + offsets[t];
    const char* end = data + offsets[t + 1];
    bool any_word = false;
    while (p < end && pos < max_len) {
      unsigned char lowered;
      while (p < end && !is_word_byte(static_cast<unsigned char>(*p), &lowered))
        ++p;
      if (p >= end) break;
      std::uint64_t h = kFnvOffset;
      while (p < end && is_word_byte(static_cast<unsigned char>(*p), &lowered)) {
        h ^= lowered;
        h *= kFnvPrime;
        ++p;
      }
      any_word = true;
      std::int32_t tid = -1;
      for (std::uint64_t idx = h & tmask; table_ids[idx] >= 0;
           idx = (idx + 1) & tmask) {
        if (table_hashes[idx] == h) { tid = table_ids[idx]; break; }
      }
      if (tid < 0)
        tid = std::int32_t(tail_base + std::int64_t(h % std::uint64_t(hash_tail)));
      row[pos] = tid;
      mrow[pos] = 1.0f;
      ++pos;
    }
    if (!any_word && pos < max_len) {
      row[pos] = kUnk;
      mrow[pos] = 1.0f;
      ++pos;
    }
    for (; pos < max_len; ++pos) {
      row[pos] = kPad;
      mrow[pos] = 0.0f;
    }
  }
  return 0;
}

}  // extern "C"
