// Host-side HNSW graph builder.
//
// TPU-native replacement for the graph-construction half of OpenSearch's
// nmslib HNSW engine (the reference delegates index builds to it via the
// knn_vector mapping, reference app/main.py:263-281). Construction is the
// classic Malkov–Yashunin algorithm (hierarchical insert with
// ef_construction beam + occlusion-pruning neighbor selection); the output
// is NOT nmslib's pointer graph but a flattened fixed-degree neighbor table
// (level-0 only, [n, 2M] int32, -1 padded) ready to upload to TPU HBM for
// the batched beam-search kernel. Entry-point descent through upper levels
// is replaced on-device by a pivot-matmul seed (see sqe_tpu/index/hnsw.py),
// so upper-level adjacency only steers construction quality here.
//
// Vectors must be L2-normalized; similarity is the dot product (the
// reference's cosinesimil space after its own normalization, app/main.py:316).
//
// Exposed as a C ABI for ctypes:
//   hnsw_build(vecs, n, d, m, ef_construction, seed, neighbors0, levels)
//   hnsw_insert_batch(...) — incremental insertion into an existing graph.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

using std::int32_t;
using std::int64_t;

struct Candidate {
  float sim;
  int32_t id;
};
struct BySimAsc {   // min-heap on similarity => worst candidate on top
  bool operator()(const Candidate& a, const Candidate& b) const {
    return a.sim > b.sim;
  }
};
struct BySimDesc {  // max-heap on similarity => best candidate on top
  bool operator()(const Candidate& a, const Candidate& b) const {
    return a.sim < b.sim;
  }
};

class Graph {
 public:
  Graph(const float* vecs, int64_t n_cap, int64_t d, int m, int ef_c,
        uint64_t seed)
      : vecs_(vecs),
        d_(d),
        m_(m),
        m0_(2 * m),
        ef_c_(ef_c),
        rng_(seed),
        level_mult_(1.0 / std::log(std::max(2, m))) {
    links_.reserve(n_cap);
    levels_.reserve(n_cap);
    visited_.reserve(n_cap);
    entry_ = -1;
    max_level_ = -1;
  }

  float dot(const float* a, const float* b) const {
    float s0 = 0.f, s1 = 0.f, s2 = 0.f, s3 = 0.f;
    int64_t i = 0;
    for (; i + 4 <= d_; i += 4) {
      s0 += a[i] * b[i];
      s1 += a[i + 1] * b[i + 1];
      s2 += a[i + 2] * b[i + 2];
      s3 += a[i + 3] * b[i + 3];
    }
    for (; i < d_; ++i) s0 += a[i] * b[i];
    return s0 + s1 + s2 + s3;
  }

  float sim(int32_t a, int32_t b) const {
    return dot(vecs_ + int64_t(a) * d_, vecs_ + int64_t(b) * d_);
  }
  float sim_to(const float* q, int32_t b) const {
    return dot(q, vecs_ + int64_t(b) * d_);
  }

  int assign_level() {
    std::uniform_real_distribution<double> u(0.0, 1.0);
    double r = u(rng_);
    if (r < 1e-12) r = 1e-12;
    int level = static_cast<int>(-std::log(r) * level_mult_);
    return std::min(level, 30);
  }

  // Greedy ef=1 descent at a given level starting from `start`.
  int32_t greedy_step(const float* q, int32_t start, int level) const {
    int32_t cur = start;
    float cur_sim = sim_to(q, cur);
    bool improved = true;
    while (improved) {
      improved = false;
      const auto& nbrs = links_[cur][level];
      for (int32_t nb : nbrs) {
        float s = sim_to(q, nb);
        if (s > cur_sim) {
          cur_sim = s;
          cur = nb;
          improved = true;
        }
      }
    }
    return cur;
  }

  // Beam search with ef candidates at `level`; returns candidates sorted
  // best-first.
  std::vector<Candidate> search_level(const float* q, int32_t entry, int level,
                                      int ef) {
    ++epoch_;
    std::priority_queue<Candidate, std::vector<Candidate>, BySimDesc> frontier;
    std::priority_queue<Candidate, std::vector<Candidate>, BySimAsc> best;
    float esim = sim_to(q, entry);
    frontier.push({esim, entry});
    best.push({esim, entry});
    visited_[entry] = epoch_;
    while (!frontier.empty()) {
      Candidate c = frontier.top();
      frontier.pop();
      if (best.size() >= size_t(ef) && c.sim < best.top().sim) break;
      for (int32_t nb : links_[c.id][level]) {
        if (visited_[nb] == epoch_) continue;
        visited_[nb] = epoch_;
        float s = sim_to(q, nb);
        if (best.size() < size_t(ef) || s > best.top().sim) {
          frontier.push({s, nb});
          best.push({s, nb});
          if (best.size() > size_t(ef)) best.pop();
        }
      }
    }
    std::vector<Candidate> out;
    out.reserve(best.size());
    while (!best.empty()) {
      out.push_back(best.top());
      best.pop();
    }
    std::reverse(out.begin(), out.end());  // best first
    return out;
  }

  // Occlusion-pruning neighbor selection (select_neighbors_heuristic).
  std::vector<int32_t> select_neighbors(const std::vector<Candidate>& cands,
                                        int max_m) const {
    std::vector<int32_t> chosen;
    chosen.reserve(max_m);
    for (const Candidate& c : cands) {
      if (int(chosen.size()) >= max_m) break;
      bool occluded = false;
      for (int32_t s : chosen) {
        if (sim(c.id, s) > c.sim) {  // s is closer to c than the query is
          occluded = true;
          break;
        }
      }
      if (!occluded) chosen.push_back(c.id);
    }
    // Backfill with nearest rejected candidates if underfull.
    if (int(chosen.size()) < max_m) {
      for (const Candidate& c : cands) {
        if (int(chosen.size()) >= max_m) break;
        if (std::find(chosen.begin(), chosen.end(), c.id) == chosen.end())
          chosen.push_back(c.id);
      }
    }
    return chosen;
  }

  void shrink(int32_t node, int level) {
    int cap = (level == 0) ? m0_ : m_;
    auto& nbrs = links_[node][level];
    if (int(nbrs.size()) <= cap) return;
    std::vector<Candidate> cands;
    cands.reserve(nbrs.size());
    const float* v = vecs_ + int64_t(node) * d_;
    for (int32_t nb : nbrs) cands.push_back({sim_to(v, nb), nb});
    std::sort(cands.begin(), cands.end(),
              [](const Candidate& a, const Candidate& b) { return a.sim > b.sim; });
    nbrs = select_neighbors(cands, cap);
  }

  void insert(int32_t id) {
    int level = assign_level();
    levels_.push_back(level);
    links_.emplace_back(level + 1);
    visited_.push_back(0);
    const float* q = vecs_ + int64_t(id) * d_;

    if (entry_ < 0) {
      entry_ = id;
      max_level_ = level;
      return;
    }

    int32_t cur = entry_;
    for (int l = max_level_; l > level; --l) cur = greedy_step(q, cur, l);

    for (int l = std::min(level, max_level_); l >= 0; --l) {
      auto cands = search_level(q, cur, l, ef_c_);
      cur = cands.front().id;
      int cap = (l == 0) ? m0_ : m_;
      auto chosen = select_neighbors(cands, std::min(cap, m_));
      links_[id][l] = chosen;
      for (int32_t nb : chosen) {
        links_[nb][l].push_back(id);
        shrink(nb, l);
      }
    }
    if (level > max_level_) {
      max_level_ = level;
      entry_ = id;
    }
  }

  void export_level0(int32_t* neighbors0, int32_t* levels_out) const {
    int64_t n = int64_t(links_.size());
    for (int64_t i = 0; i < n; ++i) {
      const auto& nbrs = links_[i][0];
      int64_t base = i * m0_;
      int j = 0;
      for (; j < int(nbrs.size()) && j < m0_; ++j) neighbors0[base + j] = nbrs[j];
      for (; j < m0_; ++j) neighbors0[base + j] = -1;
      if (levels_out) levels_out[i] = levels_[i];
    }
  }

  // Rebuild internal adjacency from a previously exported level-0 table so
  // incremental inserts can continue (upper levels restart empty; new nodes
  // re-grow the hierarchy).
  void import_level0(const int32_t* neighbors0, const int32_t* levels_in,
                     int64_t n) {
    links_.assign(n, {});
    levels_.assign(n, 0);
    visited_.assign(n, 0);
    int32_t best_level = -1;
    for (int64_t i = 0; i < n; ++i) {
      int lvl = levels_in ? levels_in[i] : 0;
      levels_[i] = lvl;
      links_[i].assign(lvl + 1, {});
      auto& nbrs = links_[i][0];
      for (int j = 0; j < m0_; ++j) {
        int32_t nb = neighbors0[i * m0_ + j];
        if (nb >= 0) nbrs.push_back(nb);
      }
      if (lvl > best_level) {
        best_level = lvl;
        entry_ = int32_t(i);
        max_level_ = lvl;
      }
    }
    // Upper-level adjacency is not part of the exported flat format; after an
    // import the hierarchy above level 0 is empty, so descent for new inserts
    // starts at the entry point and relies on level-0 beam search. New nodes
    // that draw high levels re-grow the hierarchy incrementally.
  }

  int64_t size() const { return int64_t(links_.size()); }

 private:
  const float* vecs_;
  int64_t d_;
  int m_, m0_, ef_c_;
  std::mt19937_64 rng_;
  double level_mult_;
  int32_t entry_;
  int max_level_;
  uint64_t epoch_ = 0;
  std::vector<std::vector<std::vector<int32_t>>> links_;  // [node][level][nbr]
  std::vector<int> levels_;
  mutable std::vector<uint64_t> visited_;
};

}  // namespace

extern "C" {

// Build a graph over n normalized d-dim vectors. neighbors0 must hold
// n * 2m int32; levels may be null or hold n int32.
int hnsw_build(const float* vecs, int64_t n, int64_t d, int m,
               int ef_construction, uint64_t seed, int32_t* neighbors0,
               int32_t* levels) {
  if (n <= 0 || d <= 0 || m <= 0 || ef_construction <= 0) return -1;
  Graph g(vecs, n, d, m, ef_construction, seed);
  for (int64_t i = 0; i < n; ++i) g.insert(int32_t(i));
  g.export_level0(neighbors0, levels);
  return 0;
}

// Incremental insert: `vecs` holds n_old + n_new rows; the first n_old rows
// already have adjacency in neighbors0/levels (as exported by hnsw_build over
// the same vectors). Appends n_new nodes and rewrites the (n_old+n_new)*2m
// neighbor table in place (caller allocates for the full size).
int hnsw_insert_batch(const float* vecs, int64_t n_old, int64_t n_new,
                      int64_t d, int m, int ef_construction, uint64_t seed,
                      int32_t* neighbors0, int32_t* levels) {
  if (n_new <= 0 || d <= 0 || m <= 0 || ef_construction <= 0) return -1;
  Graph g(vecs, n_old + n_new, d, m, ef_construction, seed);
  if (n_old > 0) g.import_level0(neighbors0, levels, n_old);
  for (int64_t i = 0; i < n_new; ++i) g.insert(int32_t(n_old + i));
  g.export_level0(neighbors0, levels);
  return 0;
}

}  // extern "C"
