// Native bulk query sampler for graphqembed_tpu.
//
// The reference's offline sampling is pure-python dict/set traversal driven
// by multiprocessing [R: netquery/data_utils.py::parallel_sample (conf=M)];
// at bio scale (~1e5 nodes, ~8M edges, millions of queries) that is the
// preprocessing bottleneck. This is the same exact semantics as
// data/sampling.py (reverse walks from a target, exact answer sets by CSR
// set algebra, negatives = non-answers of the target mode, hard negatives =
// partial-branch matches) over flat CSR arrays, compiled with g++ and bound
// via ctypes (python fallback remains; invariants cross-checked in tests).
//
// Graph encoding (all int32, passed from python):
//   modes:      mode_lo[m], mode_hi[m]                   (global id ranges)
//   relations:  rel_from_mode[r], rel_to_mode[r], rel_rev[r]
//               indptr_off[r]  -> offset into indptr_cat (len n_from+1 each)
//               indices_off[r] -> offset into indices_cat
// Structures: 0=1p 1=2p 2=3p 3=2i 4=3i 5=ip 6=pi  (config.STRUCTURES order).

#include <cstdint>
#include <cstring>
#include <random>
#include <unordered_set>
#include <vector>

namespace {

struct Graph {
  int n_modes = 0, n_rels = 0;
  const int32_t *mode_lo = nullptr, *mode_hi = nullptr;
  const int32_t *rel_from_mode = nullptr, *rel_to_mode = nullptr,
                *rel_rev = nullptr;
  const int64_t *indptr_off = nullptr, *indices_off = nullptr;
  const int32_t *indptr_cat = nullptr, *indices_cat = nullptr;

  int mode_of(int32_t gid) const {
    for (int m = 0; m < n_modes; ++m)
      if (gid >= mode_lo[m] && gid < mode_hi[m]) return m;
    return -1;
  }
  // neighbors of global node `gid` under relation r (empty if out of range)
  std::pair<const int32_t*, int> neighbors(int r, int32_t gid) const {
    const int from_m = rel_from_mode[r];
    const int32_t lo = mode_lo[from_m];
    if (gid < lo || gid >= mode_hi[from_m]) return {nullptr, 0};
    const int32_t* ip = indptr_cat + indptr_off[r];
    const int32_t a = ip[gid - lo], b = ip[gid - lo + 1];
    return {indices_cat + indices_off[r] + a, b - a};
  }
  int64_t rel_nnz(int r) const {
    const int from_m = rel_from_mode[r];
    const int n_from = mode_hi[from_m] - mode_lo[from_m];
    return (indptr_cat + indptr_off[r])[n_from];
  }
};

using Set = std::unordered_set<int32_t>;

void project_into(const Graph& g, const Set& src, int rel, Set* out) {
  for (int32_t v : src) {
    auto [p, n] = g.neighbors(rel, v);
    for (int i = 0; i < n; ++i) out->insert(p[i]);
  }
}

Set project(const Graph& g, const Set& src, int rel) {
  Set out;
  project_into(g, src, rel, &out);
  return out;
}

struct Walk {
  int rels[3];
  int32_t anchors[3];
  int32_t target;
  int n_rels, n_anchors;
};

struct Sampler {
  const Graph& g;
  std::mt19937_64 rng;
  std::vector<int> live;                       // relations with edges
  std::vector<std::vector<int>> in_rels;       // per mode: rels with to_mode=m

  Sampler(const Graph& g_, uint64_t seed) : g(g_), rng(seed) {
    for (int r = 0; r < g.n_rels; ++r)
      if (g.rel_nnz(r) > 0) live.push_back(r);
    in_rels.resize(g.n_modes);
    for (int r : live) in_rels[g.rel_to_mode[r]].push_back(r);
  }

  int32_t pick(const int32_t* p, int n) { return p[rng() % n]; }

  // random (rel, src) with src having out-edges under rel
  bool pick_edge(int rel, int32_t* src, int32_t* dst) {
    const int from_m = g.rel_from_mode[rel];
    const int32_t lo = g.mode_lo[from_m], hi = g.mode_hi[from_m];
    for (int t = 0; t < 64; ++t) {
      int32_t s = lo + (int32_t)(rng() % (hi - lo));
      auto [p, n] = g.neighbors(rel, s);
      if (n > 0) { *src = s; *dst = pick(p, n); return true; }
    }
    // dense fallback: scan from a random start
    int32_t start = lo + (int32_t)(rng() % (hi - lo));
    for (int32_t s = start; s < hi; ++s) {
      auto [p, n] = g.neighbors(rel, s);
      if (n > 0) { *src = s; *dst = pick(p, n); return true; }
    }
    for (int32_t s = lo; s < start; ++s) {
      auto [p, n] = g.neighbors(rel, s);
      if (n > 0) { *src = s; *dst = pick(p, n); return true; }
    }
    return false;
  }

  // random in-edge of `node`: (rel, src) with src -rel-> node
  bool pick_in_edge(int32_t node, int* rel, int32_t* src) {
    const auto& cands = in_rels[g.mode_of(node)];
    if (cands.empty()) return false;
    int start = (int)(rng() % cands.size());
    for (size_t k = 0; k < cands.size(); ++k) {
      int r = cands[(start + k) % cands.size()];
      auto [p, n] = g.neighbors(g.rel_rev[r], node);
      if (n > 0) { *rel = r; *src = pick(p, n); return true; }
    }
    return false;
  }

  bool walk(int structure, Walk* w) {
    if (live.empty()) return false;
    switch (structure) {
      case 0: case 1: case 2: {                       // 1p/2p/3p
        const int hops = structure + 1;
        int rel = live[rng() % live.size()];
        int32_t src, dst;
        if (!pick_edge(rel, &src, &dst)) return false;
        int chain[3] = {rel, 0, 0};
        int32_t cur = src;
        for (int h = 1; h < hops; ++h) {
          int r_in; int32_t prev;
          if (!pick_in_edge(cur, &r_in, &prev)) return false;
          for (int i = h; i > 0; --i) chain[i] = chain[i - 1];
          chain[0] = r_in;
          cur = prev;
        }
        w->n_rels = hops; w->n_anchors = 1;
        for (int i = 0; i < hops; ++i) w->rels[i] = chain[i];
        w->anchors[0] = cur; w->target = dst;
        return true;
      }
      case 3: case 4: {                               // 2i/3i
        const int k = structure - 1;                  // 2 or 3 branches
        int rel0 = live[rng() % live.size()];
        int32_t a0, tgt;
        if (!pick_edge(rel0, &a0, &tgt)) return false;
        int rels[3] = {rel0, 0, 0};
        int32_t anchors[3] = {a0, 0, 0};
        for (int b = 1; b < k; ++b) {
          int r; int32_t a;
          if (!pick_in_edge(tgt, &r, &a)) return false;
          for (int j = 0; j < b; ++j)
            if (rels[j] == r && anchors[j] == a) return false;
          rels[b] = r; anchors[b] = a;
        }
        // shuffle branch order
        for (int i = k - 1; i > 0; --i) {
          int j = (int)(rng() % (i + 1));
          std::swap(rels[i], rels[j]);
          std::swap(anchors[i], anchors[j]);
        }
        w->n_rels = k; w->n_anchors = k;
        for (int i = 0; i < k; ++i) { w->rels[i] = rels[i]; w->anchors[i] = anchors[i]; }
        w->target = tgt;
        return true;
      }
      case 6: {                                       // pi
        int rel2 = live[rng() % live.size()];
        int32_t v, tgt;
        if (!pick_edge(rel2, &v, &tgt)) return false;
        int rel1; int32_t a1;
        if (!pick_in_edge(v, &rel1, &a1)) return false;
        int rel3; int32_t a2;
        if (!pick_in_edge(tgt, &rel3, &a2)) return false;
        if (rel3 == rel2 && a2 == v) return false;    // degenerate
        w->n_rels = 3; w->n_anchors = 2;
        w->rels[0] = rel1; w->rels[1] = rel2; w->rels[2] = rel3;
        w->anchors[0] = a1; w->anchors[1] = a2; w->target = tgt;
        return true;
      }
      case 5: {                                       // ip
        int rel3 = live[rng() % live.size()];
        int32_t v, tgt;
        if (!pick_edge(rel3, &v, &tgt)) return false;
        int rel1, rel2; int32_t a1, a2;
        if (!pick_in_edge(v, &rel1, &a1)) return false;
        if (!pick_in_edge(v, &rel2, &a2)) return false;
        if (rel1 == rel2 && a1 == a2) return false;
        w->n_rels = 3; w->n_anchors = 2;
        w->rels[0] = rel1; w->rels[1] = rel2; w->rels[2] = rel3;
        w->anchors[0] = a1; w->anchors[1] = a2; w->target = tgt;
        return true;
      }
    }
    return false;
  }

  // exact answer set + per-branch sets (at the join node for ip)
  void answers(int structure, const Walk& w, Set* ans,
               std::vector<Set>* branches) {
    branches->clear();
    switch (structure) {
      case 0: case 1: case 2: {
        Set cur{w.anchors[0]};
        for (int i = 0; i < w.n_rels; ++i) cur = project(g, cur, w.rels[i]);
        branches->push_back(std::move(cur));
        *ans = (*branches)[0];
        return;
      }
      case 3: case 4: {
        for (int b = 0; b < w.n_anchors; ++b)
          branches->push_back(project(g, Set{w.anchors[b]}, w.rels[b]));
        break;
      }
      case 6: {                                        // pi
        Set chain = project(g, project(g, Set{w.anchors[0]}, w.rels[0]),
                            w.rels[1]);
        branches->push_back(std::move(chain));
        branches->push_back(project(g, Set{w.anchors[1]}, w.rels[2]));
        break;
      }
      case 5: {                                        // ip: join at v
        branches->push_back(project(g, Set{w.anchors[0]}, w.rels[0]));
        branches->push_back(project(g, Set{w.anchors[1]}, w.rels[1]));
        Set joined;
        for (int32_t x : (*branches)[0])
          if ((*branches)[1].count(x)) joined.insert(x);
        *ans = project(g, joined, w.rels[2]);
        return;
      }
    }
    // generic intersection at target (2i/3i/pi)
    ans->clear();
    for (int32_t x : (*branches)[0]) {
      bool all = true;
      for (size_t b = 1; b < branches->size(); ++b)
        if (!(*branches)[b].count(x)) { all = false; break; }
      if (all) ans->insert(x);
    }
  }

  int sample_negs(int target_mode, const Set& ans, int32_t* out, int max_negs,
                  bool exhaustive) {
    const int32_t lo = g.mode_lo[target_mode], hi = g.mode_hi[target_mode];
    const int64_t n_mode = hi - lo;
    int count = 0;
    if (exhaustive || n_mode <= 4 * max_negs) {
      for (int32_t c = lo; c < hi && count < max_negs; ++c)
        if (!ans.count(c)) out[count++] = c;
      // exhaustive caller passes max_negs = n_mode
      return count;
    }
    Set seen;
    for (int64_t draws = 0; count < max_negs && draws < 50LL * max_negs;
         ++draws) {
      int32_t c = lo + (int32_t)(rng() % n_mode);
      if (ans.count(c) || seen.count(c)) continue;
      seen.insert(c);
      out[count++] = c;
    }
    return count;
  }
};

struct Key {
  int64_t h;
  bool operator==(const Key& o) const { return h == o.h; }
};
struct KeyHash {
  size_t operator()(const Key& k) const { return (size_t)k.h; }
};

}  // namespace

extern "C" {

// Returns number of queries written (<= n_queries).
int gqe_sample_queries(
    // graph
    int n_modes, const int32_t* mode_lo, const int32_t* mode_hi,
    int n_rels, const int32_t* rel_from_mode, const int32_t* rel_to_mode,
    const int32_t* rel_rev, const int64_t* indptr_off,
    const int64_t* indices_off, const int32_t* indptr_cat,
    const int32_t* indices_cat,
    // request
    int structure, int n_queries, uint64_t seed, int max_negs, int max_tries,
    int exhaustive_negs,
    // outputs (caller-allocated)
    int32_t* out_rels,        // [n, 3]
    int32_t* out_anchors,     // [n, 3]
    int32_t* out_targets,     // [n]
    int32_t* out_negs,        // [n, max_negs]
    int32_t* out_neg_counts,  // [n]
    int32_t* out_hard,        // [n, max_negs]
    int32_t* out_hard_counts  // [n]
) {
  Graph g;
  g.n_modes = n_modes; g.mode_lo = mode_lo; g.mode_hi = mode_hi;
  g.n_rels = n_rels; g.rel_from_mode = rel_from_mode;
  g.rel_to_mode = rel_to_mode; g.rel_rev = rel_rev;
  g.indptr_off = indptr_off; g.indices_off = indices_off;
  g.indptr_cat = indptr_cat; g.indices_cat = indices_cat;

  Sampler s(g, seed);
  std::unordered_set<Key, KeyHash> dedup;
  const bool has_hard = structure >= 3;
  int written = 0;
  int64_t budget = 20LL * n_queries + 100;

  Walk w;
  Set ans;
  std::vector<Set> branches;
  std::vector<int32_t> scratch;
  while (written < n_queries && budget-- > 0) {
    for (int t = 0; t < max_tries; ++t)
      if (s.walk(structure, &w)) break; else w.n_rels = 0;
    if (w.n_rels == 0) continue;

    // dedup key: fnv over (rels, anchors, target)
    uint64_t h = 1469598103934665603ULL;
    auto mix = [&h](int64_t x) {
      h ^= (uint64_t)x; h *= 1099511628211ULL;
    };
    for (int i = 0; i < w.n_rels; ++i) mix(w.rels[i]);
    for (int i = 0; i < w.n_anchors; ++i) mix(w.anchors[i]);
    mix(w.target);
    if (!dedup.insert(Key{(int64_t)h}).second) continue;

    s.answers(structure, w, &ans, &branches);
    const int tmode = g.mode_of(w.target);
    int n_negs = s.sample_negs(tmode, ans, out_negs + (int64_t)written * max_negs,
                               max_negs, exhaustive_negs != 0);
    if (n_negs == 0) continue;

    int n_hard = 0;
    if (has_hard) {
      Set partial;
      for (const Set& b : branches)
        for (int32_t x : b) partial.insert(x);
      Set hard;
      if (structure == 5) {  // ip: project partial matches through r3
        Set proj = project(g, partial, w.rels[2]);
        for (int32_t x : proj) if (!ans.count(x)) hard.insert(x);
      } else {
        for (int32_t x : partial) if (!ans.count(x)) hard.insert(x);
      }
      scratch.assign(hard.begin(), hard.end());
      if ((int)scratch.size() > max_negs) {
        // uniform subsample without replacement (partial Fisher-Yates)
        for (int i = 0; i < max_negs; ++i) {
          int j = i + (int)(s.rng() % (scratch.size() - i));
          std::swap(scratch[i], scratch[j]);
        }
        scratch.resize(max_negs);
      }
      n_hard = (int)scratch.size();
      if (n_hard)
        std::memcpy(out_hard + (int64_t)written * max_negs, scratch.data(),
                    sizeof(int32_t) * n_hard);
    }

    for (int i = 0; i < 3; ++i) {
      out_rels[written * 3 + i] = i < w.n_rels ? w.rels[i] : -1;
      out_anchors[written * 3 + i] = i < w.n_anchors ? w.anchors[i] : -1;
    }
    out_targets[written] = w.target;
    out_neg_counts[written] = n_negs;
    out_hard_counts[written] = n_hard;
    ++written;
  }
  return written;
}

// Bulk 1p pool: EVERY edge of every relation as a 1p query with `max_negs`
// exact negatives (rejection-sampled against the anchor's answer set, which
// for 1p is just its neighbor row — built once per source and reused for all
// of that source's out-edges). This is how the reference gets 1p coverage:
// its train_edges set IS the full edge set, not a subsample — a 20k-query 1p
// pool leaves most embeddings without a single positive gradient at
// 100k-node scale (round-1 paper-scale failure mode).
//
// If n_edges_total > cap, a uniform per-edge Bernoulli subsample of ~cap
// edges is taken. Returns the number of queries written.
int gqe_all_edges_1p(
    int n_modes, const int32_t* mode_lo, const int32_t* mode_hi,
    int n_rels, const int32_t* rel_from_mode, const int32_t* rel_to_mode,
    const int32_t* rel_rev, const int64_t* indptr_off,
    const int64_t* indices_off, const int32_t* indptr_cat,
    const int32_t* indices_cat,
    int64_t cap, uint64_t seed, int max_negs,
    int32_t* out_rels,        // [cap, 3]
    int32_t* out_anchors,     // [cap, 3]
    int32_t* out_targets,     // [cap]
    int32_t* out_negs,        // [cap, max_negs]
    int32_t* out_neg_counts   // [cap]
) {
  Graph g;
  g.n_modes = n_modes; g.mode_lo = mode_lo; g.mode_hi = mode_hi;
  g.n_rels = n_rels; g.rel_from_mode = rel_from_mode;
  g.rel_to_mode = rel_to_mode; g.rel_rev = rel_rev;
  g.indptr_off = indptr_off; g.indices_off = indices_off;
  g.indices_cat = indices_cat; g.indptr_cat = indptr_cat;

  std::mt19937_64 rng(seed);
  int64_t total = 0;
  for (int r = 0; r < n_rels; ++r) total += g.rel_nnz(r);
  // keep ~cap edges: accept each with prob cap/total (clamped at the end)
  const bool subsample = total > cap;
  const double p_keep = subsample ? (double)cap / (double)total : 1.0;
  const uint64_t keep_thresh =
      (uint64_t)(p_keep * 18446744073709551615.0);

  int64_t written = 0;
  Set ans;
  for (int r = 0; r < n_rels && written < cap; ++r) {
    const int from_m = rel_from_mode[r];
    const int to_m = rel_to_mode[r];
    const int32_t lo = mode_lo[from_m], hi = mode_hi[from_m];
    const int32_t tlo = mode_lo[to_m], thi = mode_hi[to_m];
    const int64_t n_tmode = thi - tlo;
    for (int32_t s = lo; s < hi && written < cap; ++s) {
      auto [p, n] = g.neighbors(r, s);
      if (n == 0) continue;
      ans.clear();
      ans.insert(p, p + n);
      for (int e = 0; e < n && written < cap; ++e) {
        if (subsample && rng() > keep_thresh) continue;
        int count = 0;
        int32_t* negp = out_negs + written * max_negs;
        if (n_tmode <= (int64_t)n + max_negs) {
          for (int32_t c = tlo; c < thi && count < max_negs; ++c)
            if (!ans.count(c)) negp[count++] = c;
        } else {
          for (int64_t draws = 0; count < max_negs &&
               draws < 50LL * max_negs; ++draws) {
            int32_t c = tlo + (int32_t)(rng() % n_tmode);
            if (!ans.count(c)) negp[count++] = c;
          }
        }
        if (count == 0) continue;
        out_rels[written * 3] = r;
        out_rels[written * 3 + 1] = -1;
        out_rels[written * 3 + 2] = -1;
        out_anchors[written * 3] = s;
        out_anchors[written * 3 + 1] = -1;
        out_anchors[written * 3 + 2] = -1;
        out_targets[written] = p[e];
        out_neg_counts[written] = count;
        ++written;
      }
    }
  }
  return (int)written;
}

}  // extern "C"
