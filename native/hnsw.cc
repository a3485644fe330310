// Native HNSW graph builder for nann_tpu.
//
// Replaces the reference's offline faiss IndexHNSWFlat build
// (NANN_impls/nann/delivery/build_hnsw_index.py:33-67) with a from-scratch
// C++ implementation of the HNSW construction algorithm (Malkov & Yashunin,
// faiss-compatible parameterisation): exponential level assignment with
// mult = 1/ln(M), ef_construction candidate search per layer, heuristic
// neighbor selection with shrink, 2M neighbors at the ground level and M at
// upper levels, bidirectional links with pruning.
//
// Exposed as a C API consumed from Python via ctypes
// (nann_tpu/index/hnsw_build.py). Index build is an offline CPU job; search
// happens on TPU from the exported CSR arrays, so this file contains no
// query-time code.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct HnswGraph {
  int64_t n = 0;
  int d = 0;
  int M = 0;
  int ef_construction = 200;
  const float* data = nullptr;  // borrowed [n, d]
  std::vector<int> levels;      // level count per node (>=1); node max level = levels[i]-1
  // neighbors[level][node] = vector of neighbor ids
  std::vector<std::vector<std::vector<int32_t>>> neighbors;
  int entry_point = -1;
  int max_level = -1;
  std::vector<std::mutex> locks;

  int nb_neighbors(int level) const { return level == 0 ? 2 * M : M; }

  float dist(int64_t a, int64_t b) const {
    const float* pa = data + a * d;
    const float* pb = data + b * d;
    float s = 0.f;
    for (int i = 0; i < d; ++i) {
      float t = pa[i] - pb[i];
      s += t * t;
    }
    return s;
  }
};

using DistNode = std::pair<float, int>;  // (distance, node)

// Snapshot a node's neighbor list under its lock. Concurrent inserts mutate
// neighbor vectors (push_back can reallocate), so unlocked iteration is UB.
void copy_neighbors(HnswGraph& g, int level, int node,
                    std::vector<int32_t>* out) {
  std::lock_guard<std::mutex> lk(g.locks[node]);
  *out = g.neighbors[level][node];
}

// Greedy descent on one level: move to the closest neighbor until no
// improvement.
int greedy_closest(HnswGraph& g, int level, int ep, int64_t q,
                   float* ep_dist_io) {
  int cur = ep;
  float cur_d = *ep_dist_io;
  std::vector<int32_t> nbrs;
  bool improved = true;
  while (improved) {
    improved = false;
    copy_neighbors(g, level, cur, &nbrs);
    for (int32_t nb : nbrs) {
      float dn = g.dist(q, nb);
      if (dn < cur_d) {
        cur_d = dn;
        cur = nb;
        improved = true;
      }
    }
  }
  *ep_dist_io = cur_d;
  return cur;
}

// Beam search on one level returning up to ef closest (max-heap by distance).
std::vector<DistNode> search_layer(HnswGraph& g, int level, int ep,
                                   float ep_dist, int64_t q, int ef,
                                   std::vector<uint8_t>& visited,
                                   std::vector<int>& touched) {
  std::priority_queue<DistNode, std::vector<DistNode>, std::greater<>> cand;
  std::priority_queue<DistNode> result;  // max-heap: top = worst kept
  cand.emplace(ep_dist, ep);
  result.emplace(ep_dist, ep);
  visited[ep] = 1;
  touched.push_back(ep);

  std::vector<int32_t> nbrs;
  while (!cand.empty()) {
    auto [dc, c] = cand.top();
    if (dc > result.top().first && (int)result.size() >= ef) break;
    cand.pop();
    copy_neighbors(g, level, c, &nbrs);
    for (int32_t nb : nbrs) {
      if (visited[nb]) continue;
      visited[nb] = 1;
      touched.push_back(nb);
      float dn = g.dist(q, nb);
      if ((int)result.size() < ef || dn < result.top().first) {
        cand.emplace(dn, nb);
        result.emplace(dn, nb);
        if ((int)result.size() > ef) result.pop();
      }
    }
  }
  std::vector<DistNode> out;
  out.reserve(result.size());
  while (!result.empty()) {
    out.push_back(result.top());
    result.pop();
  }
  std::reverse(out.begin(), out.end());  // ascending by distance
  return out;
}

// Heuristic neighbor selection with shrink (keep c only if it is closer to q
// than to every already-kept neighbor) — the diversity heuristic faiss uses.
void select_neighbors(const HnswGraph& g, int64_t q,
                      std::vector<DistNode>& cand /*ascending*/, int m,
                      std::vector<int32_t>* out) {
  out->clear();
  for (const auto& [dc, c] : cand) {
    if ((int)out->size() >= m) break;
    bool keep = true;
    for (int32_t kept : *out) {
      if (g.dist(c, kept) < dc) {
        keep = false;
        break;
      }
    }
    if (keep) out->push_back(c);
  }
  // backfill with skipped candidates if the heuristic kept too few
  if ((int)out->size() < m) {
    for (const auto& [dc, c] : cand) {
      if ((int)out->size() >= m) break;
      if (std::find(out->begin(), out->end(), c) == out->end())
        out->push_back(c);
    }
  }
}

// Prune an over-full neighbor list back to capacity with the same heuristic.
void shrink_neighbor_list(HnswGraph& g, int node, int level) {
  auto& lst = g.neighbors[level][node];
  int cap = g.nb_neighbors(level);
  if ((int)lst.size() <= cap) return;
  std::vector<DistNode> cand;
  cand.reserve(lst.size());
  for (int32_t nb : lst) cand.emplace_back(g.dist(node, nb), nb);
  std::sort(cand.begin(), cand.end());
  std::vector<int32_t> kept;
  select_neighbors(g, node, cand, cap, &kept);
  lst = std::move(kept);
}

void insert_node(HnswGraph& g, int i, std::vector<uint8_t>& visited,
                 std::vector<int>& touched) {
  int node_level = g.levels[i] - 1;
  int ep = g.entry_point;
  if (ep < 0) return;  // first node handled by caller

  float ep_dist = g.dist(i, ep);
  // descend levels above the node's top level greedily
  for (int l = g.max_level; l > node_level; --l)
    ep = greedy_closest(g, l, ep, i, &ep_dist);

  std::vector<int32_t> selected;
  for (int l = std::min(node_level, g.max_level); l >= 0; --l) {
    auto cand = search_layer(g, l, ep, ep_dist, i, g.ef_construction, visited,
                             touched);
    for (int t : touched) visited[t] = 0;
    touched.clear();

    select_neighbors(g, i, cand, g.nb_neighbors(l), &selected);
    {
      std::lock_guard<std::mutex> lk(g.locks[i]);
      g.neighbors[l][i] = selected;
    }
    for (int32_t nb : selected) {
      std::lock_guard<std::mutex> lk(g.locks[nb]);
      g.neighbors[l][nb].push_back(i);
      shrink_neighbor_list(g, nb, l);
    }
    ep = cand.front().second;
    ep_dist = cand.front().first;
  }
}

// build progress observable from the host while nann_hnsw_build blocks
// (the Python wrapper's heartbeat thread polls nann_hnsw_progress so long
// builds report a fraction, not just an elapsed time)
std::atomic<int64_t> g_progress_done(0);
std::atomic<int64_t> g_progress_total(0);

}  // namespace

extern "C" {

// Nodes inserted / total of the build currently running (0/0 when idle).
void nann_hnsw_progress(int64_t* done, int64_t* total) {
  *done = g_progress_done.load(std::memory_order_relaxed);
  *total = g_progress_total.load(std::memory_order_relaxed);
}

// Builds the HNSW graph. Returns an opaque handle (0 on failure).
// data: [n, d] float32 row-major; borrowed for the duration of the call only.
void* nann_hnsw_build(const float* data, int64_t n, int d, int M,
                      int ef_construction, uint64_t seed, int num_threads) {
  auto* g = new HnswGraph();
  g->n = n;
  g->d = d;
  g->M = M;
  g->ef_construction = ef_construction;
  g->data = data;
  g->levels.resize(n);

  // exponential level assignment, mult = 1/ln(M)
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> unif(0.0, 1.0);
  double mult = 1.0 / std::log((double)M);
  int max_level = 0;
  for (int64_t i = 0; i < n; ++i) {
    double u = unif(rng);
    int lvl = (int)std::floor(-std::log(u + 1e-300) * mult);
    if (lvl > 16) lvl = 16;
    g->levels[i] = lvl + 1;
    if (lvl > max_level) max_level = lvl;
  }
  g->neighbors.resize(max_level + 1);
  for (int l = 0; l <= max_level; ++l) g->neighbors[l].resize(n);
  std::vector<std::mutex> lk(n);
  g->locks.swap(lk);

  // insert order: by descending level first improves upper-graph quality and
  // lets entry point be fixed before parallel section
  std::vector<int> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = (int)i;
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return g->levels[a] > g->levels[b];
  });

  g->entry_point = order[0];
  g->max_level = g->levels[order[0]] - 1;

  if (num_threads <= 0) num_threads = 1;
  g_progress_total.store(n, std::memory_order_relaxed);
  g_progress_done.store(1, std::memory_order_relaxed);  // entry point
  std::atomic<int64_t> next(1);
  auto worker = [&]() {
    std::vector<uint8_t> visited(n, 0);
    std::vector<int> touched;
    touched.reserve(4096);
    while (true) {
      int64_t k = next.fetch_add(1);
      if (k >= n) break;
      insert_node(*g, order[k], visited, touched);
      g_progress_done.fetch_add(1, std::memory_order_relaxed);
    }
  };
  if (num_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  g->data = nullptr;  // borrowed pointer ends here
  // restore the "0/0 when idle" contract: without this, a heartbeat polling
  // between builds reports the PREVIOUS build's final fraction as live
  // progress (round-4 advisor)
  g_progress_done.store(0, std::memory_order_relaxed);
  g_progress_total.store(0, std::memory_order_relaxed);
  return g;
}

int nann_hnsw_max_level(void* handle) {
  return static_cast<HnswGraph*>(handle)->max_level;
}

// levels[i] = node's top level (0-based), like faiss hnsw.levels - 1.
void nann_hnsw_levels(void* handle, int32_t* out) {
  auto* g = static_cast<HnswGraph*>(handle);
  for (int64_t i = 0; i < g->n; ++i) out[i] = g->levels[i] - 1;
}

// Total number of neighbor entries at `level` (size of the CSR values array).
int64_t nann_hnsw_level_nnz(void* handle, int level) {
  auto* g = static_cast<HnswGraph*>(handle);
  if (level > g->max_level) return 0;
  int64_t s = 0;
  for (auto& v : g->neighbors[level]) s += (int64_t)v.size();
  return s;
}

// Writes the CSR arrays for `level`: values [nnz] int32, row_splits [n+1] int64.
void nann_hnsw_level_csr(void* handle, int level, int32_t* values,
                         int64_t* row_splits) {
  auto* g = static_cast<HnswGraph*>(handle);
  int64_t off = 0;
  row_splits[0] = 0;
  for (int64_t i = 0; i < g->n; ++i) {
    if (level <= g->max_level) {
      const auto& nb = g->neighbors[level][i];
      std::memcpy(values + off, nb.data(), nb.size() * sizeof(int32_t));
      off += (int64_t)nb.size();
    }
    row_splits[i + 1] = off;
  }
}

void nann_hnsw_free(void* handle) { delete static_cast<HnswGraph*>(handle); }

}  // extern "C"
