// Double-array trie builder — native host compiler.
//
// The perf-critical "automaton build" role that the reference delegates to
// the daachorse crate (char_scorer/boundary_scorer.rs:82-87) is played here
// by a C++ double-array builder: production dictionaries (10^5..10^6
// patterns) pack in well under a second, where the Python fallback in
// compile/trie.py takes minutes.
//
// Layout contract (shared with compile/trie.py):
//   base[s] + sym -> child slot t, valid iff check[t] == s
//   value[t] = pattern id terminating at t, else -1
//   root = slot 0 (check[0] = 0), symbols are 1..=n_symbols, 0 = OOV.
//
// Packing strategy (darts-clone style): candidate anchor slots are taken
// from a doubly-linked free list; placement fitness is tested against an
// occupancy BITMAP (a handful of word ops per candidate instead of one
// gather per child), and 256-slot blocks that keep failing get CLOSED —
// their free slots are unlinked from the anchor list (they can still be
// occupied as non-anchor children) so the search never re-probes a
// hopelessly fragmented region. This keeps the build near-linear: 500k
// patterns pack in well under a second.
#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <vector>

namespace {

constexpr int kBlockBits = 8;  // 256 slots per block
constexpr int32_t kMaxProbesPerBlock = 4096;

struct TrieNode {
  std::vector<std::pair<int32_t, int32_t>> children;  // (symbol, node id)
  int32_t value = -1;
};

struct Builder {
  std::vector<int32_t> base, check, value;
  std::vector<uint64_t> occ;       // occupancy bitmap (1 = occupied)
  std::vector<int64_t> next_free, prev_free;  // links valid iff linked[i]
  std::vector<uint8_t> linked;
  std::vector<int32_t> block_probes;
  int64_t cap = 0;
  int64_t head = 0;  // first linked free slot

  void grow(int64_t need) {
    if (need <= cap) return;
    int64_t new_cap = cap ? cap : 1024;
    while (new_cap < need) new_cap *= 2;
    base.resize(new_cap, 0);
    check.resize(new_cap, -1);
    value.resize(new_cap, -1);
    occ.resize((new_cap + 63) / 64, 0);
    next_free.resize(new_cap);
    prev_free.resize(new_cap);
    linked.resize(new_cap, 1);
    block_probes.resize((new_cap >> kBlockBits) + 1, 0);
    for (int64_t i = cap; i < new_cap; ++i) {
      next_free[i] = i + 1;
      prev_free[i] = i - 1;
    }
    // bridge the old tail to the new region: find the previous last linked
    // slot is unnecessary — the list is threaded by construction and only
    // unlink() removes slots, so links at the boundary are already correct.
    cap = new_cap;
  }

  bool occupied(int64_t i) const {
    return (occ[i >> 6] >> (i & 63)) & 1;
  }

  void unlink(int64_t pos) {
    if (!linked[pos]) return;
    linked[pos] = 0;
    int64_t nf = next_free[pos], pf = prev_free[pos];
    if (pos == head) head = nf;
    if (pf >= 0) next_free[pf] = nf;
    if (nf < cap) prev_free[nf] = pf;
  }

  void occupy(int64_t pos) {
    occ[pos >> 6] |= uint64_t(1) << (pos & 63);
    unlink(pos);
  }

  // next_free pointers of UNLINKED slots are stale but always point
  // forward, so traversal skips them; this also papers over the one stale
  // prev pointer grow() can introduce at the old-capacity boundary.
  int64_t skip_unlinked(int64_t i) {
    grow(i + 1);
    while (!linked[i]) {
      i = next_free[i];
      grow(i + 1);
    }
    return i;
  }

  // first linked free slot >= from
  int64_t first_linked(int64_t from) {
    grow(from + 1);
    int64_t i = skip_unlinked(head);
    while (i < from) {
      i = skip_unlinked(next_free[i]);
    }
    return i;
  }

  int64_t next_linked(int64_t i) { return skip_unlinked(next_free[i]); }

  // test whether all bits mask[k] (anchored at slot `at`) are free
  bool fits(int64_t at, const std::vector<uint64_t>& mask, int64_t n_words) {
    grow(at + (n_words << 6) + 64);
    int64_t w = at >> 6;
    int sh = at & 63;
    for (int64_t k = 0; k < n_words; ++k) {
      uint64_t window = occ[w + k] >> sh;
      if (sh) window |= occ[w + k + 1] << (64 - sh);
      if (window & mask[k]) return false;
    }
    return true;
  }

  // a probe in pos's block failed; close the block when over budget
  void note_probe(int64_t pos) {
    int64_t b = pos >> kBlockBits;
    if (++block_probes[b] == kMaxProbesPerBlock) {
      int64_t lo = b << kBlockBits;
      int64_t hi = std::min(lo + (int64_t(1) << kBlockBits), cap);
      for (int64_t i = lo; i < hi; ++i) {
        if (linked[i]) unlink(i);
      }
    }
  }
};

}  // namespace

extern "C" {

// Returns 0 on success. Outputs are malloc'd; caller frees with vt_free.
// `inherit` is the Aho-Corasick output link resolved to a pattern id: for a
// node with string s, the id of the longest pattern that is a suffix of s
// (or -1). The device matcher gathers it once per position instead of
// per-window-length, shortening the dependent-gather chain.
int vt_build_trie(const int32_t* pattern_data, const int64_t* pattern_offsets,
                  int64_t n_patterns, int32_t n_symbols, int32_t** base_out,
                  int32_t** check_out, int32_t** value_out,
                  int32_t** inherit_out, int64_t* n_slots_out) {
  const bool debug_timing = getenv("VAPORETTO_TPU_TRIE_TIMING") != nullptr;
  auto tick = std::chrono::steady_clock::now();
  auto lap = [&](const char* name) {
    if (!debug_timing) return;
    auto now = std::chrono::steady_clock::now();
    fprintf(stderr, "[trie] %s: %.3fs\n", name,
            std::chrono::duration<double>(now - tick).count());
    tick = now;
  };
  // ---- plain trie ----
  std::vector<TrieNode> nodes(1);
  for (int64_t p = 0; p < n_patterns; ++p) {
    int32_t cur = 0;
    for (int64_t i = pattern_offsets[p]; i < pattern_offsets[p + 1]; ++i) {
      int32_t sym = pattern_data[i];
      if (sym < 1 || sym > n_symbols) return 1;
      auto& ch = nodes[cur].children;
      int32_t nxt = -1;
      for (auto& kv : ch) {
        if (kv.first == sym) {
          nxt = kv.second;
          break;
        }
      }
      if (nxt < 0) {
        nxt = static_cast<int32_t>(nodes.size());
        nodes.emplace_back();
        nodes[cur].children.emplace_back(sym, nxt);
      }
      cur = nxt;
    }
    nodes[cur].value = static_cast<int32_t>(p);
  }
  for (auto& n : nodes) {
    std::sort(n.children.begin(), n.children.end());
  }
  lap("plain trie");

  // ---- failure links + inherited outputs (BFS) ----
  std::vector<int32_t> fail(nodes.size(), 0);
  std::vector<int32_t> node_inherit(nodes.size(), -1);
  {
    std::queue<int32_t> bq;
    node_inherit[0] = -1;
    for (const auto& kv : nodes[0].children) {
      fail[kv.second] = 0;
      node_inherit[kv.second] = nodes[kv.second].value;
      bq.push(kv.second);
    }
    while (!bq.empty()) {
      int32_t u = bq.front();
      bq.pop();
      for (const auto& kv : nodes[u].children) {
        int32_t a = kv.first, v = kv.second;
        int32_t f = fail[u];
        for (;;) {
          int32_t nxt = -1;
          for (const auto& fkv : nodes[f].children) {
            if (fkv.first == a) {
              nxt = fkv.second;
              break;
            }
          }
          if (nxt >= 0 && nxt != v) {
            fail[v] = nxt;
            break;
          }
          if (f == 0) {
            fail[v] = 0;
            break;
          }
          f = fail[f];
        }
        node_inherit[v] = nodes[v].value >= 0 ? nodes[v].value
                                              : node_inherit[fail[v]];
        bq.push(v);
      }
    }
  }

  lap("fail links");

  // ---- double-array packing (BFS, bitmap fit tests, block closing) ----
  Builder b;
  b.grow(static_cast<int64_t>(nodes.size()) * 2 + n_symbols + 2);
  b.check[0] = 0;  // root occupies slot 0
  b.value[0] = nodes[0].value;
  b.occupy(0);

  std::vector<int64_t> slot_of(nodes.size(), -1);
  slot_of[0] = 0;
  std::queue<int32_t> q;
  q.push(0);
  int64_t max_used = 0;
  std::vector<uint64_t> mask;
  while (!q.empty()) {
    int32_t node = q.front();
    q.pop();
    const auto& kids = nodes[node].children;
    if (kids.empty()) continue;
    int64_t slot = slot_of[node];
    int32_t first_sym = kids[0].first;
    int32_t span = kids.back().first - first_sym;  // >= 0
    int64_t n_words = (span >> 6) + 1;
    mask.assign(n_words, 0);
    for (const auto& kv : kids) {
      int32_t rel = kv.first - first_sym;
      mask[rel >> 6] |= uint64_t(1) << (rel & 63);
    }
    // anchor candidates on the first child; enumerate linked free slots
    int64_t cand = b.first_linked(first_sym + 1);
    for (;;) {
      if (b.fits(cand, mask, n_words)) break;
      int64_t nxt = b.next_linked(cand);
      b.note_probe(cand);
      cand = nxt;
    }
    int64_t base_v = cand - first_sym;
    b.base[slot] = static_cast<int32_t>(base_v);
    for (const auto& kv : kids) {
      int64_t t = base_v + kv.first;
      b.grow(t + 1);
      b.occupy(t);
      b.check[t] = static_cast<int32_t>(slot);
      b.value[t] = nodes[kv.second].value;
      slot_of[kv.second] = t;
      if (t > max_used) max_used = t;
      q.push(kv.second);
    }
  }

  lap("packing");
  int64_t n_slots = max_used + n_symbols + 2;
  b.grow(n_slots);
  *base_out = static_cast<int32_t*>(malloc(n_slots * sizeof(int32_t)));
  *check_out = static_cast<int32_t*>(malloc(n_slots * sizeof(int32_t)));
  *value_out = static_cast<int32_t*>(malloc(n_slots * sizeof(int32_t)));
  *inherit_out = static_cast<int32_t*>(malloc(n_slots * sizeof(int32_t)));
  if (!*base_out || !*check_out || !*value_out || !*inherit_out) return 2;
  memcpy(*base_out, b.base.data(), n_slots * sizeof(int32_t));
  memcpy(*check_out, b.check.data(), n_slots * sizeof(int32_t));
  memcpy(*value_out, b.value.data(), n_slots * sizeof(int32_t));
  for (int64_t i = 0; i < n_slots; ++i) (*inherit_out)[i] = -1;
  for (size_t node = 0; node < nodes.size(); ++node) {
    int64_t slot = slot_of[node];
    if (slot >= 0) (*inherit_out)[slot] = node_inherit[node];
  }
  *n_slots_out = n_slots;
  return 0;
}

void vt_free(void* p) { free(p); }

}  // extern "C"
