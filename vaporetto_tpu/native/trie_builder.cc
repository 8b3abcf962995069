// Double-array trie builder — native host compiler.
#include <algorithm>
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
// Free slots are kept in a doubly-linked list threaded through the arrays
// (darts-clone style) so base search skips occupied regions in O(1).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct TrieNode {
  std::vector<std::pair<int32_t, int32_t>> children;  // (symbol, node id)
  int32_t value = -1;
};

struct Builder {
  std::vector<int32_t> base, check, value;
  // sorted doubly-linked free list threaded through the arrays; links are
  // only valid on FREE slots (check[i] == -1), so every walk must start
  // from `cursor`, which is maintained to always sit on a free slot
  std::vector<int64_t> next_free, prev_free;
  int64_t cap = 0;
  int64_t cursor = 1;  // earliest free slot we still care about

  void grow(int64_t need) {
    if (need <= cap) return;
    int64_t new_cap = cap ? cap : 1024;
    while (new_cap < need) new_cap *= 2;
    base.resize(new_cap, 0);
    check.resize(new_cap, -1);
    value.resize(new_cap, -1);
    next_free.resize(new_cap);
    prev_free.resize(new_cap);
    for (int64_t i = cap; i < new_cap; ++i) {
      next_free[i] = i + 1;
      prev_free[i] = i - 1;
    }
    cap = new_cap;
  }

  void occupy(int64_t pos) {
    // unlink pos from the free list (caller sets check/value)
    if (pos == cursor) cursor = next_free[pos];
    int64_t nf = next_free[pos], pf = prev_free[pos];
    if (pf >= 0) next_free[pf] = nf;
    if (nf < cap) prev_free[nf] = pf;
  }

  // first free slot >= from; walks only free-list links (valid)
  int64_t first_free(int64_t from) {
    grow(from + 1);
    while (check[cursor] != -1) {  // defensive; cursor should stay free
      cursor = next_free[cursor];
      grow(cursor + 1);
    }
    int64_t i = cursor;
    while (i < from) {
      i = next_free[i];
      grow(i + 1);
    }
    return i;
  }

  int64_t next_free_after(int64_t i) {
    int64_t j = next_free[i];
    grow(j + 1);
    return j;
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

  // ---- double-array packing (BFS) ----
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
  while (!q.empty()) {
    int32_t node = q.front();
    q.pop();
    const auto& kids = nodes[node].children;
    if (kids.empty()) continue;
    int64_t slot = slot_of[node];
    int32_t first_sym = kids[0].first;
    // anchor candidate free slots on the first child; the free list is
    // sorted and walks touch only free slots, so this is amortized linear
    int64_t cand = b.first_free(first_sym + 1);
    for (;;) {
      int64_t base_v = cand - first_sym;
      bool ok = true;
      for (const auto& kv : kids) {
        int64_t t = base_v + kv.first;
        b.grow(t + 1);
        if (b.check[t] != -1) {
          ok = false;
          break;
        }
      }
      if (ok) {
        b.base[slot] = static_cast<int32_t>(base_v);
        for (const auto& kv : kids) {
          int64_t t = base_v + kv.first;
          b.occupy(t);
          b.check[t] = static_cast<int32_t>(slot);
          b.value[t] = nodes[kv.second].value;
          slot_of[kv.second] = t;
          if (t > max_used) max_used = t;
          q.push(kv.second);
        }
        break;
      }
      cand = b.next_free_after(cand);
    }
  }

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
