// Native model-compiler back end: pattern merge + suffix propagation +
// symbol projection + double-array build + fixed-8 weight packing.
//
// This is the scale path for the host "model compiler" (compile/compiler.py).
// Semantics parity (same contracts as the Python implementation, which stays
// as the fallback and as the equivalence-test oracle):
//   * PositionalWeight merge  — reference predictor.rs:149-165
//   * PositionalWeightWithTag merge (asymmetric tag_info add: the earlier
//     row's length wins) — reference predictor.rs:242-262
//   * suffix-propagating weight merger — reference char_scorer.rs:50-78
//   * fixed-8 row packing — reference predictor.rs:32-45 (WeightVector)
// The double-array build itself is delegated to vt_build_trie
// (trie_builder.cc).
#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <map>
#include <utility>
#include <vector>

extern "C" int vt_build_trie(const int32_t*, const int64_t*, int64_t, int32_t,
                             int32_t**, int32_t**, int32_t**, int32_t**,
                             int64_t*);

namespace {

struct Span {
  const int32_t* p;
  int64_t len;
};

inline bool span_less(const Span& a, const Span& b) {
  return std::lexicographical_compare(a.p, a.p + a.len, b.p, b.p + b.len);
}

inline bool span_eq(const Span& a, const Span& b) {
  return a.len == b.len && std::equal(a.p, a.p + a.len, b.p);
}

using TagKey = std::pair<int32_t, int32_t>;  // (token_id, rel_position)

// END-anchored positional weight + tag rows; int64 accumulation so overflow
// is detected at export time exactly like the Python path's pack check.
struct PW {
  bool has_w = false;
  int32_t offset = 0;
  std::vector<int64_t> w;
  std::map<TagKey, std::vector<int64_t>> tags;

  // reference predictor.rs:149-165 (boundary part) and :242-262 (tag part;
  // note the asymmetry: `self`'s weight-vector length wins on key collision
  // and extra elements of `other` are dropped, mirroring merger.py)
  void add_assign(const PW& o) {
    if (has_w && o.has_w) {
      int32_t new_offset = std::min(offset, o.offset);
      int64_t shift = offset - new_offset;
      int64_t o_shift = o.offset - new_offset;
      size_t new_size =
          std::max(shift + (int64_t)w.size(), o_shift + (int64_t)o.w.size());
      std::vector<int64_t> nw(new_size, 0);
      for (size_t i = 0; i < w.size(); ++i) nw[shift + i] = w[i];
      for (size_t i = 0; i < o.w.size(); ++i) nw[o_shift + i] += o.w[i];
      offset = new_offset;
      w.swap(nw);
    } else if (o.has_w) {
      has_w = true;
      offset = o.offset;
      w = o.w;
    }
    for (const auto& kv : o.tags) {
      auto it = tags.find(kv.first);
      if (it == tags.end()) {
        tags.emplace(kv.first, kv.second);
      } else {
        auto& mine = it->second;
        size_t n = std::min(mine.size(), kv.second.size());
        for (size_t i = 0; i < n; ++i) mine[i] += kv.second[i];
      }
    }
  }
};

template <typename T>
T* dup(const std::vector<T>& v) {
  T* p = static_cast<T*>(malloc(std::max(v.size(), size_t(1)) * sizeof(T)));
  if (p) memcpy(p, v.data(), v.size() * sizeof(T));
  return p;
}

// Shared implementation; tag inputs/outputs may be null (boundary-only).
int compile_impl(
    const int32_t* pat_syms, const int64_t* pat_offs, int64_t n_patterns,
    const int32_t* w_offset, const int32_t* w_flat, const int64_t* w_offs,
    const uint8_t* is_tag, const int32_t* tag_tok, const int32_t* tag_rel,
    int32_t project, int32_t n_symbols_in,
    int32_t** syms_out, int64_t* n_syms_out, int32_t** base_out,
    int32_t** check_out, int32_t** value_out, int32_t** inherit_out,
    int64_t* n_slots_out, int32_t** rows_first_out, int32_t** rows_cnt_out,
    int64_t* n_merged_out, int32_t** w8_out, int32_t** off_out,
    int64_t* n_rows_out, int32_t* max_chunks_out, int32_t* max_len_out,
    int32_t** tag_pat_out, int32_t** tag_tok_out, int32_t** tag_rel_out,
    int32_t** tag_wflat_out, int64_t** tag_woffs_out,
    int64_t* n_tag_entries_out) {
  // ---- sort pattern indices lexicographically; STABLE so that duplicate
  // patterns merge in input order (the tag merge is order-sensitive) ----
  std::vector<int64_t> order(n_patterns);
  for (int64_t i = 0; i < n_patterns; ++i) order[i] = i;
  auto span_of = [&](int64_t i) {
    return Span{pat_syms + pat_offs[i], pat_offs[i + 1] - pat_offs[i]};
  };
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return span_less(span_of(a), span_of(b));
  });

  // ---- merge duplicates ----
  std::vector<Span> pats;
  std::vector<PW> pws;
  pats.reserve(n_patterns);
  pws.reserve(n_patterns);
  for (int64_t k = 0; k < n_patterns; ++k) {
    int64_t i = order[k];
    Span s = span_of(i);
    PW pw;
    if (is_tag && is_tag[i]) {
      pw.tags.emplace(TagKey(tag_tok[i], tag_rel[i]),
                      std::vector<int64_t>(w_flat + w_offs[i],
                                           w_flat + w_offs[i + 1]));
    } else {
      pw.has_w = true;
      pw.offset = w_offset[i];
      pw.w.assign(w_flat + w_offs[i], w_flat + w_offs[i + 1]);
    }
    if (!pats.empty() && span_eq(pats.back(), s)) {
      pws.back().add_assign(pw);
    } else {
      pats.push_back(s);
      pws.push_back(std::move(pw));
    }
  }
  int64_t n_merged = (int64_t)pats.size();

  // ---- suffix propagation (char_scorer.rs:50-78 / merger.py merge) ----
  auto find = [&](const Span& s) -> int64_t {
    auto it = std::lower_bound(pats.begin(), pats.end(), s, span_less);
    if (it != pats.end() && span_eq(*it, s)) return it - pats.begin();
    return -1;
  };
  {
    std::vector<char> done(n_merged, 0);
    std::vector<int64_t> stack;
    for (int64_t i = 0; i < n_merged; ++i) {
      if (done[i]) continue;
      stack.clear();
      stack.push_back(i);
      Span s = pats[i];
      for (int64_t j = 1; j < s.len; ++j) {
        Span suf{s.p + j, s.len - j};
        int64_t k = find(suf);
        if (k >= 0) {
          stack.push_back(k);
          if (done[k]) break;
        }
      }
      int64_t from = stack.back();
      stack.pop_back();
      done[from] = 1;
      while (!stack.empty()) {
        int64_t to = stack.back();
        stack.pop_back();
        done[to] = 1;
        pws[to].add_assign(pws[from]);
        from = to;
      }
    }
  }

  // ---- symbol projection ----
  std::vector<int32_t> syms;
  int32_t n_symbols;
  std::vector<int32_t> proj_flat;
  std::vector<int64_t> proj_offs(n_merged + 1, 0);
  int32_t max_len = 0;
  if (project) {
    for (const auto& s : pats) syms.insert(syms.end(), s.p, s.p + s.len);
    std::sort(syms.begin(), syms.end());
    syms.erase(std::unique(syms.begin(), syms.end()), syms.end());
    n_symbols = (int32_t)syms.size();
    proj_flat.reserve(syms.capacity());
    for (int64_t i = 0; i < n_merged; ++i) {
      const Span& s = pats[i];
      if (s.len > max_len) max_len = (int32_t)s.len;
      for (int64_t j = 0; j < s.len; ++j) {
        int32_t id =
            (int32_t)(std::lower_bound(syms.begin(), syms.end(), s.p[j]) -
                      syms.begin()) +
            1;
        proj_flat.push_back(id);
      }
      proj_offs[i + 1] = (int64_t)proj_flat.size();
    }
  } else {
    n_symbols = n_symbols_in;
    syms.resize(n_symbols);
    for (int32_t i = 0; i < n_symbols; ++i) syms[i] = i + 1;
    for (int64_t i = 0; i < n_merged; ++i) {
      const Span& s = pats[i];
      if (s.len > max_len) max_len = (int32_t)s.len;
      proj_flat.insert(proj_flat.end(), s.p, s.p + s.len);
      proj_offs[i + 1] = (int64_t)proj_flat.size();
    }
  }

  // ---- double-array build ----
  if (n_merged > 0) {
    int rc = vt_build_trie(proj_flat.data(), proj_offs.data(), n_merged,
                           n_symbols, base_out, check_out, value_out,
                           inherit_out, n_slots_out);
    if (rc != 0) return 5;
  } else {
    *n_slots_out = 1;
    *base_out = static_cast<int32_t*>(calloc(1, sizeof(int32_t)));
    *check_out = static_cast<int32_t*>(malloc(sizeof(int32_t)));
    *value_out = static_cast<int32_t*>(malloc(sizeof(int32_t)));
    *inherit_out = static_cast<int32_t*>(malloc(sizeof(int32_t)));
    if (!*base_out || !*check_out || !*value_out || !*inherit_out) return 2;
    (*check_out)[0] = -1;
    (*value_out)[0] = -1;
    (*inherit_out)[0] = -1;
  }

  // ---- fixed-8 row packing (compiler.py _pack_weight_rows) ----
  std::vector<int32_t> rows_first(n_merged), rows_cnt(n_merged);
  std::vector<int32_t> w8, off_rows;
  int32_t max_chunks = 0;
  for (int64_t i = 0; i < n_merged; ++i) {
    rows_first[i] = (int32_t)(w8.size() / 8);
    const PW& pw = pws[i];
    if (pw.w.empty()) {
      rows_cnt[i] = 0;
      continue;
    }
    int64_t n_chunks = ((int64_t)pw.w.size() + 7) / 8;
    rows_cnt[i] = (int32_t)n_chunks;
    if (rows_cnt[i] > max_chunks) max_chunks = rows_cnt[i];
    for (int64_t c = 0; c < n_chunks; ++c) {
      for (int64_t j = 0; j < 8; ++j) {
        int64_t idx = c * 8 + j;
        int64_t v = idx < (int64_t)pw.w.size() ? pw.w[idx] : 0;
        if (v > INT32_MAX || v < INT32_MIN) return 3;
        w8.push_back((int32_t)v);
      }
      off_rows.push_back(pw.offset + (int32_t)(8 * c));
    }
  }
  if (w8.empty()) {
    w8.assign(8, 0);
    off_rows.assign(1, 0);
  }

  // ---- tag entry export ----
  if (tag_pat_out) {
    std::vector<int32_t> tpat, ttok, trel, twflat;
    std::vector<int64_t> twoffs(1, 0);
    for (int64_t i = 0; i < n_merged; ++i) {
      for (const auto& kv : pws[i].tags) {
        tpat.push_back((int32_t)i);
        ttok.push_back(kv.first.first);
        trel.push_back(kv.first.second);
        for (int64_t v : kv.second) {
          if (v > INT32_MAX || v < INT32_MIN) return 3;
          twflat.push_back((int32_t)v);
        }
        twoffs.push_back((int64_t)twflat.size());
      }
    }
    *tag_pat_out = dup(tpat);
    *tag_tok_out = dup(ttok);
    *tag_rel_out = dup(trel);
    *tag_wflat_out = dup(twflat);
    *tag_woffs_out = dup(twoffs);
    *n_tag_entries_out = (int64_t)tpat.size();
    if (!*tag_pat_out || !*tag_tok_out || !*tag_rel_out || !*tag_wflat_out ||
        !*tag_woffs_out)
      return 2;
  }

  *syms_out = dup(syms);
  *n_syms_out = (int64_t)syms.size();
  *rows_first_out = dup(rows_first);
  *rows_cnt_out = dup(rows_cnt);
  *n_merged_out = n_merged;
  *w8_out = dup(w8);
  *off_out = dup(off_rows);
  *n_rows_out = (int64_t)off_rows.size();
  *max_chunks_out = max_chunks;
  *max_len_out = max_len;
  if (!*syms_out || !*rows_first_out || !*rows_cnt_out || !*w8_out ||
      !*off_out)
    return 2;
  return 0;
}

}  // namespace

extern "C" {

// Boundary-only compile. Returns 0 ok, 2 malloc failure, 3 int32 weight
// overflow, 5 trie failure. All outputs are malloc'd; caller frees each
// with vt_free. If `project` != 0, raw symbols are mapped to dense ids
// 1..n by sorted order and the sorted unique raw symbols are returned in
// syms_out; otherwise symbols are used as-is (must already be
// 1..n_symbols_in) and syms_out is the identity list 1..n_symbols_in.
int vt_compile_matcher(
    const int32_t* pat_syms, const int64_t* pat_offs, int64_t n_patterns,
    const int32_t* w_offset, const int32_t* w_flat, const int64_t* w_offs,
    int32_t project, int32_t n_symbols_in,
    int32_t** syms_out, int64_t* n_syms_out, int32_t** base_out,
    int32_t** check_out, int32_t** value_out, int32_t** inherit_out,
    int64_t* n_slots_out, int32_t** rows_first_out, int32_t** rows_cnt_out,
    int64_t* n_merged_out, int32_t** w8_out, int32_t** off_out,
    int64_t* n_rows_out, int32_t* max_chunks_out, int32_t* max_len_out) {
  return compile_impl(
      pat_syms, pat_offs, n_patterns, w_offset, w_flat, w_offs, nullptr,
      nullptr, nullptr, project, n_symbols_in, syms_out, n_syms_out,
      base_out, check_out, value_out, inherit_out, n_slots_out,
      rows_first_out, rows_cnt_out, n_merged_out, w8_out, off_out,
      n_rows_out, max_chunks_out, max_len_out, nullptr, nullptr, nullptr,
      nullptr, nullptr, nullptr);
}

// Tag-aware compile: rows with is_tag[i] != 0 carry a tag weight vector for
// (tag_tok[i], tag_rel[i]) instead of a boundary weight; duplicate/suffix
// merging follows PositionalWeightWithTag semantics. Tag entries of the
// merged patterns are returned as parallel arrays (pattern id, token id,
// rel position, weights).
int vt_compile_matcher_tags(
    const int32_t* pat_syms, const int64_t* pat_offs, int64_t n_patterns,
    const int32_t* w_offset, const int32_t* w_flat, const int64_t* w_offs,
    const uint8_t* is_tag, const int32_t* tag_tok, const int32_t* tag_rel,
    int32_t project, int32_t n_symbols_in,
    int32_t** syms_out, int64_t* n_syms_out, int32_t** base_out,
    int32_t** check_out, int32_t** value_out, int32_t** inherit_out,
    int64_t* n_slots_out, int32_t** rows_first_out, int32_t** rows_cnt_out,
    int64_t* n_merged_out, int32_t** w8_out, int32_t** off_out,
    int64_t* n_rows_out, int32_t* max_chunks_out, int32_t* max_len_out,
    int32_t** tag_pat_out, int32_t** tag_tok_out, int32_t** tag_rel_out,
    int32_t** tag_wflat_out, int64_t** tag_woffs_out,
    int64_t* n_tag_entries_out) {
  return compile_impl(
      pat_syms, pat_offs, n_patterns, w_offset, w_flat, w_offs, is_tag,
      tag_tok, tag_rel, project, n_symbols_in, syms_out, n_syms_out,
      base_out, check_out, value_out, inherit_out, n_slots_out,
      rows_first_out, rows_cnt_out, n_merged_out, w8_out, off_out,
      n_rows_out, max_chunks_out, max_len_out, tag_pat_out, tag_tok_out,
      tag_rel_out, tag_wflat_out, tag_woffs_out, n_tag_entries_out);
}

}  // extern "C"
