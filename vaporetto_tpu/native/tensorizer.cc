// Batch UTF-8 tensorizer — native data loader.
//
// Decodes a batch of UTF-8 lines into padded (B, L) int32 codepoint and
// uint8 char-type arrays in one pass (the host-side input pipeline feeding
// the device). Char-type classification matches the reference Unicode
// ranges (sentence.rs:50-67) exactly.

#include <cstdint>
#include <cstring>

namespace {

inline uint8_t char_type(uint32_t c) {
  if ((c >= 0x30 && c <= 0x39) || (c >= 0xFF10 && c <= 0xFF19)) return 1;
  if ((c >= 0x41 && c <= 0x5A) || (c >= 0x61 && c <= 0x7A) ||
      (c >= 0xFF21 && c <= 0xFF3A) || (c >= 0xFF41 && c <= 0xFF5A))
    return 2;
  if (c >= 0x3040 && c <= 0x3096) return 3;
  if ((c >= 0x30A0 && c <= 0x30FA) || (c >= 0x30FC && c <= 0x30FF) ||
      (c >= 0xFF66 && c <= 0xFF9F))
    return 4;
  if ((c >= 0x3400 && c <= 0x4DBF) || (c >= 0x4E00 && c <= 0x9FFF) ||
      (c >= 0xF900 && c <= 0xFAFF) || (c >= 0x20000 && c <= 0x2A6DF) ||
      (c >= 0x2A700 && c <= 0x2B73F) || (c >= 0x2B740 && c <= 0x2B81F) ||
      (c >= 0x2B820 && c <= 0x2CEAF) || (c >= 0x2F800 && c <= 0x2FA1F))
    return 5;
  return 6;
}

}  // namespace

extern "C" {

// Decode n_lines UTF-8 lines (byte ranges given by line_offsets, length
// n_lines+1) into row-major (n_lines, L) codepoints (int32, 0-padded) and
// char types (uint8, 0-padded); lengths receives the char count per line
// (clipped at L). Returns 0 on success, 1 on invalid UTF-8.
int vt_tensorize(const uint8_t* utf8, const int64_t* line_offsets,
                 int64_t n_lines, int32_t L, int32_t* cps, uint8_t* types,
                 int32_t* lengths) {
  for (int64_t row = 0; row < n_lines; ++row) {
    const uint8_t* p = utf8 + line_offsets[row];
    const uint8_t* end = utf8 + line_offsets[row + 1];
    int32_t* cp_row = cps + row * L;
    uint8_t* ty_row = types + row * L;
    int32_t n = 0;
    while (p < end) {
      uint32_t c;
      uint8_t b0 = *p;
      if (b0 < 0x80) {
        c = b0;
        p += 1;
      } else if ((b0 >> 5) == 0x6) {
        if (end - p < 2) return 1;
        c = ((b0 & 0x1F) << 6) | (p[1] & 0x3F);
        p += 2;
      } else if ((b0 >> 4) == 0xE) {
        if (end - p < 3) return 1;
        c = ((b0 & 0x0F) << 12) | ((p[1] & 0x3F) << 6) | (p[2] & 0x3F);
        p += 3;
      } else if ((b0 >> 3) == 0x1E) {
        if (end - p < 4) return 1;
        c = ((b0 & 0x07) << 18) | ((p[1] & 0x3F) << 12) |
            ((p[2] & 0x3F) << 6) | (p[3] & 0x3F);
        p += 4;
      } else {
        return 1;
      }
      if (n < L) {
        cp_row[n] = static_cast<int32_t>(c);
        ty_row[n] = char_type(c);
      }
      ++n;
    }
    lengths[row] = n < L ? n : L;
  }
  return 0;
}

}  // extern "C"
