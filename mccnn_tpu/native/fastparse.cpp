// Native data-path helpers (C++, ctypes ABI).
//
// The reference framework ships compiled native code for its hot paths; on
// the TPU port the device compute is Pallas, and the host-side hot path is
// the input pipeline — bulk-parsing millions of ascii float rows (ModelNet
// .txt, ShapeNet .pts/.seg) where numpy's loadtxt is 20-50x slower than a
// tight scanner. Exposed via ctypes (no pybind11 in this image).
//
// ABI:
//   long mccnn_count_floats(const char* data, long len);
//   long mccnn_parse_floats(const char* data, long len, float* out, long cap);
//   long mccnn_parse_ints  (const char* data, long len, int*   out, long cap);
//   long mccnn_count_rows  (const char* data, long len);  // non-empty lines
//
// Any of ',', ' ', '\t', '\r', '\n', ';' separates tokens. Returns number of
// values written (or needed, for count).

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

inline bool is_sep(char c) {
  return c == ',' || c == ' ' || c == '\t' || c == '\r' || c == '\n' ||
         c == ';';
}

}  // namespace

extern "C" {

long mccnn_count_floats(const char* data, long len) {
  long count = 0;
  bool in_tok = false;
  for (long i = 0; i < len; ++i) {
    bool sep = is_sep(data[i]);
    if (!sep && !in_tok) {
      ++count;
      in_tok = true;
    } else if (sep) {
      in_tok = false;
    }
  }
  return count;
}

namespace {

// Powers of ten for the fast decimal path (covers any sane point file).
const double kPow10[] = {1e0,  1e1,  1e2,  1e3,  1e4,  1e5,  1e6,  1e7,
                         1e8,  1e9,  1e10, 1e11, 1e12, 1e13, 1e14, 1e15,
                         1e16, 1e17, 1e18};

// Hand-rolled decimal float scanner — ~5x faster than strtof (no locale, no
// hex/inf/nan handling; falls back to strtof on exponents it can't take).
inline bool scan_float(const char*& p, const char* end, float* out) {
  const char* start = p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  uint64_t mant = 0;
  int digits = 0, frac = 0;
  while (p < end && *p >= '0' && *p <= '9') {
    mant = mant * 10 + uint64_t(*p - '0');
    ++digits;
    ++p;
  }
  if (p < end && *p == '.') {
    ++p;
    while (p < end && *p >= '0' && *p <= '9') {
      mant = mant * 10 + uint64_t(*p - '0');
      ++digits;
      ++frac;
      ++p;
    }
  }
  if (digits == 0) {
    p = start;
    return false;
  }
  int exp = 0;
  if (p < end && (*p == 'e' || *p == 'E')) {
    ++p;
    bool eneg = false;
    if (p < end && (*p == '-' || *p == '+')) {
      eneg = (*p == '-');
      ++p;
    }
    int ev = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      ev = ev * 10 + (*p - '0');
      ++p;
    }
    exp = eneg ? -ev : ev;
  }
  int net = exp - frac;
  if (digits > 17 || net > 18 || net < -18) {  // rare: defer to libc
    char* nxt = nullptr;
    *out = strtof(start, &nxt);
    p = nxt;
    return nxt != start;
  }
  double v = double(mant);
  v = net >= 0 ? v * kPow10[net] : v / kPow10[-net];
  *out = float(neg ? -v : v);
  return true;
}

}  // namespace

long mccnn_parse_floats(const char* data, long len, float* out, long cap) {
  long count = 0;
  const char* p = data;
  const char* end = data + len;
  while (p < end && count < cap) {
    while (p < end && is_sep(*p)) ++p;
    if (p >= end) break;
    float v;
    if (!scan_float(p, end, &v)) {  // unparsable token (e.g. header): skip
      while (p < end && !is_sep(*p)) ++p;
      continue;
    }
    out[count++] = v;
  }
  return count;
}

long mccnn_parse_ints(const char* data, long len, int* out, long cap) {
  long count = 0;
  const char* p = data;
  const char* end = data + len;
  while (p < end && count < cap) {
    while (p < end && is_sep(*p)) ++p;
    if (p >= end) break;
    char* next = nullptr;
    long v = strtol(p, &next, 10);
    if (next == p) {
      while (p < end && !is_sep(*p)) ++p;
      continue;
    }
    out[count++] = static_cast<int>(v);
    p = next;
  }
  return count;
}

long mccnn_count_rows(const char* data, long len) {
  long rows = 0;
  bool row_has_content = false;
  for (long i = 0; i < len; ++i) {
    char c = data[i];
    if (c == '\n') {
      if (row_has_content) ++rows;
      row_has_content = false;
    } else if (!is_sep(c)) {
      row_has_content = true;
    }
  }
  if (row_has_content) ++rows;
  return rows;
}

}  // extern "C"
