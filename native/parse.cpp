// Native ingestion layer: fast text -> arrays scanners.
//
// TPU-native counterpart of the reference's C++ parser (Parse.cpp:10-91):
// the reference parses MatrixMarket .mtx files into CSR and caches them as
// "parsed.txt" (header `nrow ncol nnz`, a ROW line, then one `col (re,im)`
// line per nonzero). This library does the hot byte scanning in C++ and
// hands flat arrays to Python via ctypes (mgpgcr_tpu/io/native_parse.py);
// the Python readers fall back to vectorised numpy when it isn't built.
//
// Build: make -C native        (produces libmgpgcr_io.so)

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Read a whole file into a buffer. Returns false on IO failure.
bool slurp(const char* path, std::string& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n < 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(&out[0], 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

// Advance p past separators (spaces, newlines, parens, commas).
inline const char* skip_sep(const char* p, const char* end) {
  while (p < end &&
         (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t' || *p == '(' ||
          *p == ')' || *p == ','))
    ++p;
  return p;
}

inline const char* parse_ll(const char* p, const char* end, long long* out) {
  p = skip_sep(p, end);
  char* next = nullptr;
  *out = std::strtoll(p, &next, 10);
  return next;
}

inline const char* parse_d(const char* p, const char* end, double* out) {
  p = skip_sep(p, end);
  char* next = nullptr;
  *out = std::strtod(p, &next);
  return next;
}

}  // namespace

extern "C" {

// Bumped whenever an exported signature changes; the ctypes wrapper
// (mgpgcr_tpu/io/native_parse.py) refuses mismatched builds and falls back
// to the numpy readers instead of calling with a stale ABI.
long long mgpgcr_io_abi_version() { return 2; }

// ---- reference CSR cache format ("parsed.txt", Parse.cpp:39-59) ----

// hdr_out: [nrow, ncol, nnz]. Returns 0 on success.
int parse_parsed_txt_header(const char* path, long long* hdr_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  long long a, b, c;
  int got = std::fscanf(f, "%lld %lld %lld", &a, &b, &c);
  std::fclose(f);
  if (got != 3) return 2;
  hdr_out[0] = a;
  hdr_out[1] = b;
  hdr_out[2] = c;
  return 0;
}

// Fills indptr (nrow+1), indices (nnz), data_ri (2*nnz interleaved re,im).
// The cache stores ROW[0..nrow-1]; indptr[nrow] is set to nnz. Returns 0 on
// success.
int parse_parsed_txt_fill(const char* path, long long nrow, long long nnz,
                          long long* indptr, long long* indices,
                          double* data_ri) {
  std::string buf;
  if (!slurp(path, buf)) return 1;
  const char* p = buf.data();
  const char* end = p + buf.size();

  long long hdr[3];
  for (int i = 0; i < 3; ++i) p = parse_ll(p, end, &hdr[i]);
  if (hdr[0] != nrow || hdr[2] != nnz) return 2;

  for (long long i = 0; i < nrow; ++i) p = parse_ll(p, end, &indptr[i]);
  indptr[nrow] = nnz;

  for (long long i = 0; i < nnz; ++i) {
    long long col;
    double re, im;
    p = parse_ll(p, end, &col);
    p = parse_d(p, end, &re);
    p = parse_d(p, end, &im);
    if (p > end) return 3;
    indices[i] = col;
    data_ri[2 * i] = re;
    data_ri[2 * i + 1] = im;
  }
  return 0;
}

// ---- MatrixMarket coordinate format (Parse.cpp:10-35) ----

// hdr_out: [nrow, ncol, nnz, field] with field 0=real 1=complex 2=integer
// 3=pattern; sym_out: [symmetric, hermitian, skew]. "skew-symmetric" must
// be checked before "symmetric" (strstr would match the substring) and its
// mirrored off-diagonal values are negated, not copied. Returns 0 on
// success.
int parse_mtx_header(const char* path, long long* hdr_out, long long* sym_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  char line[4096];
  long long field = 0, symmetric = 0, hermitian = 0, skew = 0;
  bool first = true;
  while (std::fgets(line, sizeof line, f)) {
    if (first && std::strncmp(line, "%%MatrixMarket", 14) == 0) {
      for (char* q = line; *q; ++q) *q = std::tolower(*q);
      if (std::strstr(line, "complex")) field = 1;
      else if (std::strstr(line, "integer")) field = 2;
      else if (std::strstr(line, "pattern")) field = 3;
      if (std::strstr(line, "skew-symmetric")) { symmetric = 1; skew = 1; }
      else if (std::strstr(line, "symmetric")) symmetric = 1;
      if (std::strstr(line, "hermitian")) { symmetric = 1; hermitian = 1; }
      first = false;
      continue;
    }
    first = false;
    const char* q = line;
    while (*q == ' ' || *q == '\t') ++q;
    if (*q == '%' || *q == '\n' || *q == '\0') continue;
    long long r, c, n;
    if (std::sscanf(q, "%lld %lld %lld", &r, &c, &n) != 3) {
      std::fclose(f);
      return 2;
    }
    hdr_out[0] = r;
    hdr_out[1] = c;
    hdr_out[2] = n;
    hdr_out[3] = field;
    sym_out[0] = symmetric;
    sym_out[1] = hermitian;
    sym_out[2] = skew;
    std::fclose(f);
    return 0;
  }
  std::fclose(f);
  return 3;
}

// Fills rows/cols (0-based) and data_ri (2*nnz). field as above.
// Returns 0 on success.
int parse_mtx_fill(const char* path, long long nnz, long long field,
                   long long* rows, long long* cols, double* data_ri) {
  std::string buf;
  if (!slurp(path, buf)) return 1;
  const char* p = buf.data();
  const char* end = p + buf.size();

  // skip comment lines and the size line
  while (p < end) {
    const char* line_start = p;
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
    const char* q = line_start;
    while (q < p && (*q == ' ' || *q == '\t')) ++q;
    if (*q == '%' || q >= p - 1) continue;
    break;  // consumed the size line
  }

  for (long long i = 0; i < nnz; ++i) {
    long long r, c;
    p = parse_ll(p, end, &r);
    p = parse_ll(p, end, &c);
    double re = 1.0, im = 0.0;
    if (field == 0 || field == 2) {
      p = parse_d(p, end, &re);
    } else if (field == 1) {
      p = parse_d(p, end, &re);
      p = parse_d(p, end, &im);
    }
    if (p > end) return 3;
    rows[i] = r - 1;
    cols[i] = c - 1;
    data_ri[2 * i] = re;
    data_ri[2 * i + 1] = im;
  }
  return 0;
}

// ---- writer for the reference cache format (Parse.cpp:42-59) ----
int write_parsed_txt_native(const char* path, long long nrow, long long ncol,
                            long long nnz, const long long* indptr,
                            const long long* indices, const double* data_ri) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  std::fprintf(f, "%lld %lld %lld\n", nrow, ncol, nnz);
  for (long long i = 0; i < nrow; ++i) std::fprintf(f, "%lld ", indptr[i]);
  std::fprintf(f, "\n");
  for (long long i = 0; i < nnz; ++i)
    std::fprintf(f, "%lld (%.17g,%.17g)\n", indices[i], data_ri[2 * i],
                 data_ri[2 * i + 1]);
  std::fclose(f);
  return 0;
}

}  // extern "C"
