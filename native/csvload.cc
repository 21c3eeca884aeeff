// Fast CSV-of-floats parser for the gpr_tpu data-loading path.
//
// Native equivalent of the reference CLI's line-by-line OCaml reader
// (bin/ocaml_gpr.ml:149-172): comma-separated doubles, one sample per line,
// all rows the same width.  Exposed as a C ABI consumed via ctypes
// (gpr_tpu/io/native.py); two entry points parse either a whole in-memory
// buffer (the CLI's stdin capture) or a file.
//
// Build: g++ -O3 -march=native -shared -fPIC csvload.cc -o libcsvload.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Parse one buffer of text.  Returns 0 on success; on failure returns a
// negative code and writes the offending 1-based line into *err_line.
//   -1  inconsistent column count
//   -2  conversion failure
//   -3  out of memory / io
int parse(const char* buf, int64_t len, double** out, int64_t* rows,
          int64_t* cols, int64_t* err_line) {
  std::vector<double> data;
  data.reserve(1 << 16);
  int64_t ncols = -1;
  int64_t line = 0;
  const char* p = buf;
  const char* end = buf + len;
  while (p < end) {
    // find line end
    const char* eol = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* line_end = eol ? eol : end;
    ++line;
    // skip blank lines (possibly with \r)
    const char* q = p;
    while (q < line_end && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
    if (q == line_end) {
      p = eol ? eol + 1 : end;
      continue;
    }
    int64_t c = 0;
    while (q < line_end) {
      char* next = nullptr;
      double v = strtod(q, &next);
      if (next == q) {
        *err_line = line;
        return -2;
      }
      data.push_back(v);
      ++c;
      q = next;
      while (q < line_end && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
      if (q < line_end) {
        if (*q != ',') {
          *err_line = line;
          return -2;
        }
        ++q;  // past comma
        while (q < line_end && (*q == ' ' || *q == '\t')) ++q;
      }
    }
    if (ncols < 0) {
      ncols = c;
    } else if (c != ncols) {
      *err_line = line;
      return -1;
    }
    p = eol ? eol + 1 : end;
  }
  if (ncols <= 0) {
    *err_line = 0;
    return -2;  // no data
  }
  int64_t nrows = static_cast<int64_t>(data.size()) / ncols;
  double* mem = static_cast<double*>(malloc(data.size() * sizeof(double)));
  if (!mem) return -3;
  memcpy(mem, data.data(), data.size() * sizeof(double));
  *out = mem;
  *rows = nrows;
  *cols = ncols;
  return 0;
}

}  // namespace

extern "C" {

int csv_parse_buffer(const char* buf, int64_t len, double** out, int64_t* rows,
                     int64_t* cols, int64_t* err_line) {
  return parse(buf, len, out, rows, cols, err_line);
}

int csv_load_file(const char* path, double** out, int64_t* rows, int64_t* cols,
                  int64_t* err_line) {
  FILE* f = fopen(path, "rb");
  if (!f) return -3;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* buf = static_cast<char*>(malloc(sz));
  if (!buf) {
    fclose(f);
    return -3;
  }
  size_t got = fread(buf, 1, sz, f);
  fclose(f);
  int rc = parse(buf, static_cast<int64_t>(got), out, rows, cols, err_line);
  free(buf);
  return rc;
}

void csv_free(double* ptr) { free(ptr); }

}  // extern "C"
