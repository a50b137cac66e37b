// Native Criteo TSV parser — the DQRM-TPU framework's host-side native
// component, replacing the reference's Cython-compiled copy of data_utils.py
// (reference: cython/cython_compile.py:14-26, cython/cython_criteo.py).
//
// Parses raw Criteo rows ("label \t 13 ints \t 26 hex cats") into
// int32 labels, int32[13] dense, int64[26] raw categorical values, at
// memchr/strtol speed with no Python-object overhead. Dictionary building
// stays in Python (needs global state across days); hashing-based pipelines
// can use parse_file + `% max_ind_range` directly.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// Parse a decimal int field [p, end); empty -> 0. Criteo dense features can
// be negative (documented down to -3).
inline int32_t parse_dec(const char* p, const char* end) {
  if (p >= end) return 0;
  bool neg = false;
  if (*p == '-') {
    neg = true;
    ++p;
  }
  int32_t v = 0;
  while (p < end) {
    v = v * 10 + (*p - '0');
    ++p;
  }
  return neg ? -v : v;
}

// Parse a hex field [p, end); empty -> 0.
inline int64_t parse_hex(const char* p, const char* end) {
  uint64_t v = 0;
  while (p < end) {
    char c = *p++;
    uint64_t d;
    if (c >= '0' && c <= '9')
      d = c - '0';
    else if (c >= 'a' && c <= 'f')
      d = c - 'a' + 10;
    else if (c >= 'A' && c <= 'F')
      d = c - 'A' + 10;
    else
      continue;  // tolerate stray chars
    v = (v << 4) | d;
  }
  return static_cast<int64_t>(v);
}

}  // namespace

extern "C" {

// Parse `n_bytes` of raw TSV text holding up to `max_rows` lines.
// Outputs: y[max_rows], x_int[max_rows*13], x_cat[max_rows*26].
// Returns number of rows parsed.
int64_t criteo_parse_buffer(const char* buf, int64_t n_bytes, int64_t max_rows,
                            int32_t* y, int32_t* x_int, int64_t* x_cat) {
  const char* p = buf;
  const char* bend = buf + n_bytes;
  int64_t row = 0;
  while (p < bend && row < max_rows) {
    const char* line_end =
        static_cast<const char*>(memchr(p, '\n', bend - p));
    if (!line_end) line_end = bend;
    // field 0: label
    const char* f = p;
    const char* tab =
        static_cast<const char*>(memchr(f, '\t', line_end - f));
    const char* fe = tab ? tab : line_end;
    y[row] = parse_dec(f, fe);
    f = fe < line_end ? fe + 1 : line_end;
    // fields 1..13: dense ints
    for (int j = 0; j < 13; ++j) {
      tab = static_cast<const char*>(memchr(f, '\t', line_end - f));
      fe = tab ? tab : line_end;
      x_int[row * 13 + j] = parse_dec(f, fe);
      f = fe < line_end ? fe + 1 : line_end;
    }
    // fields 14..39: hex categorical
    for (int j = 0; j < 26; ++j) {
      tab = static_cast<const char*>(memchr(f, '\t', line_end - f));
      fe = tab ? tab : line_end;
      x_cat[row * 26 + j] = parse_hex(f, fe);
      f = fe < line_end ? fe + 1 : line_end;
    }
    ++row;
    p = line_end + 1;
  }
  return row;
}

// Convenience: parse a whole file (streamed in 64 MB chunks aligned to
// line boundaries). Returns rows parsed, or -1 on IO error.
int64_t criteo_parse_file(const char* path, int64_t max_rows, int32_t* y,
                          int32_t* x_int, int64_t* x_cat) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  const size_t CHUNK = 64u << 20;
  char* buf = static_cast<char*>(malloc(CHUNK + 1));
  if (!buf) {
    fclose(fp);
    return -1;
  }
  int64_t rows = 0;
  size_t carry = 0;
  while (rows < max_rows) {
    size_t got = fread(buf + carry, 1, CHUNK - carry, fp);
    size_t avail = carry + got;
    if (avail == 0) break;
    size_t use = avail;
    if (got > 0 && !feof(fp)) {
      // trim to the last complete line; carry the tail over
      while (use > 0 && buf[use - 1] != '\n') --use;
      if (use == 0) use = avail;  // pathological long line
    }
    int64_t r = criteo_parse_buffer(buf, use, max_rows - rows, y + rows,
                                    x_int + rows * 13, x_cat + rows * 26);
    rows += r;
    carry = avail - use;
    if (carry) memmove(buf, buf + use, carry);
    if (got == 0) break;
  }
  free(buf);
  fclose(fp);
  return rows;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Categorical dictionary build (int64 raw value -> dense int32 id), the
// preprocessing bottleneck the reference pays in per-row Python dict loops
// (data_utils.py:967-1080). Open-addressing hash tables, ids assigned in
// first-appearance order (identical semantics to the Python dict build).
// ---------------------------------------------------------------------------

namespace {

struct Dict64 {
  int64_t* keys = nullptr;
  int32_t* vals = nullptr;
  uint8_t* used = nullptr;
  size_t cap = 0;
  size_t n = 0;

  void init(size_t c) {
    cap = c;
    keys = static_cast<int64_t*>(malloc(cap * sizeof(int64_t)));
    vals = static_cast<int32_t*>(malloc(cap * sizeof(int32_t)));
    used = static_cast<uint8_t*>(calloc(cap, 1));
  }
  void destroy() {
    free(keys);
    free(vals);
    free(used);
  }
  static inline uint64_t hash(uint64_t x) {
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33;
    x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return x;
  }
  void grow() {
    Dict64 bigger;
    bigger.init(cap * 2);
    for (size_t i = 0; i < cap; ++i) {
      if (!used[i]) continue;
      size_t j = hash(static_cast<uint64_t>(keys[i])) & (bigger.cap - 1);
      while (bigger.used[j]) j = (j + 1) & (bigger.cap - 1);
      bigger.used[j] = 1;
      bigger.keys[j] = keys[i];
      bigger.vals[j] = vals[i];
    }
    bigger.n = n;
    destroy();
    *this = bigger;
  }
  inline int32_t get_or_insert(int64_t key) {
    if (n * 10 >= cap * 7) grow();
    size_t j = hash(static_cast<uint64_t>(key)) & (cap - 1);
    while (used[j]) {
      if (keys[j] == key) return vals[j];
      j = (j + 1) & (cap - 1);
    }
    used[j] = 1;
    keys[j] = key;
    vals[j] = static_cast<int32_t>(n++);
    return vals[j];
  }
};

struct DictSet {
  Dict64* dicts;
  int32_t ncols;
};

}  // namespace

extern "C" {

void* criteo_dicts_new(int32_t ncols) {
  DictSet* s = new DictSet;
  s->ncols = ncols;
  s->dicts = new Dict64[ncols];
  for (int32_t j = 0; j < ncols; ++j) s->dicts[j].init(1 << 16);
  return s;
}

void criteo_dicts_free(void* h) {
  DictSet* s = static_cast<DictSet*>(h);
  for (int32_t j = 0; j < s->ncols; ++j) s->dicts[j].destroy();
  delete[] s->dicts;
  delete s;
}

// Map row-major raw[n_rows * ncols] -> out ids (first-appearance order).
void criteo_dicts_map(void* h, const int64_t* raw, int64_t n_rows,
                      int32_t ncols, int32_t* out) {
  DictSet* s = static_cast<DictSet*>(h);
  for (int64_t r = 0; r < n_rows; ++r) {
    const int64_t* row = raw + r * ncols;
    int32_t* orow = out + r * ncols;
    for (int32_t j = 0; j < ncols; ++j) {
      orow[j] = s->dicts[j].get_or_insert(row[j]);
    }
  }
}

int64_t criteo_dicts_size(void* h, int32_t col) {
  DictSet* s = static_cast<DictSet*>(h);
  return static_cast<int64_t>(s->dicts[col].n);
}

// Dump (key, id) pairs of one column (for merges/exports).
int64_t criteo_dicts_items(void* h, int32_t col, int64_t* keys_out,
                           int32_t* ids_out, int64_t max_items) {
  DictSet* s = static_cast<DictSet*>(h);
  Dict64& d = s->dicts[col];
  int64_t m = 0;
  for (size_t i = 0; i < d.cap && m < max_items; ++i) {
    if (!d.used[i]) continue;
    keys_out[m] = d.keys[i];
    ids_out[m] = d.vals[i];
    ++m;
  }
  return m;
}

}  // extern "C"
