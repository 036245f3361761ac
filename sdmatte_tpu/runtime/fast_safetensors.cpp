// fast_safetensors: zero-copy mmap reader for .safetensors checkpoints.
//
// Native runtime component for the checkpoint path (SURVEY.md §5: the
// reference loads 11 GB tensor-by-tensor through Python; here the file is
// mmap'd once, the header parsed natively, and tensor payloads are handed to
// numpy as zero-copy views with kernel readahead hints so the H2D stream can
// overlap disk I/O).
//
// C ABI only (ctypes-friendly). No external deps: includes a minimal JSON
// parser specialized to the safetensors header grammar
//   {"name": {"dtype": "F32", "shape": [..], "data_offsets": [a, b]}, ...}
// with an optional "__metadata__" object of string values.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct TensorInfo {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0;
  uint64_t end = 0;
};

struct Handle {
  int fd = -1;
  uint8_t* base = nullptr;    // mmap base
  size_t file_size = 0;
  uint64_t data_start = 0;    // offset of tensor data region
  std::vector<TensorInfo> tensors;
  std::string error;
};

// ---- minimal JSON scanner (header subset) --------------------------------

struct Scanner {
  const char* p;
  const char* end;
  bool fail = false;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }
  bool expect(char c) {
    skip_ws();
    if (p < end && *p == c) { p++; return true; }
    fail = true;
    return false;
  }
  bool peek(char c) {
    skip_ws();
    return p < end && *p == c;
  }
  std::string parse_string() {
    skip_ws();
    std::string out;
    if (p >= end || *p != '"') { fail = true; return out; }
    p++;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        p++;
        switch (*p) {
          case 'n': out.push_back('\n'); break;
          case 't': out.push_back('\t'); break;
          case 'u':  // \uXXXX — keep raw (names are ascii in practice)
            out.append("\\u");
            break;
          default: out.push_back(*p);
        }
      } else {
        out.push_back(*p);
      }
      p++;
    }
    if (p >= end) { fail = true; return out; }
    p++;  // closing quote
    return out;
  }
  int64_t parse_int() {
    skip_ws();
    bool neg = false;
    if (p < end && *p == '-') { neg = true; p++; }
    int64_t v = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') {
      v = v * 10 + (*p - '0');
      p++;
      any = true;
    }
    if (!any) fail = true;
    return neg ? -v : v;
  }
  // skip any JSON value (for __metadata__ contents)
  void skip_value() {
    skip_ws();
    if (p >= end) { fail = true; return; }
    if (*p == '"') { parse_string(); return; }
    if (*p == '{') {
      p++;
      skip_ws();
      if (peek('}')) { p++; return; }
      while (!fail) {
        parse_string();
        expect(':');
        skip_value();
        skip_ws();
        if (peek(',')) { p++; continue; }
        expect('}');
        return;
      }
      return;
    }
    if (*p == '[') {
      p++;
      skip_ws();
      if (peek(']')) { p++; return; }
      while (!fail) {
        skip_value();
        skip_ws();
        if (peek(',')) { p++; continue; }
        expect(']');
        return;
      }
      return;
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']') p++;
  }
};

bool parse_header(Handle* h, const char* json, size_t len) {
  Scanner s{json, json + len};
  if (!s.expect('{')) { h->error = "header: expected {"; return false; }
  if (s.peek('}')) return true;
  while (true) {
    std::string name = s.parse_string();
    if (s.fail) { h->error = "header: bad key"; return false; }
    if (!s.expect(':')) { h->error = "header: expected :"; return false; }
    if (name == "__metadata__") {
      s.skip_value();
      if (s.fail) { h->error = "header: bad metadata"; return false; }
    } else {
      TensorInfo ti;
      ti.name = name;
      if (!s.expect('{')) { h->error = "header: expected tensor obj"; return false; }
      while (true) {
        std::string field = s.parse_string();
        if (s.fail) { h->error = "header: bad field"; return false; }
        if (!s.expect(':')) { h->error = "header: expected :"; return false; }
        if (field == "dtype") {
          ti.dtype = s.parse_string();
        } else if (field == "shape") {
          if (!s.expect('[')) { h->error = "header: expected ["; return false; }
          if (s.peek(']')) {
            s.p++;
          } else {
            while (true) {
              ti.shape.push_back(s.parse_int());
              if (s.peek(',')) { s.p++; continue; }
              if (!s.expect(']')) { h->error = "header: expected ]"; return false; }
              break;
            }
          }
        } else if (field == "data_offsets") {
          if (!s.expect('[')) { h->error = "header: offsets ["; return false; }
          ti.begin = (uint64_t)s.parse_int();
          if (!s.expect(',')) { h->error = "header: offsets ,"; return false; }
          ti.end = (uint64_t)s.parse_int();
          if (!s.expect(']')) { h->error = "header: offsets ]"; return false; }
        } else {
          s.skip_value();
        }
        if (s.fail) { h->error = "header: parse fail in tensor"; return false; }
        if (s.peek(',')) { s.p++; continue; }
        if (!s.expect('}')) { h->error = "header: tensor }"; return false; }
        break;
      }
      // bounds validation against the data region
      uint64_t region = h->file_size - h->data_start;
      if (ti.end < ti.begin || ti.end > region) {
        h->error = "tensor '" + ti.name + "' offsets out of bounds";
        return false;
      }
      h->tensors.push_back(std::move(ti));
    }
    if (s.peek(',')) { s.p++; continue; }
    if (!s.expect('}')) { h->error = "header: final }"; return false; }
    break;
  }
  return true;
}

}  // namespace

extern "C" {

void* stf_open(const char* path) {
  Handle* h = new Handle();
  h->fd = open(path, O_RDONLY);
  if (h->fd < 0) { h->error = "open failed"; return h; }
  struct stat st;
  if (fstat(h->fd, &st) != 0) { h->error = "fstat failed"; return h; }
  h->file_size = (size_t)st.st_size;
  if (h->file_size < 8) { h->error = "file too small"; return h; }
  h->base = (uint8_t*)mmap(nullptr, h->file_size, PROT_READ, MAP_SHARED, h->fd, 0);
  if (h->base == MAP_FAILED) {
    h->base = nullptr;
    h->error = "mmap failed";
    return h;
  }
  uint64_t header_len;
  memcpy(&header_len, h->base, 8);
  if (8 + header_len > h->file_size) { h->error = "bad header length"; return h; }
  h->data_start = 8 + header_len;
  parse_header(h, (const char*)h->base + 8, header_len);
  return h;
}

const char* stf_error(void* hv) {
  Handle* h = (Handle*)hv;
  return h->error.empty() ? nullptr : h->error.c_str();
}

int64_t stf_num_tensors(void* hv) { return (int64_t)((Handle*)hv)->tensors.size(); }

const char* stf_name(void* hv, int64_t i) { return ((Handle*)hv)->tensors[i].name.c_str(); }

const char* stf_dtype(void* hv, int64_t i) { return ((Handle*)hv)->tensors[i].dtype.c_str(); }

int32_t stf_ndim(void* hv, int64_t i) { return (int32_t)((Handle*)hv)->tensors[i].shape.size(); }

void stf_shape(void* hv, int64_t i, int64_t* out) {
  const auto& s = ((Handle*)hv)->tensors[i].shape;
  for (size_t d = 0; d < s.size(); d++) out[d] = s[d];
}

const uint8_t* stf_data(void* hv, int64_t i) {
  Handle* h = (Handle*)hv;
  return h->base + h->data_start + h->tensors[i].begin;
}

int64_t stf_nbytes(void* hv, int64_t i) {
  const auto& t = ((Handle*)hv)->tensors[i];
  return (int64_t)(t.end - t.begin);
}

// Hint the kernel to stream the whole data region into page cache so tensor
// reads don't fault serially during H2D upload.
void stf_prefetch(void* hv) {
  Handle* h = (Handle*)hv;
  if (h->base && h->file_size > h->data_start) {
    madvise(h->base + h->data_start, h->file_size - h->data_start, MADV_WILLNEED);
    madvise(h->base + h->data_start, h->file_size - h->data_start, MADV_SEQUENTIAL);
  }
}

void stf_close(void* hv) {
  Handle* h = (Handle*)hv;
  if (h->base) munmap(h->base, h->file_size);
  if (h->fd >= 0) close(h->fd);
  delete h;
}

}  // extern "C"
