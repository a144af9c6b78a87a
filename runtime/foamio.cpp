// Native OpenFOAM ASCII numeric parser.
//
// The data-loading hot path of this framework is parsing large ASCII field
// files (hundreds of thousands of "(x y z)" rows per case). The pure-Python
// path costs a string-replace pass plus numpy fromstring; this parser does a
// single fused scan with strtod and parses many files across threads (the
// reference delegated the same problem to 8 DataLoader worker processes,
// common/training.py:57-58).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this environment).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Parse every float in [buf, buf+len) into out (capacity cap).
// Comments (// and /* */) are skipped. Returns the number parsed, or -1 on
// overflow. Bare words (identifiers) are skipped token-wise.
long parse_floats_impl(const char* buf, long len, double* out, long cap) {
  const char* p = buf;
  const char* end = buf + len;
  long n = 0;
  while (p < end) {
    char c = *p;
    if (c == '/' && p + 1 < end) {
      if (p[1] == '/') {  // line comment
        while (p < end && *p != '\n') ++p;
        continue;
      }
      if (p[1] == '*') {  // block comment
        p += 2;
        while (p + 1 < end && !(p[0] == '*' && p[1] == '/')) ++p;
        p += 2;
        continue;
      }
    }
    if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
      char* next = nullptr;
      double v = strtod(p, &next);
      if (next != p && next <= end) {
        // Reject things like "2.0;" inside identifiers: strtod already stops
        // at the first non-numeric char, which is what we want.
        if (n >= cap) return -1;
        out[n++] = v;
        p = next;
        continue;
      }
    }
    if (isalpha(static_cast<unsigned char>(c)) || c == '_') {
      // skip the whole identifier so numbers inside words (e.g. "grad2",
      // "patch_walls") are not parsed as data
      while (p < end && (isalnum(static_cast<unsigned char>(*p)) || *p == '_'))
        ++p;
      continue;
    }
    ++p;
  }
  return n;
}

struct FileJob {
  std::string path;
  double* out;
  long cap;
  long result;
};

bool read_file(const std::string& path, std::string* content) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  content->resize(size);
  size_t rd = fread(content->empty() ? nullptr : &(*content)[0], 1, size, f);
  fclose(f);
  return static_cast<long>(rd) == size;
}

// Find the payload region: everything after the last top-level header
// construct. For field files the caller passes an offset computed in Python;
// here we parse the whole range and let Python slice semantic sections.

}  // namespace

extern "C" {

long foamio_parse_floats(const char* buf, long len, double* out, long cap) {
  return parse_floats_impl(buf, len, out, cap);
}

// Parse all floats in a file (after skipping an optional FoamFile{...} header
// block). Returns count or -1 on IO error / -2 on overflow.
long foamio_parse_file(const char* path, double* out, long cap) {
  std::string content;
  if (!read_file(path, &content)) return -1;
  const char* start = content.data();
  long len = static_cast<long>(content.size());
  // skip the FoamFile header block if present
  const char* hdr = strstr(content.c_str(), "FoamFile");
  if (hdr != nullptr) {
    const char* brace = strchr(hdr, '{');
    if (brace != nullptr) {
      int depth = 0;
      const char* q = brace;
      const char* end = content.data() + len;
      while (q < end) {
        if (*q == '{') ++depth;
        if (*q == '}' && --depth == 0) { ++q; break; }
        ++q;
      }
      start = q;
      len = static_cast<long>(end - q);
    }
  }
  long n = parse_floats_impl(start, len, out, cap);
  return n < 0 ? -2 : n;
}

// Parse many files concurrently. paths: array of C strings; outs: array of
// output buffers; caps/results: per-file capacity / parsed count.
void foamio_parse_files(const char** paths, long n_files, double** outs,
                        const long* caps, long* results, long n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::vector<long> next(1, 0);
  auto worker = [&](long tid) {
    for (long i = tid; i < n_files; i += n_threads) {
      results[i] = foamio_parse_file(paths[i], outs[i], caps[i]);
    }
  };
  for (long t = 0; t < n_threads; ++t) pool.emplace_back(worker, t);
  for (auto& th : pool) th.join();
}

}  // extern "C"
