// genmmrec_native: C++ runtime for the host-side data path.
//
// TPU-native counterpart of the reference's native dependencies (SURVEY
// §2.4): where the reference leans on pandas/scipy (C-backed) plus
// torch-scatter/torch_geometric CUDA kernels for host-side graph prep, this
// library provides the hot host-side primitives as straight C++:
//   - TSV interaction-file parsing (reference: pandas read_csv,
//     src/utils/dataset.py:57)
//   - CSR build + padded per-user history matrices (reference: pandas
//     groupby loops, src/utils/dataloader.py:311-327)
//   - user-user co-occurrence top-k graphs (reference:
//     preprocessing/dualgnn-gen-u-u-matrix.py)
//   - item-item co-occurrence top-k ("session" graphs, DAMRS)
//
// Exposed with a plain C ABI for ctypes; all buffers are caller-allocated
// numpy arrays. Build: see build_native.py (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Pass 1: count data rows of a TSV file (excluding header).
// Returns -1 on open failure.
int64_t tsv_count_rows(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t lines = 0;
  std::vector<char> buf(1 << 20);
  size_t got;
  char last = '\n';
  while ((got = fread(buf.data(), 1, buf.size(), f)) > 0) {
    for (size_t i = 0; i < got; ++i)
      if (buf[i] == '\n') ++lines;
    last = buf[got - 1];
  }
  fclose(f);
  if (last != '\n') ++lines;     // unterminated final line
  return lines > 0 ? lines - 1 : 0;  // minus header
}

// Pass 2: parse user/item/label(/rating) columns by index into int32/float
// buffers of capacity `cap`. Column indices are 0-based positions within the
// tab-separated header. rating_col < 0 disables rating parsing.
// Returns number of parsed rows, or -1 on failure.
int64_t tsv_parse_inter(const char* path, int user_col, int item_col,
                        int label_col, int rating_col, int32_t* users,
                        int32_t* items, int32_t* labels, float* ratings,
                        int64_t cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  // stream line by line with a growing buffer
  std::vector<char> line(1 << 16);
  int64_t n = 0;
  bool header = true;
  while (fgets(line.data(), (int)line.size(), f)) {
    if (header) { header = false; continue; }
    if (n >= cap) break;
    int col = 0;
    char* p = line.data();
    char* field = p;
    int32_t u = -1, it = -1, lab = 0;
    float r = 0.f;
    for (;; ++p) {
      if (*p == '\t' || *p == '\n' || *p == '\r' || *p == '\0') {
        char saved = *p;
        *p = '\0';
        if (col == user_col) u = (int32_t)strtol(field, nullptr, 10);
        else if (col == item_col) it = (int32_t)strtol(field, nullptr, 10);
        else if (col == label_col) lab = (int32_t)strtol(field, nullptr, 10);
        else if (rating_col >= 0 && col == rating_col) r = strtof(field, nullptr);
        ++col;
        field = p + 1;
        if (saved == '\n' || saved == '\r' || saved == '\0') break;
      }
    }
    if (u < 0 || it < 0) continue;  // malformed row
    users[n] = u;
    items[n] = it;
    labels[n] = lab;
    if (ratings) ratings[n] = r;
    ++n;
  }
  fclose(f);
  return n;
}

// ---------------------------------------------------------------------------
// CSR build: given (ids, values) pairs, produce row_ptr (n_rows+1) and
// values grouped by id in stable order into `out_vals` (len n).
void build_csr(const int32_t* ids, const int32_t* vals, int64_t n,
               int32_t n_rows, int64_t* row_ptr, int32_t* out_vals) {
  std::memset(row_ptr, 0, sizeof(int64_t) * (n_rows + 1));
  for (int64_t i = 0; i < n; ++i) row_ptr[ids[i] + 1]++;
  for (int32_t r = 0; r < n_rows; ++r) row_ptr[r + 1] += row_ptr[r];
  std::vector<int64_t> cursor(row_ptr, row_ptr + n_rows);
  for (int64_t i = 0; i < n; ++i) out_vals[cursor[ids[i]]++] = vals[i];
}

// Padded, row-sorted history matrix: (n_rows, max_len) filled with
// `pad_value`; also writes per-row lengths. Returns max_len.
int64_t build_padded_history(const int32_t* ids, const int32_t* vals,
                             int64_t n, int32_t n_rows, int32_t pad_value,
                             int32_t* out /* n_rows*max_len, caller-sized */,
                             int32_t* lens, int64_t max_len) {
  std::vector<int64_t> row_ptr(n_rows + 1, 0);
  std::vector<int32_t> grouped(n);
  build_csr(ids, vals, n, n_rows, row_ptr.data(), grouped.data());
  for (int32_t r = 0; r < n_rows; ++r) {
    int64_t s = row_ptr[r], e = row_ptr[r + 1];
    std::sort(grouped.begin() + s, grouped.begin() + e);
    int64_t len = e - s;
    lens[r] = (int32_t)len;
    int32_t* dst = out + (int64_t)r * max_len;
    for (int64_t i = 0; i < len && i < max_len; ++i) dst[i] = grouped[s + i];
    for (int64_t i = len; i < max_len; ++i) dst[i] = pad_value;
  }
  return max_len;
}

int64_t max_row_count(const int32_t* ids, int64_t n, int32_t n_rows) {
  std::vector<int64_t> cnt(n_rows, 0);
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t c = ++cnt[ids[i]];
    if (c > m) m = c;
  }
  return m;
}

// ---------------------------------------------------------------------------
// Co-occurrence top-k: for each left node, the k right-side neighbors with
// the highest shared-interaction counts (user-user when rows=users, or
// item-item "session" graphs when called with swapped ids).
//
// Sparse algorithm: for each left node u, accumulate counts over the
// 2-hop neighborhood via the CSR of both directions — O(Σ_u Σ_{i∈u} deg(i)).
void cooccur_topk(const int32_t* left, const int32_t* right, int64_t n,
                  int32_t n_left, int32_t n_right, int32_t k,
                  int32_t* nbrs /* n_left*k */, float* wts /* n_left*k */) {
  std::vector<int64_t> l_ptr(n_left + 1, 0);
  std::vector<int32_t> l_adj(n);
  build_csr(left, right, n, n_left, l_ptr.data(), l_adj.data());
  std::vector<int64_t> r_ptr(n_right + 1, 0);
  std::vector<int32_t> r_adj(n);
  build_csr(right, left, n, n_right, r_ptr.data(), r_adj.data());

  std::vector<int32_t> count(n_left, 0);
  std::vector<int32_t> touched;
  touched.reserve(4096);

  for (int32_t u = 0; u < n_left; ++u) {
    touched.clear();
    for (int64_t e = l_ptr[u]; e < l_ptr[u + 1]; ++e) {
      int32_t item = l_adj[e];
      for (int64_t e2 = r_ptr[item]; e2 < r_ptr[item + 1]; ++e2) {
        int32_t v = r_adj[e2];
        if (v == u) continue;
        if (count[v] == 0) touched.push_back(v);
        count[v]++;
      }
    }
    // partial top-k over touched
    int32_t kk = (int32_t)std::min<size_t>(k, touched.size());
    std::partial_sort(touched.begin(), touched.begin() + kk, touched.end(),
                      [&](int32_t a, int32_t b) { return count[a] > count[b]; });
    int32_t* nrow = nbrs + (int64_t)u * k;
    float* wrow = wts + (int64_t)u * k;
    for (int32_t i = 0; i < kk; ++i) {
      nrow[i] = touched[i];
      wrow[i] = (float)count[touched[i]];
    }
    for (int32_t i = kk; i < k; ++i) {
      nrow[i] = kk > 0 ? nrow[i % kk] : 0;   // cyclic pad (reference pads by
      wrow[i] = kk > 0 ? wrow[i % kk] : 0.f; // duplicating sampled entries)
    }
    for (int32_t v : touched) count[v] = 0;
  }
}

}  // extern "C"
