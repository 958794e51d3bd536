// Native host-side symbolic analysis for sprs_tpu.
//
// Plays the role of the reference's C layer (SuiteSparse LDL/CAMD bound
// through suitesparse_bindings/): the graph algorithms that feed the
// device kernels — elimination trees, LDL symbolic analysis, RCM
// ordering, triangular level scheduling, and a Gauss–Seidel reference
// sweep — are sequential pointer-chasing, so they run as optimized C++
// on the host while all numeric work runs on the TPU.  Bound into
// Python with ctypes (no pybind11 in this image); every entry point has
// a numpy fallback in sprs_tpu so the native library is a fast path,
// never a requirement.
//
// All index arrays are int32 (TPU-native index width), sizes int64.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

#ifndef INT64_MAX
#define INT64_MAX std::numeric_limits<int64_t>::max()
#endif

extern "C" {

// Elimination tree of a symmetric pattern (Liu's algorithm with path
// compression).  parent[k] = -1 for roots.
void sprs_etree(const int32_t* indptr, const int32_t* indices, int64_t n,
                int32_t* parent) {
  std::vector<int32_t> ancestor(static_cast<size_t>(n), -1);
  for (int64_t k = 0; k < n; ++k) parent[k] = -1;
  for (int64_t k = 0; k < n; ++k) {
    for (int32_t p = indptr[k]; p < indptr[k + 1]; ++p) {
      int32_t j = indices[p];
      if (j >= k) continue;
      while (true) {
        int32_t a = ancestor[j];
        ancestor[j] = static_cast<int32_t>(k);
        if (a == -1) {
          if (parent[j] == -1 && j != k) parent[j] = static_cast<int32_t>(k);
          break;
        }
        if (a == static_cast<int32_t>(k)) break;
        j = a;
      }
    }
  }
}

// LDL symbolic: etree + per-column sub-diagonal counts in one pass
// (Davis's ldl_symbolic schema).  Returns total sub-diagonal nnz of L.
// row_cols: the (permuted) upper-row pattern, CSR-like via row_ptr.
int64_t sprs_ldl_symbolic(const int32_t* row_ptr, const int32_t* row_cols,
                          int64_t n, int32_t* parent, int32_t* col_count,
                          int32_t* row_count) {
  std::vector<int32_t> flag(static_cast<size_t>(n), -1);
  for (int64_t k = 0; k < n; ++k) {
    parent[k] = -1;
    col_count[k] = 0;
    row_count[k] = 0;
  }
  int64_t total = 0;
  for (int64_t k = 0; k < n; ++k) {
    flag[k] = static_cast<int32_t>(k);
    for (int32_t p = row_ptr[k]; p < row_ptr[k + 1]; ++p) {
      int32_t j = row_cols[p];
      if (j >= k) continue;
      while (flag[j] != static_cast<int32_t>(k)) {
        if (parent[j] == -1) parent[j] = static_cast<int32_t>(k);
        ++col_count[j];
        ++row_count[k];
        ++total;
        flag[j] = static_cast<int32_t>(k);
        j = parent[j];
      }
    }
  }
  return total;
}

// Per-row topological patterns of L for the same input; row_pattern is
// (n, wl) padded with n; insert_pos receives the absolute slot of
// L[k, j] given l_indptr (diag-first CSC layout).  Also fills
// l_indices.  Must be called with wl >= max row pattern length (as
// returned via col counts from sprs_ldl_symbolic).
void sprs_ldl_pattern(const int32_t* row_ptr, const int32_t* row_cols,
                      int64_t n, const int32_t* parent,
                      const int64_t* l_indptr, int64_t wl,
                      int32_t* row_pattern, int64_t* insert_pos,
                      int32_t* l_indices) {
  std::vector<int32_t> flag(static_cast<size_t>(n), -1);
  std::vector<int64_t> fill(static_cast<size_t>(n));
  std::vector<int32_t> pat;
  for (int64_t j = 0; j < n; ++j) {
    fill[j] = l_indptr[j] + 1;  // slot after the unit diagonal
    l_indices[l_indptr[j]] = static_cast<int32_t>(j);
  }
  for (int64_t k = 0; k < n; ++k) {
    flag[k] = static_cast<int32_t>(k);
    pat.clear();
    for (int32_t p = row_ptr[k]; p < row_ptr[k + 1]; ++p) {
      int32_t j = row_cols[p];
      if (j >= k) continue;
      while (flag[j] != static_cast<int32_t>(k)) {
        pat.push_back(j);
        flag[j] = static_cast<int32_t>(k);
        j = parent[j];
      }
    }
    std::sort(pat.begin(), pat.end());
    for (size_t t = 0; t < static_cast<size_t>(wl); ++t) {
      if (t < pat.size()) {
        int32_t j = pat[t];
        row_pattern[k * wl + t] = j;
        insert_pos[k * wl + t] = fill[j];
        l_indices[fill[j]] = static_cast<int32_t>(k);
        ++fill[j];
      } else {
        row_pattern[k * wl + t] = static_cast<int32_t>(n);
        insert_pos[k * wl + t] = 0;
      }
    }
  }
}

// Reverse Cuthill–McKee with George–Liu pseudo-peripheral starts.
// Writes the permutation (new -> old) and component delimiters; returns
// the number of connected components.  parts must have room for n+1.
int64_t sprs_rcm(const int32_t* indptr, const int32_t* indices, int64_t n,
                 int32_t* perm, int64_t* parts, int32_t reversed) {
  std::vector<int64_t> deg(static_cast<size_t>(n), 0);
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p)
      if (indices[p] != i) ++deg[i];
  }
  std::vector<uint8_t> visited(static_cast<size_t>(n), 0);
  std::vector<int32_t> levels_buf;
  std::vector<int32_t> frontier, next;

  // BFS depth from root over unvisited vertices; returns eccentricity and
  // leaves the last level in `frontier`.
  auto rls = [&](int32_t root, std::vector<uint8_t>& seen) -> int64_t {
    std::fill(seen.begin(), seen.end(), 0);
    frontier.assign(1, root);
    seen[root] = 1;
    int64_t depth = 0;
    while (true) {
      next.clear();
      for (int32_t v : frontier) {
        for (int32_t p = indptr[v]; p < indptr[v + 1]; ++p) {
          int32_t u = indices[p];
          if (!seen[u] && !visited[u]) {
            seen[u] = 1;
            next.push_back(u);
          }
        }
      }
      if (next.empty()) return depth;
      frontier.swap(next);
      ++depth;
    }
  };

  std::vector<uint8_t> seen(static_cast<size_t>(n), 0);
  int64_t pos = 0;
  int64_t ncomp = 0;
  parts[0] = 0;
  for (int64_t seed = 0; seed < n; ++seed) {
    if (visited[seed]) continue;
    // pseudo-peripheral start
    int32_t x = static_cast<int32_t>(seed);
    int64_t ecc = rls(x, seen);
    while (true) {
      int32_t y = frontier[0];
      for (int32_t v : frontier)
        if (deg[v] < deg[y]) y = v;
      int64_t ecc_y = rls(y, seen);
      if (ecc_y <= ecc) {
        x = y;
        break;
      }
      x = y;
      ecc = ecc_y;
    }
    // Cuthill–McKee BFS with degree-sorted neighbor insertion
    std::queue<int32_t> q;
    q.push(x);
    visited[x] = 1;
    std::vector<int32_t> nbrs;
    while (!q.empty()) {
      int32_t v = q.front();
      q.pop();
      perm[pos++] = v;
      nbrs.clear();
      for (int32_t p = indptr[v]; p < indptr[v + 1]; ++p) {
        int32_t u = indices[p];
        if (!visited[u]) nbrs.push_back(u);
      }
      std::sort(nbrs.begin(), nbrs.end(),
                [&](int32_t a, int32_t b) { return deg[a] < deg[b]; });
      for (int32_t u : nbrs) {
        visited[u] = 1;
        q.push(u);
      }
    }
    ++ncomp;
    parts[ncomp] = pos;
  }
  if (reversed) {
    std::reverse(perm, perm + n);
    for (int64_t c = 0; c <= ncomp; ++c) parts[c] = n - parts[c];
    std::reverse(parts, parts + ncomp + 1);
  }
  return ncomp;
}

// Triangular dependency levels: level[i] = 1 + max(level of in-row deps).
// lower != 0: deps are indices < i scanned ascending; else indices > i
// scanned descending.  Returns the number of levels.
int64_t sprs_tri_levels(const int32_t* indptr, const int32_t* indices,
                        int64_t n, int32_t lower, int64_t* level) {
  int64_t max_level = 0;
  if (lower) {
    for (int64_t i = 0; i < n; ++i) {
      int64_t lv = 0;
      for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p) {
        int32_t j = indices[p];
        if (j < i && level[j] + 1 > lv) lv = level[j] + 1;
      }
      level[i] = lv;
      if (lv > max_level) max_level = lv;
    }
  } else {
    for (int64_t i = n - 1; i >= 0; --i) {
      int64_t lv = 0;
      for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p) {
        int32_t j = indices[p];
        if (j > i && level[j] + 1 > lv) lv = level[j] + 1;
      }
      level[i] = lv;
      if (lv > max_level) max_level = lv;
    }
  }
  return max_level + 1;
}

// Gauss–Seidel sweeps on CSR until ||Ax-b||_2 <= tol or max_iter.
// Returns iterations used; writes final residual to *residual.
int64_t sprs_gauss_seidel(const int32_t* indptr, const int32_t* indices,
                          const double* data, const double* b, double* x,
                          int64_t n, double tol, int64_t max_iter,
                          double* residual) {
  int64_t it = 0;
  double res = 0.0;
  auto compute_res = [&]() {
    double acc = 0.0;
    for (int64_t i = 0; i < n; ++i) {
      double yi = 0.0;
      for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p)
        yi += data[p] * x[indices[p]];
      double d = yi - b[i];
      acc += d * d;
    }
    return std::sqrt(acc);
  };
  res = compute_res();
  while (res > tol && it < max_iter) {
    for (int64_t i = 0; i < n; ++i) {
      double sigma = 0.0, diag = 0.0;
      for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p) {
        int32_t j = indices[p];
        if (j == i)
          diag = data[p];
        else
          sigma += data[p] * x[j];
      }
      x[i] = (b[i] - sigma) / diag;
    }
    ++it;
    res = compute_res();
  }
  *residual = res;
  return it;
}

// Approximate Minimum Degree ordering (quotient-graph AMD, simplified:
// plain minimum-degree with supervariable-free elimination on an
// explicit adjacency that caps fill tracking).  Good enough to serve the
// reference's CAMD role (an *optional* better-than-RCM ordering,
// sprs-ldl/src/lib.rs:148-161); not a full Amestoy–Davis–Duff AMD.
void sprs_min_degree(const int32_t* indptr, const int32_t* indices, int64_t n,
                     int32_t* perm) {
  std::vector<std::vector<int32_t>> adj(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int32_t j = indices[p];
      if (j != i) adj[i].push_back(j);
    }
    std::sort(adj[i].begin(), adj[i].end());
    adj[i].erase(std::unique(adj[i].begin(), adj[i].end()), adj[i].end());
  }
  std::vector<uint8_t> eliminated(static_cast<size_t>(n), 0);
  std::vector<int32_t> tmp;
  for (int64_t step = 0; step < n; ++step) {
    // pick min-degree uneliminated vertex
    int64_t best = -1, best_deg = INT64_MAX;
    for (int64_t v = 0; v < n; ++v) {
      if (eliminated[v]) continue;
      int64_t d = 0;
      for (int32_t u : adj[v])
        if (!eliminated[u]) ++d;
      if (d < best_deg) {
        best_deg = d;
        best = v;
      }
    }
    perm[step] = static_cast<int32_t>(best);
    eliminated[best] = 1;
    // connect the (uneliminated) neighborhood into a clique
    tmp.clear();
    for (int32_t u : adj[best])
      if (!eliminated[u]) tmp.push_back(u);
    for (size_t a = 0; a < tmp.size(); ++a) {
      for (size_t bdx = a + 1; bdx < tmp.size(); ++bdx) {
        int32_t u = tmp[a], w = tmp[bdx];
        if (!std::binary_search(adj[u].begin(), adj[u].end(), w)) {
          adj[u].insert(
              std::lower_bound(adj[u].begin(), adj[u].end(), w), w);
          adj[w].insert(
              std::lower_bound(adj[w].begin(), adj[w].end(), u), u);
        }
      }
    }
  }
}

// Sparse LU with threshold partial pivoting (left-looking
// Gilbert–Peierls).  Native twin of the Python reference in
// sprs_tpu/linalg/lu.py (which mirrors the role of the reference's
// UMFPACK binding, sprs_suitesparse_umfpack/src/lib.rs:48-120).
//
// Input: CSC (indptr/indices/data), n, pivot threshold in [0,1]
// (1 = strict partial pivoting; <1 prefers the diagonal when within
// threshold*colmax).  Output: L CSC with unit diagonal stored first per
// column and off-diagonal rows in pivot-position space; U CSC with rows
// sorted ascending, diagonal last.  perm_r[k] = original row pivoted to
// position k.  cap bounds each of L and U; returns 0 on success, -1 if
// cap is insufficient (caller re-runs with a larger cap), -2 on a
// singular column (err_col set).
int64_t sprs_lu(const int32_t* indptr, const int32_t* indices,
                const double* data, int64_t n, double pivot_threshold,
                int64_t cap, int64_t* l_indptr, int32_t* l_indices,
                double* l_data, int64_t* u_indptr, int32_t* u_indices,
                double* u_data, int32_t* perm_r, int64_t* err_col) {
  std::vector<int64_t> pinv(n, -1);
  std::vector<double> x(n, 0.0);
  std::vector<char> visited(n, 0);
  std::vector<int32_t> topo;
  topo.reserve(n);
  // DFS work stacks (iterative, like the reference's DStack trisolve,
  // trisolve.rs:286-358)
  std::vector<int32_t> st_node;
  std::vector<int64_t> st_it;
  std::vector<std::pair<int64_t, double>> ucol;

  l_indptr[0] = 0;
  u_indptr[0] = 0;
  int64_t lpos = 0, upos = 0;

  for (int64_t k = 0; k < n; ++k) {
    topo.clear();
    // --- symbolic: reach of A[:,k] through pivoted L columns ---------
    for (int64_t p = indptr[k]; p < indptr[k + 1]; ++p) {
      int32_t s = indices[p];
      if (visited[s]) continue;
      visited[s] = 1;
      st_node.assign(1, s);
      st_it.assign(1, 0);
      while (!st_node.empty()) {
        int32_t node = st_node.back();
        int64_t it = st_it.back();
        int64_t j = pinv[node];
        bool pushed = false;
        if (j >= 0) {
          // off-diag entries of L column j (skip stored unit diag)
          int64_t lo = l_indptr[j] + 1, hi = l_indptr[j + 1];
          while (lo + it < hi) {
            int32_t nxt = l_indices[lo + it];
            ++it;
            if (!visited[nxt]) {
              visited[nxt] = 1;
              st_it.back() = it;
              st_node.push_back(nxt);
              st_it.push_back(0);
              pushed = true;
              break;
            }
          }
        }
        if (!pushed) {
          topo.push_back(node);
          st_node.pop_back();
          st_it.pop_back();
        }
      }
    }
    // topo is in reverse topological order; iterate from the back.

    // --- numeric: x = A[:,k]; eliminate pivoted nodes in topo order --
    for (int64_t p = indptr[k]; p < indptr[k + 1]; ++p)
      x[indices[p]] = data[p];
    for (int64_t t = (int64_t)topo.size() - 1; t >= 0; --t) {
      int32_t node = topo[t];
      int64_t j = pinv[node];
      if (j < 0) continue;
      double xj = x[node];
      if (xj == 0.0) continue;
      int64_t lo = l_indptr[j] + 1, hi = l_indptr[j + 1];
      for (int64_t q = lo; q < hi; ++q) x[l_indices[q]] -= l_data[q] * xj;
    }

    // --- pivot selection --------------------------------------------
    double max_abs = 0.0;
    int32_t pivot = -1;
    for (int64_t t = (int64_t)topo.size() - 1; t >= 0; --t) {
      int32_t node = topo[t];
      if (pinv[node] >= 0) continue;
      double a = std::fabs(x[node]);
      if (a > max_abs) {
        max_abs = a;
        pivot = node;
      }
    }
    if (pivot < 0 || max_abs == 0.0) {
      *err_col = k;
      return -2;
    }
    if (pivot_threshold < 1.0 && k < n && pinv[k] < 0 && visited[k] &&
        std::fabs(x[k]) >= pivot_threshold * max_abs)
      pivot = (int32_t)k;
    double pv = x[pivot];
    pinv[pivot] = k;
    perm_r[k] = pivot;

    // --- emit U column (pivoted rows, sorted; diag last) and L column
    ucol.clear();
    int64_t l_start = lpos;
    if (lpos >= cap) return -1;
    l_indices[lpos] = pivot;  // unit diag placeholder (renumbered later)
    l_data[lpos] = 1.0;
    ++lpos;
    for (int64_t t = (int64_t)topo.size() - 1; t >= 0; --t) {
      int32_t node = topo[t];
      visited[node] = 0;
      double v = x[node];
      x[node] = 0.0;
      if (node == pivot || v == 0.0) continue;
      int64_t j = pinv[node];
      if (j >= 0 && j < k) {
        ucol.emplace_back(j, v);
      } else if (j < 0) {
        if (lpos >= cap) {
          // clear remaining marks before bailing
          while (t > 0) {
            --t;
            visited[topo[t]] = 0;
            x[topo[t]] = 0.0;
          }
          return -1;
        }
        l_indices[lpos] = node;  // original row id; renumbered later
        l_data[lpos] = v / pv;
        ++lpos;
      }
    }
    std::sort(ucol.begin(), ucol.end());
    if (upos + (int64_t)ucol.size() + 1 > cap) return -1;
    for (auto& rv : ucol) {
      u_indices[upos] = (int32_t)rv.first;
      u_data[upos] = rv.second;
      ++upos;
    }
    u_indices[upos] = (int32_t)k;
    u_data[upos] = pv;
    ++upos;
    (void)l_start;
    l_indptr[k + 1] = lpos;
    u_indptr[k + 1] = upos;
  }

  // Renumber L's off-diagonal rows into pivot-position space and sort
  // each column's (row, value) pairs (all rows are pivoted by now).
  {
    std::vector<std::pair<int32_t, double>> buf;
    for (int64_t k = 0; k < n; ++k) {
      int64_t lo = l_indptr[k] + 1, hi = l_indptr[k + 1];
      buf.clear();
      for (int64_t q = lo; q < hi; ++q)
        buf.emplace_back((int32_t)pinv[l_indices[q]], l_data[q]);
      std::sort(buf.begin(), buf.end());
      for (int64_t q = lo; q < hi; ++q) {
        l_indices[q] = buf[q - lo].first;
        l_data[q] = buf[q - lo].second;
      }
      l_indices[l_indptr[k]] = (int32_t)k;  // unit diag in pivot space
    }
  }
  return 0;
}


// ILU(0): IKJ incomplete LU restricted to A's own pattern (Saad,
// Iterative Methods 10.3).  CSR with sorted indices; vals updated in
// place to the combined factor (L strictly-lower with implicit unit
// diagonal, U upper incl diagonal).  Returns 0 on success, -1 with
// *bad_row set when a diagonal entry is structurally missing or a
// pivot is exactly zero.
int32_t sprs_ilu0(const int32_t* indptr, const int32_t* indices,
                  double* vals, int64_t n, int64_t* bad_row) {
  std::vector<int64_t> diag(static_cast<size_t>(n), -1);
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p)
      if (indices[p] == i) {
        diag[i] = p;
        break;
      }
    if (diag[i] < 0) {
      *bad_row = i;
      return -1;
    }
  }
  std::vector<int64_t> pos(static_cast<size_t>(n), -1);
  for (int64_t i = 0; i < n; ++i) {
    int32_t lo = indptr[i], hi = indptr[i + 1];
    for (int32_t p = lo; p < hi; ++p) pos[indices[p]] = p;
    for (int32_t p = lo; p < hi; ++p) {
      int32_t k = indices[p];
      if (k >= i) break;
      double ukk = vals[diag[k]];
      if (ukk == 0.0) {
        *bad_row = k;
        return -1;
      }
      double lik = vals[p] / ukk;
      vals[p] = lik;
      for (int64_t s = diag[k] + 1; s < indptr[k + 1]; ++s) {
        int64_t q = pos[indices[s]];
        if (q >= 0) vals[q] -= lik * vals[s];
      }
    }
    for (int32_t p = lo; p < hi; ++p) pos[indices[p]] = -1;
  }
  return 0;
}

// IC(0): zero-fill incomplete Cholesky on the LOWER-triangle pattern
// (CSR lower incl diagonal, sorted, diagonal last per row); vals
// updated in place to L.  Returns 0 on success, -1 with *bad_row set
// on a missing diagonal or non-positive pivot.
int32_t sprs_ic0(const int32_t* indptr, const int32_t* indices,
                 double* vals, int64_t n, int64_t* bad_row) {
  std::vector<int64_t> pos(static_cast<size_t>(n), -1);
  for (int64_t i = 0; i < n; ++i) {
    int32_t lo = indptr[i], hi = indptr[i + 1];
    if (hi == lo || indices[hi - 1] != i) {
      *bad_row = i;
      return -1;
    }
    for (int32_t p = lo; p < hi - 1; ++p) pos[indices[p]] = p;
    for (int32_t p = lo; p < hi - 1; ++p) {
      int32_t k = indices[p];
      double s = 0.0;
      for (int64_t q = indptr[k]; q < indptr[k + 1] - 1; ++q) {
        int64_t r = pos[indices[q]];
        if (r >= 0 && r < p) s += vals[r] * vals[q];
      }
      vals[p] = (vals[p] - s) / vals[indptr[k + 1] - 1];
    }
    double d = vals[hi - 1];
    for (int32_t p = lo; p < hi - 1; ++p) d -= vals[p] * vals[p];
    if (d <= 0.0) {
      *bad_row = i;
      return -1;
    }
    vals[hi - 1] = std::sqrt(d);
    for (int32_t p = lo; p < hi - 1; ++p) pos[indices[p]] = -1;
  }
  return 0;
}

}  // extern "C"
