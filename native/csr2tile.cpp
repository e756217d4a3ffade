// Native CSR <-> tile converters: the framework's host-side format hot
// path, the functional equivalent of the reference's OpenMP converters
// (`src/csr2tile.h:205-506`, `src/tile2csr.h:8-140`) re-written as two
// fused passes with per-thread tile-column maps.
//
// Exposed via a C ABI consumed through ctypes (spgemm_tpu/utils/native.py).
// Layout contract matches spgemm_tpu.models.tile.TileMat:
//   tiles sorted by (tile_row, tile_col); intra-tile nonzeros row-major;
//   rc = ri*tn + ci (int32); masks uint32 LSB-first, ceil(tn/32) words
//   per intra-tile row; rowptr (nt, tm+1) int32.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC csr2tile.cpp -o libspgemmtile.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Phase A: count non-empty tiles per tile-row. Writes tptr (gm+1,
// exclusive scan) and returns total tile count.
int64_t csr2tile_count(
    const int32_t* indptr, const int32_t* indices,
    int64_t m, int64_t n, int64_t tm, int64_t tn,
    int32_t* tptr /* gm+1 */) {
  const int64_t gm = (m + tm - 1) / tm;
  const int64_t gn = (n + tn - 1) / tn;

#pragma omp parallel
  {
    std::vector<int32_t> stamp(gn, -1);
#pragma omp for schedule(dynamic, 8)
    for (int64_t bi = 0; bi < gm; ++bi) {
      int32_t cnt = 0;
      const int64_t r0 = bi * tm;
      const int64_t r1 = r0 + tm < m ? r0 + tm : m;
      for (int64_t r = r0; r < r1; ++r) {
        for (int32_t p = indptr[r]; p < indptr[r + 1]; ++p) {
          const int64_t tc = indices[p] / tn;
          if (stamp[tc] != (int32_t)bi) {
            stamp[tc] = (int32_t)bi;
            ++cnt;
          }
        }
      }
      tptr[bi + 1] = cnt;
    }
  }
  tptr[0] = 0;
  for (int64_t i = 0; i < gm; ++i) tptr[i + 1] += tptr[i];
  return tptr[gm];
}

// Phase B: fill all tile arrays. Caller allocates based on phase A's nt.
void csr2tile_fill(
    const int32_t* indptr, const int32_t* indices, const double* data,
    int64_t m, int64_t n, int64_t tm, int64_t tn,
    const int32_t* tptr,
    int32_t* trow, int32_t* tcol,          // (nt,)
    int32_t* tnnz_ptr,                     // (nt+1,) exclusive scan
    int32_t* rowptr,                       // (nt, tm+1)
    uint32_t* mask,                        // (nt, tm, mw)
    int32_t* rc,                           // (nnz,)
    double* val) {                         // (nnz,)
  const int64_t gm = (m + tm - 1) / tm;
  const int64_t gn = (n + tn - 1) / tn;
  const int64_t mw = (tn + 31) / 32;
  const int64_t nt = tptr[gm];

  // pass 1: per tile-row, assign tile ordinals (sorted by tcol) and count
  // per-tile-per-row nonzeros into rowptr slots.
#pragma omp parallel
  {
    std::vector<int32_t> ord(gn, -1);     // tile col -> local ordinal
#pragma omp for schedule(dynamic, 8)
    for (int64_t bi = 0; bi < gm; ++bi) {
      const int32_t base = tptr[bi];
      const int32_t ntiles = tptr[bi + 1] - base;
      const int64_t r0 = bi * tm;
      const int64_t r1 = r0 + tm < m ? r0 + tm : m;
      // collect distinct tile cols in first-seen order, then sort
      int32_t seen = 0;
      for (int64_t r = r0; r < r1; ++r)
        for (int32_t p = indptr[r]; p < indptr[r + 1]; ++p) {
          const int64_t tc = indices[p] / tn;
          if (ord[tc] < 0) {
            ord[tc] = 1;  // mark
            tcol[base + seen] = (int32_t)tc;
            ++seen;
          }
        }
      // sort the (small) tile-col list: insertion sort
      for (int32_t i = 1; i < ntiles; ++i) {
        int32_t key = tcol[base + i];
        int32_t j = i - 1;
        while (j >= 0 && tcol[base + j] > key) {
          tcol[base + j + 1] = tcol[base + j];
          --j;
        }
        tcol[base + j + 1] = key;
      }
      for (int32_t i = 0; i < ntiles; ++i) {
        trow[base + i] = (int32_t)bi;
        ord[tcol[base + i]] = base + i;   // global tile ordinal
      }
      // count nnz per (tile, intra-row)
      for (int64_t r = r0; r < r1; ++r) {
        const int64_t ri = r - r0;
        for (int32_t p = indptr[r]; p < indptr[r + 1]; ++p) {
          const int64_t c = indices[p];
          const int32_t t = ord[c / tn];
          ++rowptr[(int64_t)t * (tm + 1) + ri + 1];
          mask[((int64_t)t * tm + ri) * mw + (c % tn) / 32] |=
              (uint32_t)1 << ((c % tn) % 32);
        }
      }
      // reset ord for reuse
      for (int32_t i = 0; i < ntiles; ++i) ord[tcol[base + i]] = -1;
    }
  }

  // scan rowptr per tile and build tnnz_ptr
  tnnz_ptr[0] = 0;
  for (int64_t t = 0; t < nt; ++t) {
    int32_t* rp = rowptr + t * (tm + 1);
    for (int64_t i = 0; i < tm; ++i) rp[i + 1] += rp[i];
    tnnz_ptr[t + 1] = tnnz_ptr[t] + rp[tm];
  }

  // pass 2: scatter values/rc using per-(tile,row) cursors
#pragma omp parallel
  {
    std::vector<int32_t> ord(gn, -1);
    std::vector<int32_t> cursor;          // per local tile-row block
#pragma omp for schedule(dynamic, 8)
    for (int64_t bi = 0; bi < gm; ++bi) {
      const int32_t base = tptr[bi];
      const int32_t ntiles = tptr[bi + 1] - base;
      for (int32_t i = 0; i < ntiles; ++i) ord[tcol[base + i]] = base + i;
      const int64_t r0 = bi * tm;
      const int64_t r1 = r0 + tm < m ? r0 + tm : m;
      for (int64_t r = r0; r < r1; ++r) {
        const int64_t ri = r - r0;
        // per-row cursor within each tile: nonzeros arrive in ascending
        // column order inside a row, so a running cursor per tile row
        // preserves row-major intra-tile order.
        for (int32_t p = indptr[r]; p < indptr[r + 1]; ++p) {
          const int64_t c = indices[p];
          const int32_t t = ord[c / tn];
          int32_t* rp = rowptr + (int64_t)t * (tm + 1);
          const int64_t pos = tnnz_ptr[t] + rp[ri]++;
          rc[pos] = (int32_t)(ri * tn + c % tn);
          val[pos] = data[p];
        }
      }
      for (int32_t i = 0; i < ntiles; ++i) ord[tcol[base + i]] = -1;
    }
  }

  // rowptr was advanced by the cursors; shift back (rp[i] now equals the
  // old rp[i+1], so rebuild by right-shifting with leading zero)
#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < nt; ++t) {
    int32_t* rp = rowptr + t * (tm + 1);
    for (int64_t i = tm; i > 0; --i) rp[i] = rp[i - 1];
    rp[0] = 0;
  }
}

// tile -> CSR: rebuild plain CSR (rows sorted, cols sorted within rows).
void tile2csr(
    const int32_t* trow, const int32_t* tcol, const int32_t* tnnz_ptr,
    const int32_t* rowptr, const int32_t* rc, const double* val,
    int64_t nt, int64_t m, int64_t tm, int64_t tn,
    int32_t* indptr /* m+1, zeroed */, int32_t* indices, double* data) {
  // count per global row
  for (int64_t t = 0; t < nt; ++t) {
    const int64_t r0 = (int64_t)trow[t] * tm;
    const int32_t* rp = rowptr + t * (tm + 1);
    for (int64_t i = 0; i < tm; ++i) {
      const int64_t gr = r0 + i;
      if (gr < m) indptr[gr + 1] += rp[i + 1] - rp[i];
    }
  }
  for (int64_t i = 0; i < m; ++i) indptr[i + 1] += indptr[i];
  std::vector<int32_t> cur(indptr, indptr + m);
  // tiles are sorted (trow, tcol) and intra-tile rows are col-sorted, so
  // appending in tile order keeps columns sorted per row.
  for (int64_t t = 0; t < nt; ++t) {
    const int64_t r0 = (int64_t)trow[t] * tm;
    const int64_t c0 = (int64_t)tcol[t] * tn;
    const int32_t* rp = rowptr + t * (tm + 1);
    for (int64_t i = 0; i < tm; ++i) {
      const int64_t gr = r0 + i;
      for (int32_t p = rp[i]; p < rp[i + 1]; ++p) {
        const int64_t q = tnnz_ptr[t] + p;
        indices[cur[gr]] = (int32_t)(c0 + rc[q] % tn);
        data[cur[gr]] = val[q];
        ++cur[gr];
      }
    }
  }
}

// -------------------------------------------------------------------------
// Gustavson symbolic phase for the strip SpGEMM kernel: per C tile-row,
// the set of C tile-columns is the union of B tile-rows selected by A's
// tiles in that row. Functional equivalent of the reference's step 1-2
// symbolic kernels (`src/tilespgemm-cuda.h:279-392,394-773`) on the host,
// OpenMP over tile-rows with per-thread dense stamp maps.
// -------------------------------------------------------------------------

// Phase 1: count C tiles per tile-row of A. Writes c_tptr (gm+1,
// exclusive scan) and returns nt_c.
int64_t gustavson_symbolic_count(
    const int32_t* tptr_a, const int32_t* tcol_a, int64_t gm, int64_t gn_c,
    const int32_t* tptr_b, const int32_t* tcol_b,
    int32_t* c_tptr /* gm+1 */) {
#pragma omp parallel
  {
    std::vector<int32_t> stamp(gn_c, -1);
#pragma omp for schedule(dynamic, 16)
    for (int64_t i = 0; i < gm; ++i) {
      int32_t cnt = 0;
      for (int32_t t = tptr_a[i]; t < tptr_a[i + 1]; ++t) {
        const int32_t k = tcol_a[t];
        for (int32_t p = tptr_b[k]; p < tptr_b[k + 1]; ++p) {
          const int32_t j = tcol_b[p];
          if (stamp[j] != (int32_t)i) {
            stamp[j] = (int32_t)i;
            ++cnt;
          }
        }
      }
      c_tptr[i + 1] = cnt;
    }
  }
  c_tptr[0] = 0;
  for (int64_t i = 0; i < gm; ++i) c_tptr[i + 1] += c_tptr[i];
  return c_tptr[gm];
}

// Phase 2: emit sorted C tile coordinates, the strip kernel's per-pair
// block-local slot table (padded pairs -> max_cblock), and the candidate
// -> block-padded-position gather map.
void gustavson_symbolic_fill(
    const int32_t* tptr_a, const int32_t* tcol_a, int64_t gm, int64_t gn_c,
    const int32_t* tptr_b, const int32_t* tcol_b,
    const int32_t* c_tptr,
    int64_t block_rows, int64_t max_cblock, int64_t max_b,
    int32_t* ctrow, int32_t* ctcol,        // (nt_c,)
    int32_t* slots,                        // (ntA_pad*max_b,) prefilled
    int64_t* gather_idx) {                 // (nt_c,)
#pragma omp parallel
  {
    std::vector<int32_t> stamp(gn_c, -1);
    std::vector<int32_t> loc(gn_c, 0);
    std::vector<int32_t> cols;
#pragma omp for schedule(dynamic, 16)
    for (int64_t i = 0; i < gm; ++i) {
      const int64_t i0 = (i / block_rows) * block_rows;
      const int64_t blk = i / block_rows;
      const int64_t c_lo = c_tptr[i];
      const int64_t blk_base = c_tptr[i0];
      // collect this row's distinct C columns
      cols.clear();
      for (int32_t t = tptr_a[i]; t < tptr_a[i + 1]; ++t) {
        const int32_t k = tcol_a[t];
        for (int32_t p = tptr_b[k]; p < tptr_b[k + 1]; ++p) {
          const int32_t j = tcol_b[p];
          if (stamp[j] != (int32_t)i) {
            stamp[j] = (int32_t)i;
            cols.push_back(j);
          }
        }
      }
      std::sort(cols.begin(), cols.end());
      for (int32_t s = 0; s < (int32_t)cols.size(); ++s) {
        const int32_t j = cols[s];
        ctrow[c_lo + s] = (int32_t)i;
        ctcol[c_lo + s] = j;
        gather_idx[c_lo + s] = blk * max_cblock + (c_lo - blk_base) + s;
        loc[j] = s;
      }
      // per-pair slots (block-local)
      const int64_t row_base = c_lo - blk_base;
      for (int32_t t = tptr_a[i]; t < tptr_a[i + 1]; ++t) {
        const int32_t k = tcol_a[t];
        const int32_t nb = tptr_b[k + 1] - tptr_b[k];
        for (int32_t y = 0; y < nb && y < (int32_t)max_b; ++y) {
          const int32_t j = tcol_b[tptr_b[k] + y];
          slots[(int64_t)t * max_b + y] = (int32_t)(row_base + loc[j]);
        }
      }
    }
  }
}

// -------------------------------------------------------------------------
// Device-operand packing for the strip kernel (the framework's analogue
// of the reference's H2D staging, `src/tilespgemm-cuda.h:2255-2324`):
// dense per-tile value blocks (f32) and occupancy blocks (bfloat16 bit
// pattern 0x3F80 = 1.0f, written as uint16).
// -------------------------------------------------------------------------

// A-side: (nt, tm*tn) dense blocks in tile order. Caller passes zeroed
// buffers (padding rows beyond nt stay zero).
void pack_tiles_dense(
    const int32_t* tnnz_ptr, const int32_t* rc, const double* val,
    int64_t nt, int64_t tile_elems,
    float* out_val, uint16_t* out_occ) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t t = 0; t < nt; ++t) {
    float* dv = out_val + t * tile_elems;
    uint16_t* doq = out_occ + t * tile_elems;
    for (int32_t p = tnnz_ptr[t]; p < tnnz_ptr[t + 1]; ++p) {
      dv[rc[p]] = (float)val[p];
      doq[rc[p]] = 0x3F80;  // bfloat16 1.0
    }
  }
}

// B-side: stacked k-slabs (gk, tk, max_b*tn); tile y of row k lands at
// column offset y*tn. Caller passes zeroed buffers.
void pack_b_slabs(
    const int32_t* tptr /* gk+1 */, const int32_t* tnnz_ptr,
    const int32_t* rc, const double* val,
    int64_t gk, int64_t tk, int64_t tn, int64_t max_b,
    float* out_val, uint16_t* out_occ) {
  const int64_t width = max_b * tn;
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t k = 0; k < gk; ++k) {
    float* dv = out_val + k * tk * width;
    uint16_t* doq = out_occ + k * tk * width;
    const int32_t nb = tptr[k + 1] - tptr[k];
    for (int32_t y = 0; y < nb && y < (int32_t)max_b; ++y) {
      const int32_t t = tptr[k] + y;
      const int64_t c0 = (int64_t)y * tn;
      for (int32_t p = tnnz_ptr[t]; p < tnnz_ptr[t + 1]; ++p) {
        const int64_t r = rc[p] / tn;
        const int64_t c = rc[p] % tn;
        dv[r * width + c0 + c] = (float)val[p];
        doq[r * width + c0 + c] = 0x3F80;
      }
    }
  }
}

// --- ESC symbolic (unstructured engine, ops/esc.py) -----------------------
// The host half of the digit-ESC engine: the role the reference fills
// with nsparse's GPU hash tables (`src/spgemm_nsparse_kernel.h:1171-1438`).
// Three O(flops) passes with a per-row stamp map:
//   1. esc_pattern_count  — C's structural row pointer (merge count)
//   2. esc_products_count — C's sorted column indices + products per
//                           S-slot interval of C's value array
//   3. esc_fill           — per-product (group, slot) assignment written
//                           straight into the padded per-class operand
//                           streams (counting sort, sibling splits)

// Pass 1: structural pattern count. Fills c_indptr (m+1, exclusive scan),
// returns nnzC.
int64_t esc_pattern_count(
    const int32_t* a_indptr, const int32_t* a_indices,
    const int32_t* b_indptr, const int32_t* b_indices,
    int64_t m, int64_t n, int32_t* c_indptr /* m+1 */) {
  std::vector<int64_t> stamp(n, -1);
  c_indptr[0] = 0;
  int64_t total = 0;
  for (int64_t i = 0; i < m; ++i) {
    int64_t cnt = 0;
    for (int32_t p = a_indptr[i]; p < a_indptr[i + 1]; ++p) {
      const int32_t k = a_indices[p];
      for (int32_t q = b_indptr[k]; q < b_indptr[k + 1]; ++q) {
        const int32_t j = b_indices[q];
        if (stamp[j] != i) {
          stamp[j] = i;
          ++cnt;
        }
      }
    }
    total += cnt;
    c_indptr[i + 1] = (int32_t)total;
  }
  return total;
}

// Pass 2: fill c_indices (sorted columns per row) and count products per
// S-slot interval of C's value array. Returns the total product count F.
int64_t esc_products_count(
    const int32_t* a_indptr, const int32_t* a_indices,
    const int32_t* b_indptr, const int32_t* b_indices,
    int64_t m, int64_t n, const int32_t* c_indptr,
    int32_t* c_indices /* nnzC */, int64_t s_slots,
    int64_t* prod_cnt /* ceil(nnzC/s_slots) */) {
  std::vector<int64_t> stamp(n, -1);
  std::vector<int32_t> pos(n);
  int64_t flops = 0;
  for (int64_t i = 0; i < m; ++i) {
    const int64_t base = c_indptr[i];
    int32_t cnt = 0;
    int32_t* cols = c_indices + base;
    for (int32_t p = a_indptr[i]; p < a_indptr[i + 1]; ++p) {
      const int32_t k = a_indices[p];
      for (int32_t q = b_indptr[k]; q < b_indptr[k + 1]; ++q) {
        const int32_t j = b_indices[q];
        if (stamp[j] != i) {
          stamp[j] = i;
          cols[cnt++] = j;
        }
      }
    }
    std::sort(cols, cols + cnt);
    for (int32_t t = 0; t < cnt; ++t) pos[cols[t]] = t;
    for (int32_t p = a_indptr[i]; p < a_indptr[i + 1]; ++p) {
      const int32_t k = a_indices[p];
      for (int32_t q = b_indptr[k]; q < b_indptr[k + 1]; ++q) {
        const int64_t dest = base + pos[b_indices[q]];
        ++prod_cnt[dest / s_slots];
        ++flops;
      }
    }
  }
  return flops;
}

// Pass 3: write every product's (a index, b index, slot) into its final
// padded position. sib_ptr/sib_base encode the caller-computed sibling
// and width-class layout: interval g's products go, in A-order, to
// siblings sib_ptr[g], sib_ptr[g]+1, ... in chunks of f_max; sibling s
// occupies flat positions [sib_base[s], sib_base[s] + its class width).
void esc_fill(
    const int32_t* a_indptr, const int32_t* a_indices,
    const int32_t* b_indptr, const int32_t* b_indices,
    const double* a_data, const double* b_data,
    int64_t m, int64_t n, const int32_t* c_indptr,
    const int32_t* c_indices, int64_t s_slots, int64_t f_max,
    const int64_t* sib_ptr, const int64_t* sib_base,
    int64_t num_intervals,
    int32_t* asrc, int32_t* bsrc, int32_t* slot,
    double* av, double* bv) {
  std::vector<int32_t> pos(n);
  std::vector<int64_t> counter(num_intervals, 0);
  for (int64_t i = 0; i < m; ++i) {
    const int64_t base = c_indptr[i];
    const int32_t cnt = c_indptr[i + 1] - c_indptr[i];
    for (int32_t t = 0; t < cnt; ++t) {
      pos[c_indices[base + t]] = t;
    }
    for (int32_t p = a_indptr[i]; p < a_indptr[i + 1]; ++p) {
      const int32_t k = a_indices[p];
      const double aval = a_data[p];
      for (int32_t q = b_indptr[k]; q < b_indptr[k + 1]; ++q) {
        const int64_t dest = base + pos[b_indices[q]];
        const int64_t g = dest / s_slots;
        const int64_t c = counter[g]++;
        const int64_t off = sib_base[sib_ptr[g] + c / f_max] + c % f_max;
        asrc[off] = p;
        bsrc[off] = q;
        slot[off] = (int32_t)(dest - g * s_slots);
        av[off] = aval;
        bv[off] = b_data[q];
      }
    }
  }
}

// --- scan-mode ESC symbolic (ops/esc.py ScanPlan) --------------------------
// Lays every partial product out dest-SORTED in (row, lane) form: window
// w = dest/128 of C's value array; its products, counting-sorted by
// dest, fill consecutive 128-lane rows. The device kernel then reduces
// runs with a lane suffix-scan + dynamic_gather. Same role as the
// reference's per-bin numeric launches (`tilespgemm-cuda.h:2649-2728`).

// Pass 2 (scan flavour): fill sorted c_indices AND per-dest product
// counts (c_dup). Returns F.
int64_t esc_scan_count(
    const int32_t* a_indptr, const int32_t* a_indices,
    const int32_t* b_indptr, const int32_t* b_indices,
    int64_t m, int64_t n, const int32_t* c_indptr,
    int32_t* c_indices, int32_t* c_dup) {
  std::vector<int64_t> stamp(n, -1);
  std::vector<int32_t> pos(n);
  int64_t flops = 0;
  for (int64_t i = 0; i < m; ++i) {
    const int64_t base = c_indptr[i];
    int32_t cnt = 0;
    int32_t* cols = c_indices + base;
    for (int32_t p = a_indptr[i]; p < a_indptr[i + 1]; ++p) {
      const int32_t k = a_indices[p];
      for (int32_t q = b_indptr[k]; q < b_indptr[k + 1]; ++q) {
        const int32_t j = b_indices[q];
        if (stamp[j] != i) {
          stamp[j] = i;
          cols[cnt++] = j;
        }
      }
    }
    std::sort(cols, cols + cnt);
    for (int32_t t = 0; t < cnt; ++t) pos[cols[t]] = t;
    for (int32_t p = a_indptr[i]; p < a_indptr[i + 1]; ++p) {
      const int32_t k = a_indices[p];
      for (int32_t q = b_indptr[k]; q < b_indptr[k + 1]; ++q) {
        ++c_dup[base + pos[b_indices[q]]];
        ++flops;
      }
    }
  }
  return flops;
}

// Pass 3 (scan flavour): counting-sort products by dest into the padded
// (R, 128) layout; emit run-start index map + validity and max in-row
// run length.
void esc_scan_fill(
    const int32_t* a_indptr, const int32_t* a_indices,
    const int32_t* b_indptr, const int32_t* b_indices,
    const double* a_data, const double* b_data,
    int64_t m, int64_t n, const int32_t* c_indptr,
    const int32_t* c_indices, const int32_t* c_dup,
    const int64_t* win_rowptr, int64_t n_win,
    int32_t* qm,               // (R*128*2) interleaved [f32 product, meta]
                               // meta = slot | idx<<7 | valid<<14 — one
                               // cache line per product in the hot loop
    int32_t* asrc, int32_t* bsrc,  // optional (want_src)
    int64_t want_src, int64_t* max_run_out) {
  const int64_t nnz_c = c_indptr[m];
  // per-dest start offset in the padded product stream
  std::vector<int64_t> dest_off(nnz_c + 1, 0);
  for (int64_t w = 0; w < n_win; ++w) {
    int64_t running = win_rowptr[w] * 128;
    const int64_t d1 = std::min<int64_t>((w + 1) * 128, nnz_c);
    for (int64_t d = w * 128; d < d1; ++d) {
      dest_off[d] = running;
      running += c_dup[d];
    }
  }
  // run-start index map + max in-row run
  int64_t max_run = 1;
  for (int64_t d = 0; d < nnz_c; ++d) {
    const int64_t off = dest_off[d];
    const int64_t dup = c_dup[d];
    if (dup <= 0) continue;
    const int32_t lane_s = (int32_t)(d & 127);
    const int64_t r0 = off >> 7;
    const int64_t r1 = (off + dup - 1) >> 7;
    qm[(r0 * 128 + lane_s) * 2 + 1] |=
        ((int32_t)(off & 127) << 7) | (1 << 14);
    int64_t run0 = std::min<int64_t>(dup, 128 - (off & 127));
    if (run0 > max_run) max_run = run0;
    for (int64_t r = r0 + 1; r <= r1; ++r) {
      qm[(r * 128 + lane_s) * 2 + 1] |= (1 << 14);  // idx bits: lane 0
      const int64_t rem = off + dup - r * 128;
      const int64_t runr = std::min<int64_t>(rem, 128);
      if (runr > max_run) max_run = runr;
    }
  }
  *max_run_out = max_run;
  // counting-sort fill
  std::vector<int32_t> pos(n);
  std::vector<int64_t> cursor(nnz_c, 0);
  for (int64_t i = 0; i < m; ++i) {
    const int64_t base = c_indptr[i];
    const int32_t cnt = c_indptr[i + 1] - c_indptr[i];
    for (int32_t t = 0; t < cnt; ++t) pos[c_indices[base + t]] = t;
    for (int32_t p = a_indptr[i]; p < a_indptr[i + 1]; ++p) {
      const int32_t k = a_indices[p];
      const double aval = a_data[p];
      for (int32_t q = b_indptr[k]; q < b_indptr[k + 1]; ++q) {
        const int64_t d = base + pos[b_indices[q]];
        const int64_t o = dest_off[d] + cursor[d]++;
        const float pv = (float)(aval * b_data[q]);
        memcpy(qm + o * 2, &pv, sizeof(float));
        qm[o * 2 + 1] |= (int32_t)(d & 127);
        if (want_src) {
          asrc[o] = p;
          bsrc[o] = q;
        }
      }
    }
  }
}

}  // extern "C"
