// Native window-gather planner — host-side runtime core.
//
// C++ port of the hot loops of sparse/pallas_spmv.py::plan_windows_from_cols
// and the unit-weight split-plan subrow layout (_build_split_compact).  The
// numpy planner costs ~143 s at 244k nodes / 22M entries (profiled: the
// per-block sort/argpartition/diff plus ~10 full-array temporaries) and
// ~11-19 min at 1.9M — the reference's sparsity/plan construction runs in
// seconds on device (femutils/BSRFormat.h:583-744), so plan building must
// be the same class.  Single core (1-CPU host), fused passes, int32
// throughout, block-local scratch: ~20-40x over the numpy path.
//
// Semantics mirror the numpy planner with one simplification: PAD entries
// are passed as NEGATIVE columns and receive the _UNIT_PAD sentinel virtual
// index directly (their window row 2^21 exceeds every sweep height, so the
// kernel's row-match select zeroes them) — the numpy fill-nearby-column +
// post-mask passes disappear.  Tie-breaking in gap selection may differ
// from numpy's argpartition order; any top-k gap set yields an equivalent
// (correct) plan, and the parity tests compare gather RESULTS, not layout.
//
// C API (ctypes): build() returns a handle + sizes, fill() copies results
// into caller-allocated numpy buffers, free() releases.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int32_t kLane = 128;
constexpr int32_t kUnitPad = 1 << 28;  // pallas_spmv._UNIT_PAD

struct Plan {
  int32_t S = 0;
  int32_t nb = 0;
  int32_t need_rows = 0;
  std::vector<int32_t> lo;         // (nb, S) per-slot window start rows
  std::vector<int32_t> slot_rows;  // (S)
  std::vector<int32_t> virt;       // (nb * R * W) virtual window indices
};

}  // namespace

extern "C" {

// cols: (n, W) int32 row-major; entries < 0 are padding (sentinel virt).
// Returns nullptr when no candidate slot layout fits max_window.
void* afem_plan_build(int64_t n, int32_t W, const int32_t* cols,
                      int32_t block_rows, int32_t max_window,
                      const int32_t* cands, int32_t n_cands) {
  const int64_t R = block_rows;
  const int64_t M = R * W;  // entries per block
  if (M % kLane) return nullptr;
  const int32_t nb = (int32_t)((n + R - 1) / R);
  const int64_t E = (int64_t)nb * M;

  int32_t kmax = 0;
  for (int32_t c = 0; c < n_cands; ++c) kmax = std::max(kmax, cands[c] - 1);

  // per block: sorted distinct row-groups + the kmax largest gaps
  // (value-before, value-after, size), ordered by (size desc, pos asc)
  struct Gap {
    int32_t lo, hi, size;
  };
  std::vector<int32_t> bstart(nb), bend(nb);      // min/max row-group
  std::vector<int32_t> bngaps(nb, 0);             // gaps found (≤ kmax)
  std::vector<Gap> bgaps((size_t)nb * std::max(kmax, 1));
  std::vector<uint8_t> bempty(nb, 0);             // all-pad block

  {
    std::vector<int32_t> rg;  // block-local real row-groups
    rg.reserve(M);
    for (int32_t b = 0; b < nb; ++b) {
      rg.clear();
      const int64_t r0 = (int64_t)b * R;
      const int64_t r1 = std::min<int64_t>(r0 + R, n);
      for (int64_t r = r0; r < r1; ++r) {
        const int32_t* row = cols + r * W;
        for (int32_t w = 0; w < W; ++w)
          if (row[w] >= 0) rg.push_back(row[w] >> 7);
      }
      if (rg.empty()) {
        bempty[b] = 1;
        bstart[b] = 0;
        bend[b] = 0;
        continue;
      }
      std::sort(rg.begin(), rg.end());
      bstart[b] = rg.front();
      bend[b] = rg.back();
      if (kmax == 0) continue;
      // collect the kmax largest consecutive gaps via a small heap-free
      // insertion (kmax ≤ 15)
      Gap* g = &bgaps[(size_t)b * kmax];
      int32_t ng = 0;
      for (size_t i = 1; i < rg.size(); ++i) {
        const int32_t d = rg[i] - rg[i - 1];
        if (d <= 0) continue;  // duplicates: gap 0 never helps
        if (ng == kmax && d <= g[ng - 1].size) continue;
        // insert keeping (size desc, pos asc); pos order is preserved for
        // equal sizes because we scan positions ascending and insert AFTER
        // existing equals
        int32_t j = (ng < kmax) ? ng : kmax - 1;
        while (j > 0 && g[j - 1].size < d) {
          g[j] = g[j - 1];
          --j;
        }
        g[j] = Gap{rg[i - 1], rg[i], d};
        if (ng < kmax) ++ng;
      }
      bngaps[b] = ng;
    }
  }

  // evaluate candidate slot counts; best = min total rows (first wins ties)
  struct Layout {
    int32_t S = 0;
    std::vector<int32_t> slot_rows;
    int64_t total = -1;
  } best;
  for (int32_t c = 0; c < n_cands; ++c) {
    const int32_t S = cands[c];
    std::vector<int32_t> rows(S, 0);
    for (int32_t b = 0; b < nb; ++b) {
      const int32_t kk = std::min(S - 1, bngaps[b]);
      const Gap* g = &bgaps[(size_t)b * std::max(kmax, 1)];
      std::vector<std::pair<int32_t, int32_t>> pos;  // (gap_lo, gap_hi)
      for (int32_t j = 0; j < kk; ++j) pos.push_back({g[j].lo, g[j].hi});
      std::sort(pos.begin(), pos.end());
      // clusters: [start, glo0], [ghi0, glo1], ..., [ghiK, end]
      std::vector<int32_t> cst, cen;
      cst.push_back(bstart[b]);
      for (auto& p : pos) {
        cen.push_back(p.first);
        cst.push_back(p.second);
      }
      cen.push_back(bend[b]);
      // spans desc (largest-first slot assignment keeps static heights tight)
      std::vector<int32_t> spans(cst.size());
      for (size_t s = 0; s < cst.size(); ++s) spans[s] = cen[s] - cst[s] + 1;
      if (bempty[b]) spans.assign(cst.size(), 0);
      std::sort(spans.begin(), spans.end(), std::greater<int32_t>());
      for (size_t s = 0; s < spans.size() && (int32_t)s < S; ++s)
        rows[s] = std::max(rows[s], spans[s]);
    }
    int64_t total = 0;
    for (int32_t s = 0; s < S; ++s) {
      rows[s] = std::max(8, (rows[s] + 7) / 8 * 8);
      total += rows[s];
    }
    if (total * kLane > max_window) continue;
    if (best.total < 0 || total < best.total) {
      best.S = S;
      best.slot_rows = rows;
      best.total = total;
    }
  }
  if (best.total < 0) return nullptr;

  // final layout: per block, slot starts (desc-span order) + virt mapping
  auto* p = new Plan();
  p->S = best.S;
  p->nb = nb;
  p->slot_rows = best.slot_rows;
  p->lo.assign((size_t)nb * best.S, 0);
  p->virt.resize(E);
  std::vector<int32_t> off(best.S + 1, 0);
  for (int32_t s = 0; s < best.S; ++s) off[s + 1] = off[s] + best.slot_rows[s];
  int32_t need_rows = 0;

  for (int32_t b = 0; b < nb; ++b) {
    const int32_t S = best.S;
    const int32_t kk = std::min(S - 1, bngaps[b]);
    const Gap* g = &bgaps[(size_t)b * std::max(kmax, 1)];
    std::vector<std::pair<int32_t, int32_t>> pos;
    for (int32_t j = 0; j < kk; ++j) pos.push_back({g[j].lo, g[j].hi});
    std::sort(pos.begin(), pos.end());
    std::vector<int32_t> cst, cen;
    cst.push_back(bstart[b]);
    for (auto& q : pos) {
      cen.push_back(q.first);
      cst.push_back(q.second);
    }
    cen.push_back(bend[b]);
    // (span desc, then original order) — numpy argsort(-sp, stable)
    std::vector<int32_t> ordr(cst.size());
    for (size_t s = 0; s < ordr.size(); ++s) ordr[s] = (int32_t)s;
    std::stable_sort(ordr.begin(), ordr.end(), [&](int32_t a, int32_t bb) {
      return (cen[a] - cst[a]) > (cen[bb] - cst[bb]);
    });
    std::vector<int32_t> slo(S, bempty[b] ? 0 : bstart[b]);
    std::vector<int32_t> ssp(S, 0);
    for (size_t s = 0; s < ordr.size() && (int32_t)s < S; ++s) {
      slo[s] = cst[ordr[s]];
      ssp[s] = bempty[b] ? 0 : (cen[ordr[s]] - cst[ordr[s]] + 1);
    }
    int32_t* lo_b = &p->lo[(size_t)b * S];
    for (int32_t s = 0; s < S; ++s) {
      lo_b[s] = slo[s];
      need_rows = std::max(need_rows, slo[s] + best.slot_rows[s]);
    }
    // virt mapping: first matching slot wins (slots scanned in stored order)
    int32_t* vb = &p->virt[(size_t)b * M];
    const int64_t r0 = (int64_t)b * R;
    int64_t idx = 0;
    for (int64_t r = r0; r < r0 + R; ++r) {
      if (r >= n) {
        for (int32_t w = 0; w < W; ++w) vb[idx++] = kUnitPad;
        continue;
      }
      const int32_t* row = cols + r * W;
      for (int32_t w = 0; w < W; ++w) {
        const int32_t cv = row[w];
        if (cv < 0) {
          vb[idx++] = kUnitPad;
          continue;
        }
        const int32_t rgv = cv >> 7;
        const int32_t lane = cv & (kLane - 1);
        int32_t v = -1;
        for (int32_t s = 0; s < S; ++s) {
          if (rgv >= slo[s] && rgv < slo[s] + ssp[s]) {
            v = (off[s] + rgv - slo[s]) * kLane + lane;
            break;
          }
        }
        // cannot miss: clusters cover every real row-group
        vb[idx++] = v;
      }
    }
  }
  p->need_rows = need_rows;
  return p;
}

int32_t afem_plan_S(void* h) { return ((Plan*)h)->S; }
int32_t afem_plan_nb(void* h) { return ((Plan*)h)->nb; }
int32_t afem_plan_need_rows(void* h) { return ((Plan*)h)->need_rows; }

void afem_plan_fill(void* h, int32_t* lo, int32_t* slot_rows, int32_t* virt) {
  Plan* p = (Plan*)h;
  std::memcpy(lo, p->lo.data(), p->lo.size() * sizeof(int32_t));
  std::memcpy(slot_rows, p->slot_rows.data(),
              p->slot_rows.size() * sizeof(int32_t));
  std::memcpy(virt, p->virt.data(), p->virt.size() * sizeof(int32_t));
}

void afem_plan_free(void* h) { delete (Plan*)h; }

// ---------------------------------------------------------------------------
// Subrow layout for unit-weight split plans (_build_split_compact,
// compact=False): rows wider than wcap split into ceil(deg/wcap) subrows
// (empty rows KEEP one padding subrow — span-bound sweeps need them, see
// pallas_spmv.py).  Emits the (total, wcap) stage-1 cols with pads = -1
// (the native planner's sentinel convention) and the per-row subrow counts
// for the stage-2 layout.  One pass, no numpy temporaries.
//
// ccols: (E,) int32 entry columns, row-major by deg; deg: (n,) int32.
int64_t afem_subrow_total(int64_t n, const int32_t* deg, int32_t wcap) {
  int64_t total = 0;
  for (int64_t r = 0; r < n; ++r) {
    const int32_t d = deg[r];
    total += d ? (d + wcap - 1) / wcap : 1;
  }
  return total;
}

void afem_subrow_cols(int64_t n, int64_t E, const int32_t* ccols,
                      const int32_t* deg, int32_t wcap,
                      int32_t* s_cols /*(total, wcap)*/,
                      int32_t* nsub /*(n,)*/) {
  int64_t e = 0;
  int64_t sub = 0;
  for (int64_t r = 0; r < n; ++r) {
    const int32_t d = deg[r];
    const int32_t ns = d ? (d + wcap - 1) / wcap : 1;
    nsub[r] = ns;
    int32_t* out = s_cols + sub * wcap;
    const int64_t slots = (int64_t)ns * wcap;
    for (int64_t k = 0; k < slots; ++k)
      out[k] = (k < d) ? ccols[e + k] : -1;
    e += d;
    sub += ns;
  }
  (void)E;
}

// ---------------------------------------------------------------------------
// Counting sort of assembly entries by destination slot (the
// SortedEntryAssembler's argsort(slots) + entry_map[order] + bincount in
// one O(E) pass each): emits the CSR-style grouped entry indices and the
// per-slot degrees.  slots: (E,) int32 BELL slot of each entry; entry_map:
// optional (E,) int32 remap (symmetric packing) applied to the grouped
// ORDER (i.e. out = entry_map[argsort(slots)]), nullptr = identity.
void afem_group_by_slot(int64_t E, const int32_t* slots,
                        const int32_t* entry_map, int64_t n_slots,
                        int32_t* indices_out, int32_t* deg_out) {
  std::vector<int64_t> cur(n_slots + 1, 0);
  for (int64_t e = 0; e < E; ++e) ++cur[slots[e] + 1];
  for (int64_t s = 0; s < n_slots; ++s) {
    deg_out[s] = (int32_t)cur[s + 1];
    cur[s + 1] += cur[s];
  }
  if (entry_map) {
    for (int64_t e = 0; e < E; ++e)
      indices_out[cur[slots[e]]++] = entry_map[e];
  } else {
    for (int64_t e = 0; e < E; ++e)
      indices_out[cur[slots[e]]++] = (int32_t)e;
  }
}

}  // extern "C"
