// Native banded-DP alignment kernel suite (C ABI, loaded via ctypes).
//
// Bit-exact port of the Python host oracle (trust4_tpu/align/host.py), which
// itself reproduces the reference kernels (reference: AlignAlgo.hpp:57-1177)
// including tie-break order, band sentinels, and the stale-loop-variable
// initializer quirk.  Scores use int64 like the oracle.
//
// Build: make -C trust4_tpu/native

#include <array>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

// T4_PROF=1 gap-fill volume counters (fills, DP cells), dumped/reset by
// t4a_prof_dump2.
static std::atomic<int64_t> g_a_fills{0}, g_a_cells{0};
static inline bool t4a_prof_on() {
  static int v = -1;
  if (v == -1) {
    const char* e = getenv("T4_PROF");
    v = (e && e[0] == '1') ? 1 : 0;
  }
  return v == 1;
}
static inline void t4a_prof_fill(int tl, int pl) {
  if (t4a_prof_on()) {
    g_a_fills += 1;
    g_a_cells += (int64_t)tl * pl;
  }
}
extern "C" void t4a_prof_dump2(double* out2) {
  out2[0] = (double)g_a_fills.exchange(0);
  out2[1] = (double)g_a_cells.exchange(0);
}

namespace {

constexpr int EDIT_MATCH = 0;
constexpr int EDIT_MISMATCH = 1;
constexpr int EDIT_INSERT = 2;
constexpr int EDIT_DELETE = 3;

constexpr int64_t SCORE_MATCH = 2;
constexpr int64_t SCORE_MISMATCH = -2;
constexpr int64_t SCORE_GAPOPEN = -4;
constexpr int64_t SCORE_GAPEXTEND = -1;
constexpr int64_t SCORE_INDEL = -4;
constexpr int64_t SCORE_MATCH_LOCAL = 1;
constexpr int64_t SCORE_MISMATCH_LOCAL = -2;

inline int nuc_num(char c) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
    case 'N': return 0;  // reference quirk: N packs into slot 0
    default: return -1;
  }
}

inline bool chars_equal(char a, char b) {
  return a == b || a == 'N' || b == 'N';
}

inline bool is_base_equal(const int32_t* w, char c) {
  int64_t s = (int64_t)w[0] + w[1] + w[2] + w[3];
  if (s == 0 || c == 'N') return true;
  int idx = nuc_num(c);
  if (idx < 0) idx = 0;
  return s < 3 * (int64_t)w[idx];
}

struct Matrix {
  std::vector<int64_t> data;
  int cols = 0;
  void init(int rows, int cols_, int64_t fill) {
    cols = cols_;
    data.assign((size_t)rows * cols_, fill);
  }
  int64_t* row(int i) { return data.data() + (size_t)i * cols; }
};

thread_local Matrix g_m, g_e, g_f;
thread_local std::vector<uint8_t> g_eq;

// Band-indexed storage for the banded global variants: row i holds the
// cells j in [i-lb, i+rb] at k = j - i + lb (width W = lb+rb+1).  Cells
// outside the written window behave exactly like the old full-matrix
// implementation: row 0 / column 0 return their init formulas, everything
// else returns the exact neg_inf constant, so scores, tie-breaks and
// tracebacks are bit-identical to the rectangular code.
thread_local std::vector<int64_t> g_bm, g_be, g_bf;

// eq[i*lent + j] = 1 when p[i] matches text column j.
void build_eq_string(const char* t, int lent, const char* p, int lenp) {
  g_eq.assign((size_t)lenp * lent, 0);
  for (int i = 0; i < lenp; ++i) {
    uint8_t* row = g_eq.data() + (size_t)i * lent;
    char pc = p[i];
    for (int j = 0; j < lent; ++j)
      row[j] = chars_equal(t[j], pc);
  }
}

void build_eq_posweight(const int32_t* w, int lent, const char* p, int lenp) {
  g_eq.assign((size_t)lenp * lent, 0);
  for (int i = 0; i < lenp; ++i) {
    uint8_t* row = g_eq.data() + (size_t)i * lent;
    char pc = p[i];
    for (int j = 0; j < lent; ++j)
      row[j] = is_base_equal(w + 4 * j, pc);
  }
}

// Shared affine-gap fill; band < 0 means unbanded (one-end variant).
void affine_fill(int lent, int lenp, int left_band, int right_band) {
  int64_t neg_inf = (int64_t)(lent + 1) * (lenp + 1) * SCORE_GAPOPEN;
  g_m.init(lenp + 1, lent + 1, neg_inf);
  g_e.init(lenp + 1, lent + 1, neg_inf);
  g_f.init(lenp + 1, lent + 1, neg_inf);
  g_m.row(0)[0] = g_e.row(0)[0] = g_f.row(0)[0] = 0;
  for (int i = 1; i <= lenp; ++i) {
    g_e.row(i)[0] = SCORE_GAPOPEN + i * SCORE_GAPEXTEND;
    g_f.row(i)[0] = SCORE_GAPOPEN + i * SCORE_GAPOPEN;
    g_m.row(i)[0] = SCORE_GAPOPEN + i * SCORE_GAPOPEN;
  }
  // Stale-loop-variable quirk (AlignAlgo.hpp:271): e[0][j] seeded with
  // i == lenp+1 for every column.
  int64_t stale_i = lenp + 1;
  {
    int64_t* m0 = g_m.row(0);
    int64_t* e0 = g_e.row(0);
    int64_t* f0 = g_f.row(0);
    for (int j = 1; j <= lent; ++j) {
      f0[j] = SCORE_GAPOPEN + j * SCORE_GAPEXTEND;
      e0[j] = SCORE_GAPOPEN + stale_i * SCORE_GAPOPEN;
      m0[j] = SCORE_GAPOPEN + j * SCORE_GAPOPEN;
    }
  }
  const int64_t go_ge = SCORE_GAPOPEN + SCORE_GAPEXTEND;
  for (int i = 1; i <= lenp; ++i) {
    int start = 1, end = lent;
    if (left_band >= 0) {
      start = i - left_band;
      if (start < 1) start = 1;
      end = i + right_band;
      if (end > lent) end = lent;
    }
    const uint8_t* row_eq = g_eq.data() + (size_t)(i - 1) * lent;
    int64_t* mp = g_m.row(i - 1);
    int64_t* ep = g_e.row(i - 1);
    int64_t* mc = g_m.row(i);
    int64_t* ec = g_e.row(i);
    int64_t* fc = g_f.row(i);
    for (int j = start; j <= end; ++j) {
      int64_t s = ep[j] + SCORE_GAPEXTEND;
      int64_t v = mp[j] + go_ge;
      ec[j] = v > s ? v : s;
      s = fc[j - 1] + SCORE_GAPEXTEND;
      v = mc[j - 1] + go_ge;
      fc[j] = v > s ? v : s;
      s = mp[j - 1] + (row_eq[j - 1] ? SCORE_MATCH : SCORE_MISMATCH);
      if (ec[j] > s) s = ec[j];
      if (fc[j] > s) s = fc[j];
      mc[j] = s;
    }
  }
}

// Traceback shared by GlobalAlignment (delete_vs: e) and the PosWeight
// affine variant (delete_vs: m).  Appends in reverse, then flips.
int affine_traceback(int lent, int ti, int tj, bool delete_vs_m,
                     int8_t* out) {
  int n = 0;
  int mat = 0;
  const int64_t go_ge = SCORE_GAPOPEN + SCORE_GAPEXTEND;
  while (ti > 0 || tj > 0) {
    if (mat == 0) {
      int a = EDIT_INSERT;
      int64_t cmp = delete_vs_m ? g_m.row(ti)[tj] : g_e.row(ti)[tj];
      if (g_f.row(ti)[tj] >= cmp) a = EDIT_DELETE;
      if (ti > 0 && tj > 0) {
        int64_t diff = g_eq[(size_t)(ti - 1) * lent + (tj - 1)]
                           ? SCORE_MATCH
                           : SCORE_MISMATCH;
        if (g_m.row(ti - 1)[tj - 1] + diff == g_m.row(ti)[tj])
          a = (diff == SCORE_MATCH) ? EDIT_MATCH : EDIT_MISMATCH;
      }
      if (a == EDIT_MATCH || a == EDIT_MISMATCH) {
        out[n++] = (int8_t)a;
        --ti;
        --tj;
      } else if (a == EDIT_INSERT) {
        mat = 1;
      } else {
        mat = 2;
      }
    } else if (mat == 1) {
      out[n++] = EDIT_INSERT;
      if (ti > 0) {
        if (g_m.row(ti - 1)[tj] + go_ge == g_e.row(ti)[tj]) {
          --ti;
          mat = 0;
        } else {
          --ti;
        }
      } else {
        mat = 2;
      }
    } else {
      out[n++] = EDIT_DELETE;
      if (tj > 0) {
        if (g_m.row(ti)[tj - 1] + go_ge == g_f.row(ti)[tj]) {
          --tj;
          mat = 0;
        } else {
          --tj;
        }
      } else {
        mat = 1;
      }
    }
  }
  for (int a = 0, b = n - 1; a < b; ++a, --b) {
    int8_t tmp = out[a];
    out[a] = out[b];
    out[b] = tmp;
  }
  return n;
}

}  // namespace

extern "C" {

int64_t t4_global_alignment(const char* t, int lent, const char* p, int lenp,
                            int8_t* out, int* out_len) {
  if (lent == 0 || lenp == 0) {
    *out_len = 0;
    return 0;
  }
  if (lent == 1 && lenp == 1) {
    if (chars_equal(t[0], p[0])) {
      out[0] = EDIT_MATCH;
      *out_len = 1;
      return SCORE_MATCH;
    }
    out[0] = EDIT_MISMATCH;
    *out_len = 1;
    return SCORE_MISMATCH;
  }
  int lb = 5, rb = 5;
  if (lent > lenp)
    rb += lent - lenp;
  else if (lent < lenp)
    lb += lenp - lent;
  const int W = lb + rb + 1;
  const int64_t neg_inf = (int64_t)(lent + 1) * (lenp + 1) * SCORE_GAPOPEN;
  const int64_t go_ge = SCORE_GAPOPEN + SCORE_GAPEXTEND;

  // g_bm is shared with the linear-gap variant (which grows it alone), so
  // each buffer's capacity must be checked independently.
  if ((size_t)(lenp + 1) * W > g_bm.size())
    g_bm.resize((size_t)(lenp + 1) * W);
  if ((size_t)(lenp + 1) * W > g_be.size()) {
    g_be.resize((size_t)(lenp + 1) * W);
    g_bf.resize((size_t)(lenp + 1) * W);
  }

  // Accessors reproduce the rectangular implementation exactly: full row-0
  // and column-0 initializer formulas (incl. the stale-loop-variable e-row
  // quirk, AlignAlgo.hpp:271) and the neg_inf constant everywhere outside
  // the written band.
  auto get_m = [&](int i, int j) -> int64_t {
    if (j < 0 || j > lent) return neg_inf;
    if (i == 0)
      return j == 0 ? 0 : SCORE_GAPOPEN + (int64_t)j * SCORE_GAPOPEN;
    if (j == 0) return SCORE_GAPOPEN + (int64_t)i * SCORE_GAPOPEN;
    int k = j - i + lb;
    if (k < 0 || k >= W) return neg_inf;
    return g_bm[(size_t)i * W + k];
  };
  auto get_e = [&](int i, int j) -> int64_t {
    if (j < 0 || j > lent) return neg_inf;
    if (i == 0)
      return j == 0 ? 0
                    : SCORE_GAPOPEN + (int64_t)(lenp + 1) * SCORE_GAPOPEN;
    if (j == 0) return SCORE_GAPOPEN + (int64_t)i * SCORE_GAPEXTEND;
    int k = j - i + lb;
    if (k < 0 || k >= W) return neg_inf;
    return g_be[(size_t)i * W + k];
  };
  auto get_f = [&](int i, int j) -> int64_t {
    if (j < 0 || j > lent) return neg_inf;
    if (i == 0)
      return j == 0 ? 0 : SCORE_GAPOPEN + (int64_t)j * SCORE_GAPEXTEND;
    if (j == 0) return SCORE_GAPOPEN + (int64_t)i * SCORE_GAPOPEN;
    int k = j - i + lb;
    if (k < 0 || k >= W) return neg_inf;
    return g_bf[(size_t)i * W + k];
  };

  for (int i = 1; i <= lenp; ++i) {
    int start = i - lb;
    if (start < 1) start = 1;
    int end = i + rb;
    if (end > lent) end = lent;
    char pc = p[i - 1];
    int64_t* rm = g_bm.data() + (size_t)i * W;
    int64_t* re = g_be.data() + (size_t)i * W;
    int64_t* rf = g_bf.data() + (size_t)i * W;
    for (int k = 0; k < start - i + lb; ++k) rm[k] = re[k] = rf[k] = neg_inf;
    for (int k = end - i + lb + 1; k < W; ++k) rm[k] = re[k] = rf[k] = neg_inf;
    int64_t m_ul = get_m(i - 1, start - 1);
    int64_t m_left = get_m(i, start - 1);
    int64_t f_left = get_f(i, start - 1);
    const int64_t* pm = g_bm.data() + (size_t)(i - 1) * W;
    const int64_t* pe = g_be.data() + (size_t)(i - 1) * W;
    const int64_t e_row0 =
        SCORE_GAPOPEN + (int64_t)(lenp + 1) * SCORE_GAPOPEN;
    for (int j = start; j <= end; ++j) {
      int k = j - i + lb;
      int64_t e_up, m_up;
      if (i == 1) {  // row-0 formulas (incl. the stale-e quirk)
        e_up = e_row0;
        m_up = SCORE_GAPOPEN + (int64_t)j * SCORE_GAPOPEN;
      } else if (k + 1 < W) {
        e_up = pe[k + 1];
        m_up = pm[k + 1];
      } else {
        e_up = neg_inf;
        m_up = neg_inf;
      }
      int64_t ev = m_up + go_ge;
      int64_t es = e_up + SCORE_GAPEXTEND;
      int64_t ec = ev > es ? ev : es;
      int64_t fv = m_left + go_ge;
      int64_t fs = f_left + SCORE_GAPEXTEND;
      int64_t fc = fv > fs ? fv : fs;
      int64_t mc =
          m_ul + (chars_equal(t[j - 1], pc) ? SCORE_MATCH : SCORE_MISMATCH);
      if (ec > mc) mc = ec;
      if (fc > mc) mc = fc;
      re[k] = ec;
      rf[k] = fc;
      rm[k] = mc;
      m_ul = m_up;
      m_left = mc;
      f_left = fc;
    }
  }
  int64_t ret = get_m(lenp, lent);

  // affine_traceback with delete_vs e (AlignAlgo.hpp:174-203), via the
  // banded accessors.
  int n = 0;
  int mat = 0;
  int ti = lenp, tj = lent;
  while (ti > 0 || tj > 0) {
    if (mat == 0) {
      int a = EDIT_INSERT;
      int64_t cmp = get_e(ti, tj);
      if (get_f(ti, tj) >= cmp) a = EDIT_DELETE;
      if (ti > 0 && tj > 0) {
        int64_t diff =
            chars_equal(t[tj - 1], p[ti - 1]) ? SCORE_MATCH : SCORE_MISMATCH;
        if (get_m(ti - 1, tj - 1) + diff == get_m(ti, tj))
          a = (diff == SCORE_MATCH) ? EDIT_MATCH : EDIT_MISMATCH;
      }
      if (a == EDIT_MATCH || a == EDIT_MISMATCH) {
        out[n++] = (int8_t)a;
        --ti;
        --tj;
      } else if (a == EDIT_INSERT) {
        mat = 1;
      } else {
        mat = 2;
      }
    } else if (mat == 1) {
      out[n++] = EDIT_INSERT;
      if (ti > 0) {
        if (get_m(ti - 1, tj) + go_ge == get_e(ti, tj)) {
          --ti;
          mat = 0;
        } else {
          --ti;
        }
      } else {
        mat = 2;
      }
    } else {
      out[n++] = EDIT_DELETE;
      if (tj > 0) {
        if (get_m(ti, tj - 1) + go_ge == get_f(ti, tj)) {
          --tj;
          mat = 0;
        } else {
          --tj;
        }
      } else {
        mat = 1;
      }
    }
  }
  for (int a = 0, b = n - 1; a < b; ++a, --b) {
    int8_t tmp = out[a];
    out[a] = out[b];
    out[b] = tmp;
  }
  *out_len = n;
  return ret;
}

int64_t t4_global_alignment_posweight_affine(const int32_t* w, int lent,
                                             const char* p, int lenp,
                                             int8_t* out, int* out_len) {
  if (lent == 0 || lenp == 0) {
    *out_len = 0;
    return 0;
  }
  if (lent == 1 && lenp == 1) {
    if (is_base_equal(w, p[0])) {
      out[0] = EDIT_MATCH;
      *out_len = 1;
      return SCORE_MATCH;
    }
    out[0] = EDIT_MISMATCH;
    *out_len = 1;
    return SCORE_MISMATCH;
  }
  build_eq_posweight(w, lent, p, lenp);
  affine_fill(lent, lenp, 5, 5);
  int64_t ret = g_m.row(lenp)[lent];
  *out_len = affine_traceback(lent, lenp, lent, true, out);
  return ret;
}

int64_t t4_global_alignment_one_end(const char* t, int lent, const char* p,
                                    int lenp, int64_t threshold, double factor,
                                    int8_t* out, int* out_len) {
  if (lent == 0 || lenp == 0) {
    *out_len = 0;
    return 0;
  }
  build_eq_string(t, lent, p, lenp);
  affine_fill(lent, lenp, -1, -1);
  const double mix = 0.8 * (double)SCORE_MATCH + 0.2 * (double)SCORE_MISMATCH;
  int64_t best = threshold;
  int ti = 0, tj = 0;
  for (int i = 0; i <= lenp; ++i) {
    const int64_t* row = g_m.row(i);
    for (int j = 0; j <= lent; ++j) {
      int64_t v = row[j];
      int64_t score_threshold =
          (int64_t)(((double)(i + j) * 0.5) * mix * factor);
      if (v < score_threshold) continue;
      if (v > best) {
        best = v;
        ti = i;
        tj = j;
      }
    }
  }
  int64_t ret = g_m.row(ti)[tj];
  *out_len = affine_traceback(lent, ti, tj, false, out);
  return ret;
}

int64_t t4_global_alignment_posweight(const int32_t* w, int lent,
                                      const char* p, int lenp, int8_t* out,
                                      int* out_len) {
  if (lent == 0 || lenp == 0) {
    *out_len = 0;
    return 0;
  }
  if (lent == 1 && lenp == 1) {
    if (is_base_equal(w, p[0])) {
      out[0] = EDIT_MATCH;
      *out_len = 1;
      return SCORE_MATCH;
    }
    out[0] = EDIT_MISMATCH;
    *out_len = 1;
    return SCORE_MISMATCH;
  }

  if (lent == lenp) {
    // No-indel fast path (AlignAlgo.hpp:81-103); diagonal equality only.
    int64_t score = 0;
    for (int i = 0; i < lent; ++i)
      score += is_base_equal(w + 4 * i, p[i]) ? SCORE_MATCH : SCORE_MISMATCH;
    if (score >= lent * SCORE_MATCH + 2 * SCORE_INDEL) {
      for (int i = 0; i < lent; ++i)
        out[i] = is_base_equal(w + 4 * i, p[i]) ? EDIT_MATCH : EDIT_MISMATCH;
      *out_len = lent;
      return score;
    }
  }

  int lb = 5, rb = 5;
  if (lent > lenp)
    rb += lent - lenp;
  else if (lent < lenp)
    lb += lenp - lent;
  const int W = lb + rb + 1;
  const int64_t neg_inf = (int64_t)(lent + 1) * (lenp + 1) * SCORE_INDEL;

  if ((size_t)(lenp + 1) * W > g_bm.size())
    g_bm.resize((size_t)(lenp + 1) * W);
  auto get = [&](int i, int j) -> int64_t {
    if (j < 0 || j > lent) return neg_inf;
    if (i == 0) return j == 0 ? 0 : SCORE_INDEL + (int64_t)j * SCORE_INDEL;
    if (j == 0) return SCORE_INDEL + (int64_t)i * SCORE_INDEL;
    int k = j - i + lb;
    if (k < 0 || k >= W) return neg_inf;
    return g_bm[(size_t)i * W + k];
  };

  for (int i = 1; i <= lenp; ++i) {
    int start = i - lb;
    if (start < 1) start = 1;
    int end = i + rb;
    if (end > lent) end = lent;
    char pc = p[i - 1];
    int64_t* row = g_bm.data() + (size_t)i * W;
    // Unwritten band-edge cells must read as the exact neg_inf constant
    // (the rectangular implementation's out-of-window value).
    for (int k = 0; k < start - i + lb; ++k) row[k] = neg_inf;
    for (int k = end - i + lb + 1; k < W; ++k) row[k] = neg_inf;
    int64_t up_left = get(i - 1, start - 1);   // m[i-1][j-1]
    int64_t left = get(i, start - 1);          // m[i][j-1]
    const int64_t* prow = g_bm.data() + (size_t)(i - 1) * W;
    if (i == 1) {
      for (int j = start; j <= end; ++j) {
        int k = j - i + lb;
        int64_t up = SCORE_INDEL + (int64_t)j * SCORE_INDEL;  // row-0 formula
        int64_t score =
            up_left + (is_base_equal(w + 4 * (j - 1), pc) ? SCORE_MATCH
                                                          : SCORE_MISMATCH);
        int64_t v = left + SCORE_INDEL;
        if (v > score) score = v;
        v = up + SCORE_INDEL;
        if (v > score) score = v;
        row[k] = score;
        up_left = up;
        left = score;
      }
    } else {
      for (int j = start; j <= end; ++j) {
        int k = j - i + lb;
        int64_t up = (k + 1 < W) ? prow[k + 1] : neg_inf;
        int64_t score =
            up_left + (is_base_equal(w + 4 * (j - 1), pc) ? SCORE_MATCH
                                                          : SCORE_MISMATCH);
        int64_t v = left + SCORE_INDEL;
        if (v > score) score = v;
        v = up + SCORE_INDEL;
        if (v > score) score = v;
        row[k] = score;
        up_left = up;
        left = score;
      }
    }
  }
  int64_t ret = get(lenp, lent);

  // Last-writer-wins traceback (AlignAlgo.hpp:168-211).
  int n = 0;
  int ti = lenp, tj = lent;
  while (ti > 0 || tj > 0) {
    int64_t mx = get(ti, tj);
    int a = 0;
    if (tj > 0 && get(ti, tj - 1) + SCORE_INDEL == mx) a = EDIT_DELETE;
    if (ti > 0 && get(ti - 1, tj) + SCORE_INDEL == mx) a = EDIT_INSERT;
    if (tj > 0 && ti > 0) {
      int64_t diff = is_base_equal(w + 4 * (tj - 1), p[ti - 1])
                         ? SCORE_MATCH
                         : SCORE_MISMATCH;
      if (get(ti - 1, tj - 1) + diff == mx)
        a = (diff == SCORE_MATCH) ? EDIT_MATCH : EDIT_MISMATCH;
    }
    out[n++] = (int8_t)a;
    if (a == EDIT_DELETE) {
      --tj;
    } else if (a == EDIT_INSERT) {
      --ti;
    } else {
      --ti;
      --tj;
    }
  }
  for (int a = 0, b = n - 1; a < b; ++a, --b) {
    int8_t tmp = out[a];
    out[a] = out[b];
    out[b] = tmp;
  }
  *out_len = n;
  return ret;
}

int64_t t4_local_alignment(const char* t, int lent, const char* p, int lenp,
                           int* tstart, int* pstart, int8_t* out,
                           int* out_len) {
  g_m.init(lenp + 1, lent + 1, 0);
  g_eq.assign((size_t)(lenp > 0 ? lenp : 1) * (lent > 0 ? lent : 1), 0);
  for (int i = 0; i < lenp; ++i) {
    uint8_t* row = g_eq.data() + (size_t)i * lent;
    for (int j = 0; j < lent; ++j) row[j] = (p[i] == t[j]);
  }
  for (int i = 1; i <= lenp; ++i) {
    const uint8_t* row_eq = g_eq.data() + (size_t)(i - 1) * lent;
    const int64_t* prev = g_m.row(i - 1);
    int64_t* cur = g_m.row(i);
    for (int j = 1; j <= lent; ++j) {
      int64_t s = prev[j - 1] +
                  (row_eq[j - 1] ? SCORE_MATCH_LOCAL : SCORE_MISMATCH_LOCAL);
      int64_t v = cur[j - 1] + SCORE_INDEL;
      if (v > s) s = v;
      v = prev[j] + SCORE_INDEL;
      if (v > s) s = v;
      cur[j] = s > 0 ? s : 0;
    }
  }
  int64_t max_score = 0;
  int ti = lenp, tj = lent;
  for (int i = 0; i <= lenp; ++i) {
    const int64_t* row = g_m.row(i);
    for (int j = 0; j <= lent; ++j) {
      if (row[j] >= max_score) {
        max_score = row[j];
        ti = i;
        tj = j;
      }
    }
  }
  if (max_score == 0) {
    *tstart = 0;
    *pstart = 0;
    *out_len = 0;
    return -1;
  }
  *tstart = 0;
  *pstart = 0;
  int n = 0;
  while (ti > 0 || tj > 0) {
    int64_t mx = g_m.row(ti)[tj];
    int a = 0;
    if (mx == 0) {
      *tstart = tj;
      *pstart = ti;
      break;
    }
    if (tj > 0 && g_m.row(ti)[tj - 1] + SCORE_INDEL == mx) a = EDIT_DELETE;
    if (ti > 0 && g_m.row(ti - 1)[tj] + SCORE_INDEL == mx) a = EDIT_INSERT;
    if (tj > 0 && ti > 0) {
      int64_t diff = g_eq[(size_t)(ti - 1) * lent + (tj - 1)]
                         ? SCORE_MATCH_LOCAL
                         : SCORE_MISMATCH_LOCAL;
      if (g_m.row(ti - 1)[tj - 1] + diff == mx)
        a = (diff == SCORE_MATCH_LOCAL) ? EDIT_MATCH : EDIT_MISMATCH;
    }
    out[n++] = (int8_t)a;
    if (a == EDIT_DELETE) {
      --tj;
    } else if (a == EDIT_INSERT) {
      --ti;
    } else {
      --ti;
      --tj;
    }
  }
  for (int a = 0, b = n - 1; a < b; ++a, --b) {
    int8_t tmp = out[a];
    out[a] = out[b];
    out[b] = tmp;
  }
  *out_len = n;
  return max_score;
}

// Mate-overlap detection (reference: AlignAlgo.hpp:1027-1096).
int t4_is_mate_overlap(const char* fr, int flen, const char* sr, int slen,
                       int min_overlap, int check_tandem, int* offset_out,
                       int* best_match_out) {
  int64_t best_match_cnt = -1;
  int offset_cnt = 0;
  int offset = -1;
  int overlap_size = -1;
  for (int j = 0; j < flen - min_overlap; ++j) {
    int match_cnt = 0;
    bool flag = true;
    double sim;
    if (flen - j >= 100)
      sim = 0.85;
    else if (flen - j >= 50)
      sim = 0.85 + (double)(flen - j - 50) / 50.0 * 0.1;
    else
      sim = 0.95;
    int k = 0;
    while (j + k < flen && k < slen) {
      if (fr[j + k] == sr[k]) ++match_cnt;
      if (match_cnt + (flen - (j + k) - 1) < (int)((double)(flen - j) * sim)) {
        flag = false;
        break;
      }
      ++k;
    }
    if (flag) {
      offset = j;
      ++offset_cnt;
      overlap_size = k;
      best_match_cnt = match_cnt;
    }
  }
  *best_match_out = (int)best_match_cnt;
  if (offset_cnt != 1) {
    *offset_out = -1;
    return -1;
  }
  *offset_out = offset;
  if (check_tandem && overlap_size <= min_overlap * 2) {
    for (int i = 1; i <= overlap_size / 2; ++i) {
      bool tandem = true;
      int j = i;
      while (j + i - 1 < overlap_size) {
        bool ok = true;
        for (int k = j; k < j + i; ++k) {
          if (sr[k - j] != sr[k]) {
            ok = false;
            break;
          }
        }
        if (!ok) {
          tandem = false;
          break;
        }
        j += i;
      }
      if (tandem) {
        return -1;
      }
    }
  }
  return overlap_size;
}


// Counts-only variants: same DP, but return only (match, mismatch, indel)
// tallies of the edit script — avoids marshaling scripts across the FFI
// for the gap-fill calls in overlap scoring (engine/overlap.py:_gap_fill_align).
int64_t t4_global_alignment_counts(const char* t, int lent, const char* p,
                                   int lenp, int* out3) {
  static thread_local std::vector<int8_t> buf;
  buf.resize((size_t)lent + lenp + 2);
  int n = 0;
  int64_t score = t4_global_alignment(t, lent, p, lenp, buf.data(), &n);
  int m = 0, mm = 0, ind = 0;
  for (int i = 0; i < n; i++) {
    if (buf[i] == 0)
      m++;
    else if (buf[i] == 1)
      mm++;
    else
      ind++;
  }
  out3[0] = m;
  out3[1] = mm;
  out3[2] = ind;
  return score;
}

int64_t t4_global_alignment_posweight_counts(const int32_t* w, int lent,
                                             const char* p, int lenp,
                                             int* out3) {
  static thread_local std::vector<int8_t> buf;
  buf.resize((size_t)lent + lenp + 2);
  int n = 0;
  int64_t score = t4_global_alignment_posweight(w, lent, p, lenp, buf.data(), &n);
  int m = 0, mm = 0, ind = 0;
  for (int i = 0; i < n; i++) {
    if (buf[i] == 0)
      m++;
    else if (buf[i] == 1)
      mm++;
    else
      ind++;
  }
  out3[0] = m;
  out3[1] = mm;
  out3[2] = ind;
  return score;
}


// Chain walk of GetOverlapsFromRead (engine/overlap.py:810-868; reference
// SeqSet.hpp:1829-2007): accumulate match/mismatch/indel counts along the
// hit chain, running the banded gap-fill DP over inter-anchor gaps
// (consensus-vs-read for refs, posWeight-vs-read for novel contigs).
// coords = (read_off, seq_off) int32 pairs.  out[4] = {match_cnt,
// mismatch_cnt, indel_cnt, similarity_zero}.
void t4_chain_score(const int32_t* coords, int n_coords, int kl, int radius,
                    int nomatch_gap_limit, int is_ref, const char* consensus,
                    const int32_t* posweight, const char* r, int64_t* out) {
  int64_t match_cnt = 2 * kl;
  int64_t mismatch_cnt = 0, indel_cnt = 0;
  int sim_zero = 0;
  int cnts[3];

  auto gap_fill = [&](int seq_from, int seq_to, int read_from, int read_to) {
    if (is_ref) {
      // Content-keyed memo: IMGT alleles are near-duplicates, so the same
      // (target, read) gap pair recurs ~25x across an annotation batch
      // (measured on a 10k-contig corpus).  Keying on the actual segment
      // bytes makes the cache correct by construction — identical inputs
      // give identical counts regardless of which seq produced them.
      static thread_local std::unordered_map<std::string, std::array<int, 3>>
          memo;
      static thread_local std::string key;
      key.assign(consensus + seq_from, seq_to - seq_from);
      key.push_back('\x01');
      key.append(r + read_from, read_to - read_from);
      auto it = memo.find(key);
      if (it != memo.end()) {
        cnts[0] = it->second[0];
        cnts[1] = it->second[1];
        cnts[2] = it->second[2];
        return;
      }
      t4a_prof_fill(seq_to - seq_from, read_to - read_from);
      t4_global_alignment_counts(consensus + seq_from, seq_to - seq_from,
                                 r + read_from, read_to - read_from, cnts);
      if (memo.size() >= (1u << 20)) memo.clear();  // bound per-thread RSS
      memo.emplace(key, std::array<int, 3>{cnts[0], cnts[1], cnts[2]});
    } else {
      t4a_prof_fill(seq_to - seq_from, read_to - read_from);
      t4_global_alignment_posweight_counts(posweight + 4 * seq_from,
                                           seq_to - seq_from, r + read_from,
                                           read_to - read_from, cnts);
    }
  };

  for (int j = 1; j < n_coords; j++) {
    int pa = coords[2 * (j - 1)], pb = coords[2 * (j - 1) + 1];
    int ca = coords[2 * j], cb = coords[2 * j + 1];
    if (pb - pa == cb - ca) {
      if (pa + kl - 1 >= ca) {
        match_cnt += 2 * (ca - pa);
      } else {
        match_cnt += 2 * kl;
        if (cb - (pb + kl) > nomatch_gap_limit ||
            ca - (pa + kl) > nomatch_gap_limit) {
          sim_zero = 1;
          break;
        }
        gap_fill(pb + kl, cb, pa + kl, ca);
        match_cnt += 2 * cnts[0];
        mismatch_cnt += cnts[1];
        indel_cnt += cnts[2];
        if ((radius == 0 || !is_ref) && indel_cnt > 0) {
          sim_zero = 1;
          break;
        }
      }
    } else {
      if (radius == 0 || !is_ref) {
        sim_zero = 1;
        break;
      }
      if (pa + kl - 1 >= ca && pb + kl - 1 < cb) {
        match_cnt += 2 * (ca - pa);
        indel_cnt += (cb - (pb + kl)) + (ca + kl - pa);
      } else if (pa + kl - 1 < ca && pb + kl - 1 >= cb) {
        match_cnt += 2 * (cb - pb);
        indel_cnt += (ca - (pa + kl)) + (cb + kl - pb);
      } else if (pa + kl - 1 >= ca && pb + kl - 1 >= cb) {
        int64_t a = ca - pa, b = cb - pb;
        match_cnt += 2 * (a < b ? a : b);
        int64_t d = (int64_t)(ca - cb) - (pa - pb);
        indel_cnt += d < 0 ? -d : d;
      } else {
        match_cnt += 2 * kl;
        if (cb - (pb + kl) > nomatch_gap_limit ||
            ca - (pa + kl) > nomatch_gap_limit) {
          sim_zero = 1;
          break;
        }
        gap_fill(pb + kl, cb, pa + kl, ca);
        match_cnt += 2 * cnts[0];
        mismatch_cnt += cnts[1];
        indel_cnt += cnts[2];
        if (!is_ref && indel_cnt > 0) {
          sim_zero = 1;
          break;
        }
      }
    }
  }
  out[0] = match_cnt;
  out[1] = mismatch_cnt;
  out[2] = indel_cnt;
  out[3] = sim_zero;
}

// Chain walk + the overlap low-complexity test (SeqSet.hpp:590-617) in one
// call: out[5] = {match, mismatch, indel, sim_zero, low_complex}.
void t4_chain_score2(const int32_t* coords, int n_coords, int kl, int radius,
                     int nomatch_gap_limit, int is_ref, const char* consensus,
                     const int32_t* posweight, const char* r, int read_start,
                     int read_end, int64_t* out) {
  t4_chain_score(coords, n_coords, kl, radius, nomatch_gap_limit, is_ref,
                 consensus, posweight, r, out);
  long cnt[4] = {0, 0, 0, 0};
  for (int i = read_start; i <= read_end; i++) {
    switch (r[i]) {
      case 'A': cnt[0]++; break;
      case 'C': cnt[1]++; break;
      case 'G': cnt[2]++; break;
      case 'T': cnt[3]++; break;
      default: break;  // N skipped
    }
  }
  long low_cnt = 0, low_total = 0;
  for (int i = 0; i < 4; i++) {
    if (cnt[i] <= 2) {
      low_cnt++;
      low_total += cnt[i];
    }
  }
  int low;
  if (low_total * 7 >= read_end - read_start + 1)
    low = 0;
  else
    low = low_cnt >= 2 ? 1 : 0;
  out[4] = low;
}

// Batched per-query chain scoring: one FFI call for all of a query's
// overlaps.  per_meta rows of 5 int32: {coord_cnt, is_ref, strand(1/-1),
// read_start, read_end}; coord_ptrs / seq_ptrs are per-overlap raw
// pointers (consensus bytes for refs, posWeight int32 for novels).
void t4_chain_score_batch(const int64_t* coord_ptrs, const int32_t* per_meta,
                          const int64_t* seq_ptrs, int n_ov, int kl,
                          int radius, int nomatch_gap_limit,
                          const char* read_fwd, const char* read_rc,
                          int64_t* out /* (n_ov, 5) */) {
  for (int i = 0; i < n_ov; i++) {
    const int32_t* m = per_meta + 5 * i;
    const char* r = m[2] == 1 ? read_fwd : read_rc;
    const int32_t* coords = (const int32_t*)(intptr_t)coord_ptrs[i];
    const char* consensus =
        m[1] ? (const char*)(intptr_t)seq_ptrs[i] : nullptr;
    const int32_t* pw =
        m[1] ? nullptr : (const int32_t*)(intptr_t)seq_ptrs[i];
    t4_chain_score2(coords, m[0], kl, radius, nomatch_gap_limit, m[1],
                    consensus, pw, r, m[3], m[4], out + 5 * i);
  }
}


// ExtendOverlap core (engine/overlap.py:extend_overlap; reference
// SeqSet.hpp:1165-1277): both overhang profile-DPs plus the edit-script
// tallies and >75%-match prefix scans in one call.
// out8 = {ret, left, right, good_left, good_right, match_cnt,
//         mismatch_cnt, indel_cnt}; the caller applies the mismatch-
//         density and similarity-threshold rules.
void t4_extend_overlap(const int32_t* w, const char* r, int read_len,
                       int seq_len, int read_start, int read_end,
                       int seq_start, int seq_end, int64_t* out8) {
  static thread_local std::vector<int8_t> buf;
  int64_t ret = 1;
  int64_t left = read_start < seq_start ? read_start : seq_start;
  int64_t match_cnt = 0, mismatch_cnt = 0, indel_cnt = 0;

  buf.resize((size_t)(2 * left + 2 + 4));
  int n1 = 0;
  t4_global_alignment_posweight(w + 4 * (seq_start - left), (int)left,
                                r + (read_start - left), (int)left,
                                buf.data(), &n1);
  for (int i = 0; i < n1; i++) {
    if (buf[i] == 0)
      match_cnt++;
    else if (buf[i] == 1)
      mismatch_cnt++;
    else
      indel_cnt++;
  }
  if (indel_cnt > 0) {
    left = 0;
    ret = 0;
  }
  int64_t good_left = 0;
  {
    int64_t tmp_match = 0;
    int64_t k = 1;
    for (int idx = n1 - 1; idx >= 0; idx--) {
      int8_t a = buf[idx];
      if (a == 0) {
        tmp_match++;
        if ((double)tmp_match > 0.75 * (double)k) good_left = k;
      } else if (a != 1) {
        break;
      }
      k++;
    }
  }

  int64_t right_a = read_len - 1 - read_end;
  int64_t right_b = seq_len - 1 - seq_end;
  int64_t right = right_a < right_b ? right_a : right_b;
  buf.resize((size_t)(2 * right + 2 + 4));
  int n2 = 0;
  t4_global_alignment_posweight(w + 4 * (seq_end + 1), (int)right,
                                r + (read_end + 1), (int)right, buf.data(),
                                &n2);
  int64_t old_indel = indel_cnt;
  for (int i = 0; i < n2; i++) {
    if (buf[i] == 0)
      match_cnt++;
    else if (buf[i] == 1)
      mismatch_cnt++;
    else
      indel_cnt++;
  }
  if (indel_cnt > old_indel) {
    right = 0;
    ret = 0;
  }
  int64_t good_right = 0;
  {
    int64_t tmp_match = 0;
    for (int idx = 0; idx < n2; idx++) {
      int8_t a = buf[idx];
      if (a == 0) {
        tmp_match++;
        if ((double)tmp_match > 0.75 * (double)(idx + 1)) good_right = idx + 1;
      } else if (a != 1) {
        break;
      }
    }
  }

  out8[0] = ret;
  out8[1] = left;
  out8[2] = right;
  out8[3] = good_left;
  out8[4] = good_right;
  out8[5] = match_cnt;
  out8[6] = mismatch_cnt;
  out8[7] = indel_cnt;
}

}  // extern "C"\n
// ---------------------------------------------------------------------------
// Device-traceback decode: replay the reference traceback DFA
// (AlignAlgo.hpp:174-203 / affine_traceback above) over the per-cell
// decision bits emitted by the Pallas kernel
// (trust4_tpu/ops/dp_pallas.py banded_affine_dirs_pallas):
//   bit0: f >= e   bit1: diag accepted   bit2: e opened   bit3: f opened
// In-band cells consume the bits; row-0 / column-0 / out-of-band cells are
// evaluated analytically from the exact boundary formulas, so the decoded
// edit script is bit-identical to t4_global_alignment's.
// ---------------------------------------------------------------------------

extern "C" {

int t4_decode_dirs(const int8_t* dirs /* (p_rows, w) row-major */, int w,
                   int lent, int lenp, const char* t, const char* p,
                   int left, int8_t* out, int* out_len) {
  const int64_t go = SCORE_GAPOPEN, ge = SCORE_GAPEXTEND;
  const int64_t go_ge = go + ge;
  const int64_t neg_inf = (int64_t)(lent + 1) * (lenp + 1) * go;
  auto m_val = [&](int i, int j) -> int64_t {
    // analytic cells only (row 0 / col 0 / out of band)
    if (i == 0) return j == 0 ? 0 : go + (int64_t)j * go;
    if (j == 0) return go + (int64_t)i * go;
    return neg_inf;
  };
  auto e_val = [&](int i, int j) -> int64_t {
    if (i == 0) return j == 0 ? 0 : go + (int64_t)(lenp + 1) * go;
    if (j == 0) return go + (int64_t)i * ge;
    return neg_inf;
  };
  auto f_val = [&](int i, int j) -> int64_t {
    if (i == 0) return j == 0 ? 0 : go + (int64_t)j * ge;
    if (j == 0) return go + (int64_t)i * go;
    return neg_inf;
  };
  auto in_band = [&](int i, int j) -> bool {
    if (i < 1 || j < 1 || j > lent) return false;
    int k = j - i + left;
    return k >= 0 && k < w;
  };
  auto bits_at = [&](int i, int j) -> int {
    return dirs[(size_t)(i - 1) * w + (j - i + left)];
  };

  int n = 0;
  int mat = 0;
  int ti = lenp, tj = lent;
  while (ti > 0 || tj > 0) {
    if (mat == 0) {
      int a = EDIT_INSERT;
      bool ib = in_band(ti, tj);
      bool fe;
      if (ib) {
        fe = (bits_at(ti, tj) & 1) != 0;
      } else {
        fe = f_val(ti, tj) >= e_val(ti, tj);
      }
      if (fe) a = EDIT_DELETE;
      if (ti > 0 && tj > 0) {
        bool diag_ok = ib ? ((bits_at(ti, tj) & 2) != 0) : false;
        if (diag_ok) {
          bool eqc = chars_equal(t[tj - 1], p[ti - 1]);
          a = eqc ? EDIT_MATCH : EDIT_MISMATCH;
        }
      }
      if (a == EDIT_MATCH || a == EDIT_MISMATCH) {
        out[n++] = (int8_t)a;
        --ti;
        --tj;
      } else if (a == EDIT_INSERT) {
        mat = 1;
      } else {
        mat = 2;
      }
    } else if (mat == 1) {
      out[n++] = EDIT_INSERT;
      if (ti > 0) {
        bool opened;
        if (in_band(ti, tj)) {
          opened = (bits_at(ti, tj) & 4) != 0;
        } else {
          // e[ti][tj] analytic; the m side is analytic-or-unknown, but an
          // unknown (in-band) m never equals an analytic e (neg_inf or a
          // boundary formula) shifted by GO+GE when e is neg_inf.
          int64_t ev = e_val(ti, tj);
          int64_t mv = (ti - 1 == 0 || tj == 0 || !in_band(ti - 1, tj))
                           ? m_val(ti - 1, tj)
                           : neg_inf - 1;  // unknown in-band: can't match
          opened = (ev != neg_inf || mv != neg_inf - 1) &&
                   (mv + go_ge == ev);
        }
        if (opened) {
          --ti;
          mat = 0;
        } else {
          --ti;
        }
      } else {
        mat = 2;
      }
    } else {
      out[n++] = EDIT_DELETE;
      if (tj > 0) {
        bool opened;
        if (in_band(ti, tj)) {
          opened = (bits_at(ti, tj) & 8) != 0;
        } else {
          int64_t fv = f_val(ti, tj);
          int64_t mv = (ti == 0 || tj - 1 == 0 || !in_band(ti, tj - 1))
                           ? m_val(ti, tj - 1)
                           : neg_inf - 1;
          opened = (fv != neg_inf || mv != neg_inf - 1) &&
                   (mv + go_ge == fv);
        }
        if (opened) {
          --tj;
          mat = 0;
        } else {
          --tj;
        }
      } else {
        mat = 1;
      }
    }
    if (n > lent + lenp + 2) return -1;  // malformed bits guard
  }
  for (int a = 0, b = n - 1; a < b; ++a, --b) {
    int8_t tmp = out[a];
    out[a] = out[b];
    out[b] = tmp;
  }
  *out_len = n;
  return 0;
}

// Batched count decode: per job j, dirs block at dirs + job_off[j]*w,
// meta rows {lent, lenp, t_off, p_off, left, p_rows}; emits
// (match, mismatch, indel) triples.  Returns 0, or -1 when any job's bits
// are malformed (caller falls back to the CPU DP).
int t4_decode_dirs_counts_batch(const int8_t* dirs, const int64_t* job_off,
                                const int32_t* meta6, int n_jobs, int w,
                                const char* t_blob, const char* p_blob,
                                int32_t* out3) {
  static thread_local std::vector<int8_t> buf;
  for (int j = 0; j < n_jobs; j++) {
    const int32_t* m = meta6 + 6 * j;
    int lent = m[0], lenp = m[1];
    buf.resize((size_t)lent + lenp + 4);
    int n = 0;
    if (lent == 0 || lenp == 0) {
      n = 0;
    } else if (lent == 1 && lenp == 1) {
      buf[0] = chars_equal(t_blob[m[2]], p_blob[m[3]]) ? EDIT_MATCH
                                                       : EDIT_MISMATCH;
      n = 1;
    } else {
      int rc = t4_decode_dirs(dirs + job_off[j] * w, w, lent, lenp,
                              t_blob + m[2], p_blob + m[3], m[4],
                              buf.data(), &n);
      if (rc != 0) return -1;
    }
    int mt = 0, mm = 0, ind = 0;
    for (int i = 0; i < n; i++) {
      if (buf[i] == EDIT_MATCH)
        mt++;
      else if (buf[i] == EDIT_MISMATCH)
        mm++;
      else
        ind++;
    }
    out3[3 * j] = mt;
    out3[3 * j + 1] = mm;
    out3[3 * j + 2] = ind;
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Output formatting: the _raw.out/_final.out posWeight block (4 lines of
// space-separated int32 counts with a trailing " \n" each; reference
// SeqSet.hpp:10939-10993 writer).  Python int->str dominates the writer's
// wall-clock on 100k corpora; this formats the whole (len,4) block in one
// call.  Returns bytes written, or -1 when cap is too small.
extern "C" int64_t t4_fmt_pw_block(const int32_t* w, int len, char* out,
                                   int64_t cap) {
  char* p = out;
  char* end = out + cap;
  for (int k = 0; k < 4; k++) {
    for (int i = 0; i < len; i++) {
      if (end - p < 16) return -1;
      int32_t v = w[(int64_t)i * 4 + k];
      if (v == 0) {
        *p++ = '0';
      } else {
        uint32_t u = v < 0 ? (uint32_t)(-(int64_t)v) : (uint32_t)v;
        if (v < 0) *p++ = '-';
        char tmp[12];
        int t = 0;
        while (u) {
          tmp[t++] = (char)('0' + u % 10);
          u /= 10;
        }
        while (t) *p++ = tmp[--t];
      }
      *p++ = ' ';
    }
    if (end - p < 1) return -1;
    *p++ = '\n';
  }
  return (int64_t)(p - out);
}

// Run-length-compressed variant (engine/assemble.py:903 decompress_pos_weight,
// reference SeqSet.hpp:2484-2509): decompress then format in one call, so the
// (len,4) expansion never materializes in Python.  A negative packed value
// -v means "count v in the consensus base's slot" (N packs into slot 0,
// any other non-ACGT into slot 3, matching the Python -1 index wraparound).
extern "C" int64_t t4_fmt_pw_compressed(const char* cons, int len,
                                        const int32_t* flat, int64_t flat_len,
                                        char* out, int64_t cap) {
  static thread_local std::vector<int32_t> dec;
  dec.assign((size_t)len * 4, 0);
  int64_t k = 0;
  for (int j = 0; j < len; j++) {
    int32_t v = k < flat_len ? flat[k] : 0;
    if (v < 0) {
      int code = nuc_num(cons[j]);
      dec[(size_t)j * 4 + (code < 0 ? 3 : code)] = -v;
      k += 1;
    } else {
      for (int i = 0; i < 4; i++) {
        dec[(size_t)j * 4 + i] = k < flat_len ? flat[k] : 0;
        k += 1;
      }
    }
  }
  return t4_fmt_pw_block(dec.data(), len, out, cap);
}

// posWeight-free seqs print num_read in the consensus base's slot and 0
// elsewhere (assembler.py output_seqset fallback; N counts as slot 0,
// other non-ACGT letters match no slot).
extern "C" int64_t t4_fmt_pw_onehot(const char* cons, int len, int num_read,
                                    char* out, int64_t cap) {
  char* p = out;
  char* end = out + cap;
  char numbuf[12];
  int nb = 0;
  {
    uint32_t u = num_read < 0 ? (uint32_t)(-(int64_t)num_read)
                              : (uint32_t)num_read;
    char tmp[12];
    int t = 0;
    if (num_read < 0) numbuf[nb++] = '-';
    if (u == 0) tmp[t++] = '0';
    while (u) {
      tmp[t++] = (char)('0' + u % 10);
      u /= 10;
    }
    while (t) numbuf[nb++] = tmp[--t];
  }
  for (int k = 0; k < 4; k++) {
    for (int i = 0; i < len; i++) {
      if (end - p < nb + 4) return -1;
      if (nuc_num(cons[i]) == k) {
        for (int b = 0; b < nb; b++) *p++ = numbuf[b];
      } else {
        *p++ = '0';
      }
      *p++ = ' ';
    }
    if (end - p < 1) return -1;
    *p++ = '\n';
  }
  return (int64_t)(p - out);
}

// Whole-file _final.out parser (Annotator.cpp:573-619 record layout:
// '>' header line, consensus line, 4 posWeight count rows).  One call
// replaces 4 ctypes row parses per contig.  Outputs, per record:
//   rec_meta (n, 4) int64: {header_off, header_len, seq_off, seq_len}
//   row_cnt  (n, 4) int32: ints parsed per posWeight row
//   counts   flat int32 in row-major (record, row) order
// Returns the record count, or -1 when a cap is exceeded / the layout
// doesn't match (caller falls back to the line-by-line path).
extern "C" int64_t t4_parse_final_out(const char* s, int64_t slen,
                                      int64_t* rec_meta, int64_t rec_cap,
                                      int32_t* counts, int64_t counts_cap,
                                      int32_t* row_cnt) {
  int64_t n = 0;
  int64_t ci = 0;
  const char* p = s;
  const char* end = s + slen;
  auto line_end = [&](const char* q) {
    const char* e = (const char*)memchr(q, '\n', end - q);
    return e ? e : end;
  };
  while (p < end) {
    if (*p != '>') return -1;
    if (n >= rec_cap) return -1;
    const char* he = line_end(p);
    int64_t* m = rec_meta + 4 * n;
    m[0] = (p + 1) - s;
    m[1] = he - (p + 1);
    p = he < end ? he + 1 : end;
    const char* se = line_end(p);
    m[2] = p - s;
    m[3] = se - p;
    p = se < end ? se + 1 : end;
    for (int r = 0; r < 4; r++) {
      const char* re = line_end(p);
      int32_t cnt = 0;
      while (p < re) {
        while (p < re && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
        if (p >= re) break;
        bool neg = *p == '-';
        if (neg) p++;
        int64_t v = 0;
        while (p < re && *p >= '0' && *p <= '9') {
          v = v * 10 + (*p - '0');
          p++;
        }
        if (ci >= counts_cap) return -1;
        counts[ci++] = (int32_t)(neg ? -v : v);
        cnt++;
      }
      row_cnt[4 * n + r] = cnt;
      p = re < end ? re + 1 : end;
    }
    n++;
    while (p < end && (*p == '\n' || *p == '\r')) p++;
  }
  return n;
}

// Whitespace-separated int32 row parser for the annotator's _final.out
// loader (Annotator.cpp:573-619): Python int() over ~40M tokens dominates
// load_assembly on 10k-contig corpora.  Returns the count parsed, or -1
// when cap is too small.
extern "C" int64_t t4_parse_i32(const char* s, int64_t slen, int32_t* out,
                                int64_t cap) {
  int64_t n = 0;
  const char* p = s;
  const char* end = s + slen;
  while (p < end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
      p++;
    if (p >= end) break;
    bool neg = false;
    if (*p == '-') {
      neg = true;
      p++;
    }
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      v = v * 10 + (*p - '0');
      p++;
    }
    if (n >= cap) return -1;
    out[n++] = (int32_t)(neg ? -v : v);
  }
  return n;
}

// Whole-file _assembled_reads.fa parser (header format main.cpp:1995-2016:
// ">id strand minCnt medianCnt [barcode:STR] [umi:INT]", then the read
// line).  One call replaces the per-record Python tokenization in the
// annotator's realign stage.  Outputs per record:
//   rec   (n, 6) int64: id_off, id_len, seq_off, seq_len, bc_off, bc_len
//         (bc_off = -1 when no barcode: token)
//   ivals (n, 2) int32: strand, umi (-1 when absent)
// Returns the record count, or -1 on cap overflow / malformed layout.
extern "C" int64_t t4_parse_assembled_fa(const char* s, int64_t slen,
                                         int64_t* rec, int32_t* ivals,
                                         int64_t rec_cap) {
  int64_t n = 0;
  const char* p = s;
  const char* end = s + slen;
  while (p < end) {
    if (*p != '>') return -1;
    const char* he = (const char*)memchr(p, '\n', end - p);
    if (!he) he = end;
    if (n >= rec_cap) return -1;
    int64_t* R = rec + 6 * n;
    int32_t* V = ivals + 2 * n;
    const char* q = p + 1;
    const char* id0 = q;
    while (q < he && *q != ' ') q++;
    R[0] = id0 - s;
    R[1] = q - id0;
    while (q < he && *q == ' ') q++;
    const char* t0 = q;
    while (q < he && *q != ' ') q++;
    {
      bool neg = false;
      const char* r = t0;
      if (r < q && *r == '-') {
        neg = true;
        r++;
      }
      long v = 0;
      while (r < q && *r >= '0' && *r <= '9') {
        v = v * 10 + (*r - '0');
        r++;
      }
      V[0] = neg ? -(int32_t)v : (int32_t)v;
    }
    V[1] = -1;
    R[4] = -1;
    R[5] = 0;
    while (q < he) {
      while (q < he && *q == ' ') q++;
      const char* u0 = q;
      while (q < he && *q != ' ') q++;
      if (q - u0 > 8 && memcmp(u0, "barcode:", 8) == 0) {
        R[4] = (u0 + 8) - s;
        R[5] = q - (u0 + 8);
      } else if (q - u0 > 4 && memcmp(u0, "umi:", 4) == 0) {
        bool neg = false;
        const char* r = u0 + 4;
        if (r < q && *r == '-') {
          neg = true;
          r++;
        }
        long v = 0;
        while (r < q && *r >= '0' && *r <= '9') {
          v = v * 10 + (*r - '0');
          r++;
        }
        V[1] = neg ? -(int32_t)v : (int32_t)v;
      }
    }
    p = he < end ? he + 1 : end;
    const char* se = (const char*)memchr(p, '\n', end - p);
    if (!se) se = end;
    R[2] = p - s;
    R[3] = se - p;
    p = se < end ? se + 1 : end;
    while (p < end && (*p == '\n' || *p == '\r')) p++;
    n++;
  }
  return n;
}
