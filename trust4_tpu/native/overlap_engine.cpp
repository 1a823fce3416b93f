// Native overlap-query engine: the assembly/annotation hot path.
//
// Mirrors the dynamic k-mer index (ops/kmer_index.py; reference
// KmerIndex.hpp) and ports the query chain GetHitsFromRead -> SortHits ->
// GetOverlapsFromHits (+ VJ-spanning rescue) from engine/overlap.py
// (reference SeqSet.hpp:342-1501) semantics-identically: every skip rule,
// LIS tie-break, duplicate-window quirk and stale-variable quirk is
// preserved, so the produced overlap set (including hit coordinates) is
// bit-identical to the host implementation.  The similarity/extension pass
// that needs consensus/posWeight access stays in Python.
//
// The index is kept in sync by KmerIndex forwarding its string-level
// mutations (build_from_read / remove_from_read / update_from_read /
// clear); per-seq metadata (is_ref, barcode, name prefix, length) is passed
// per query from cached numpy arrays.
//
// C ABI only; loaded via ctypes (trust4_tpu/engine/overlap_native.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <string>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

constexpr int64_t KINDEX_HASH_MAX = 1000003;

struct Key {
  uint64_t code;
  int64_t h;
  bool operator==(const Key &o) const { return code == o.code && h == o.h; }
};
struct KeyHash {
  size_t operator()(const Key &k) const {
    return std::hash<uint64_t>()(k.code * 1315423911u ^ (uint64_t)k.h);
  }
};

struct Engine {
  int kmer_len = 9;
  bool consider_barcode = false;
  std::unordered_map<Key, std::vector<std::pair<int, int>>, KeyHash> index;
};

inline Key make_key(const Engine &E, uint64_t code, int64_t barcode) {
  if (E.consider_barcode)
    return {code, ((int64_t)code + barcode + 1) % KINDEX_HASH_MAX};
  return {code, (int64_t)(code % (uint64_t)KINDEX_HASH_MAX)};
}

inline int nuc2num(unsigned char c) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
    case 'N': return 0;  // reference quirk: N encodes as 0 (defs.h:8-9)
    default: return -1;
  }
}

void window_codes(const char *s, int len, int k, std::vector<uint64_t> &codes,
                  std::vector<uint8_t> &valid) {
  int n = len - k + 1;
  codes.clear();
  valid.clear();
  if (n <= 0) return;
  codes.resize(n);
  valid.resize(n);
  uint64_t code = 0;
  uint64_t mask = (k >= 32) ? ~uint64_t(0) : ((uint64_t(1) << (2 * k)) - 1);
  int last_n = -1;
  for (int i = 0; i < len; i++) {
    code = ((code << 2) | uint64_t(nuc2num((unsigned char)s[i]) & 3)) & mask;
    if (s[i] == 'N') last_n = i;
    if (i >= k - 1) {
      codes[i - k + 1] = code;
      valid[i - k + 1] = (last_n < i - k + 1) ? 1 : 0;
    }
  }
}

void revcomp(const char *s, int len, std::string &out) {
  out.resize(len);
  for (int i = 0; i < len; i++) {
    char c = s[len - 1 - i];
    int v = (c >= 'A' && c <= 'Z') ? nuc2num((unsigned char)c) : -1;
    if (c == 'N' || v < 0)
      out[i] = 'N';
    else
      out[i] = "ACGT"[3 - v];
  }
}

inline long iabs(long x) { return x < 0 ? -x : x; }
inline double fabs_(double x) { return x < 0 ? -x : x; }

struct Hit {
  int strand_key;  // 0 for strand -1, 1 for +1
  int seq_idx;
  int read_off;
  int seq_off;
  int repeats;
};

struct Coord {
  int read_off;
  int seq_off;
  int diff;
};

struct RC {
  int a;
  int b;
  bool operator==(const RC &o) const { return a == o.a && b == o.b; }
};

struct Ov {
  int seq_idx;
  int read_start, read_end;
  int strand;  // +1 / -1
  int seq_start, seq_end;
  int match_cnt;
  std::vector<RC> coords;
};

// Per-seq metadata snapshot passed with each query.
struct Meta {
  int n_seqs;
  const int8_t *is_ref;
  const int32_t *barcode;
  const int32_t *seq_len;
  const uint8_t *name4;  // first 3 chars + gene char ([3]) or 0
};

// Query-time settings.
struct Conf {
  int radius;
  int hit_len_required;
  bool is_long_seq_set;
  int skip_limit;
  int down_sample;
};

// ---- LIS (overlap.py:52-146; SeqSet.hpp:342-499) -------------------------

int binary_search_lis(const std::vector<int> &top, int size, int val_a,
                      const std::vector<RC> &hits) {
  int l = 0, r = size - 1;
  while (l <= r) {
    int m = (l + r) / 2;
    if (val_a == hits[top[m]].a) return m;
    if (val_a < hits[top[m]].a)
      r = m - 1;
    else
      l = m + 1;
  }
  return l - 1;
}

void longest_increasing_subsequence(const std::vector<RC> &hits,
                                    std::vector<RC> &out_lis) {
  out_lis.clear();
  int size = (int)hits.size();
  if (size == 0) return;
  double avg_diff = 0.0;
  for (int i = 1; i < size; i++) avg_diff += hits[i].a - hits[i].b;
  avg_diff /= size;

  static thread_local std::vector<int> top, link;
  top.assign(size, 0);
  link.assign(size, -1);
  int ret = 1;
  for (int i = 1; i < size; i++) {
    const RC &hi = hits[i];
    int tag;
    if (hits[top[ret - 1]].a <= hi.a)
      tag = ret - 1;
    else
      tag = binary_search_lis(top, ret, hi.a, hits);
    if (tag == -1) {
      top[0] = i;
      link[i] = -1;
    } else if (hi.a > hits[top[tag]].a) {
      if (tag == ret - 1) {
        top[ret] = i;
        ret += 1;
        link[i] = top[tag];
      } else if (hi.a < hits[top[tag + 1]].a) {
        top[tag + 1] = i;
        link[i] = top[tag];
      }
    } else if (hi.a == hits[top[tag]].a) {
      if (fabs_(hi.a - hi.b - avg_diff) <
          fabs_(hits[top[tag]].a - hits[top[tag]].b - avg_diff)) {
        top[tag] = i;
        link[i] = tag > 0 ? top[tag - 1] : -1;
      }
    }
  }

  static thread_local std::vector<RC> lis;
  lis.clear();
  lis.reserve(ret);
  int k = top[ret - 1];
  for (int t = 0; t < ret; t++) {
    lis.push_back(hits[k]);
    k = link[k];
  }
  for (int a = 0, b = ret - 1; a < b; a++, b--) std::swap(lis[a], lis[b]);

  static thread_local std::vector<RC> out;
  out.clear();
  out.reserve(ret);
  int i = 0;
  while (i < ret) {
    int j = i + 1;
    while (j < ret && lis[i].b == lis[j].b) j++;
    if (j == i + 1) {
      out.push_back(lis[i]);
    } else {
      int mintag = i;
      double min_diff = fabs_(lis[i].a - lis[i].b - avg_diff);
      for (int l = i + 1; l < j; l++) {
        double d = fabs_(lis[l].a - lis[l].b - avg_diff);
        if (d < min_diff) {
          min_diff = d;
          mintag = l;
        }
      }
      out.push_back(lis[mintag]);
    }
    i = j;
  }
  int out_ret = (int)out.size();

  if (out_ret > 0) {
    int a = 0, b = 0;
    while (a < out_ret && b < size) {
      if (hits[b].b < out[a].b) {
        b++;
      } else if (a + 1 < out_ret && out[a + 1].b <= hits[b].b) {
        a++;
      } else if (out[a] == hits[b]) {
        b++;
      } else {
        if (out[a].a <= hits[b].a &&
            (a == out_ret - 1 || hits[b].a < out[a + 1].a) &&
            fabs_(hits[b].a - hits[b].b - avg_diff) <
                fabs_(out[a].a - out[a].b - avg_diff)) {
          out[a] = hits[b];
        }
        b++;
      }
    }
  }
  out_lis = out;  // copy from the reused thread-local buffer
}

// ---- chain cleanup (overlap.py:148-210; SeqSet.hpp:502-568) --------------

void remove_low_quality_hits_from_chain(std::vector<RC> &chain) {
  int size = (int)chain.size();
  if (size == 0) return;
  struct Iv {
    int a, b, c;
  };
  std::vector<Iv> intervals;
  int i = 0;
  while (i < size) {
    int j = i + 1;
    while (j < size && chain[j].a - chain[j].b == chain[i].a - chain[i].b) j++;
    intervals.push_back({i, j - 1, chain[i].a - chain[i].b});
    i = j;
  }
  const int stretch = 3;
  int isize = (int)intervals.size();
  std::vector<RC> out(chain.begin(), chain.begin() + intervals[0].b + 1);
  if (isize > 1) {
    const Iv &iv0 = intervals[0];
    if (iv0.c != intervals[1].c && iv0.b - iv0.a + 1 < stretch &&
        intervals[1].b - iv0.a + 1 >= stretch)
      out.clear();
  }
  i = 1;
  while (i < isize - 1) {
    const Iv &cur = intervals[i];
    const Iv &prv = intervals[i - 1];
    const Iv &nxt = intervals[i + 1];
    if (cur.c != prv.c && prv.c == nxt.c && cur.b - cur.a + 1 < stretch &&
        prv.b - prv.a + 1 >= stretch && nxt.b - nxt.a + 1 >= stretch) {
      i += 1;
      continue;
    }
    if (cur.c != prv.c && prv.c == nxt.c && cur.b - cur.a + 1 < 2 * stretch &&
        prv.b - prv.a + 1 >= 10 * stretch && nxt.b - nxt.a + 1 >= 10 * stretch) {
      i += 1;
      continue;
    }
    for (int k = cur.a; k <= cur.b; k++) out.push_back(chain[k]);
    i += 1;
  }
  if (isize > 1) {
    const Iv &cur = intervals[isize - 1];
    const Iv &prv = intervals[isize - 2];
    if (!(prv.c != cur.c && cur.b - cur.a + 1 < stretch &&
          prv.b - prv.a + 1 >= stretch))
      for (int k = cur.a; k <= cur.b; k++) out.push_back(chain[k]);
  }
  chain = std::move(out);
}

// ---- GetOverlapsFromHits (overlap.py:322-482; SeqSet.hpp:763-1063) -------

int total_hit_length_on_a(const std::vector<RC> &c, int kl) {
  int ret = 0, i = 0, n = (int)c.size();
  while (i < n) {
    int j = i + 1;
    while (j < n && c[j].a <= c[j - 1].a + kl - 1) j++;
    ret += c[j - 1].a - c[i].a + kl;
    i = j;
  }
  return ret;
}

int total_hit_length_on_b(const std::vector<RC> &c, int kl) {
  int ret = 0, i = 0, n = (int)c.size();
  while (i < n) {
    int j = i + 1;
    while (j < n && c[j].b <= c[j - 1].b + kl - 1) j++;
    ret += c[j - 1].b - c[i].b + kl;
    i = j;
  }
  return ret;
}

int get_overlaps_from_hits(int kmer_len, const Conf &C, const Meta &M,
                           const std::vector<Hit> &hits, int hit_len_required,
                           int filter_, bool conservative_chain,
                           std::vector<Ov> &overlaps) {
  int kl = kmer_len;
  int hit_size = (int)hits.size();

  int novel_min_hit[2] = {3, 3};
  int ref_min_hit[2] = {3, 3};
  bool remove_only_repeats[2] = {false, false};
  long possible_overlap_cnt[2] = {0, 0};
  if (filter_ == 1) {
    int longest_hits[2] = {0, 0};
    int i = 0;
    while (i < hit_size) {
      int st = hits[i].strand_key;
      int j = i + 1;
      while (j < hit_size && hits[j].strand_key == st &&
             hits[j].seq_idx == hits[i].seq_idx)
        j++;
      if (!M.is_ref[hits[i].seq_idx]) {
        if (j - i > novel_min_hit[st]) possible_overlap_cnt[st] += 1;
        if (j - i > longest_hits[st]) longest_hits[st] = j - i;
      }
      if (!remove_only_repeats[st]) {
        int cnt = 0;
        for (int k = i; k < j; k++)
          if (hits[k].repeats <= 10000) cnt++;
        if (cnt >= novel_min_hit[st]) remove_only_repeats[st] = true;
      }
      i = j;
    }
    for (int s = 0; s < 2; s++) {
      if (possible_overlap_cnt[s] > 100000)
        novel_min_hit[s] = (int)(longest_hits[s] * 0.75);
      else if (possible_overlap_cnt[s] > 10000)
        novel_min_hit[s] = longest_hits[s] / 2;
      else if (possible_overlap_cnt[s] > 1000)
        novel_min_hit[s] = longest_hits[s] / 3;
      else if (possible_overlap_cnt[s] > 100)
        novel_min_hit[s] = longest_hits[s] / 4;
    }
  }

  int i = 0;
  while (i < hit_size) {
    int st = hits[i].strand_key;
    int seq_idx = hits[i].seq_idx;
    int j = i + 1;
    while (j < hit_size && hits[j].strand_key == st &&
           hits[j].seq_idx == seq_idx)
      j++;

    int min_hit_required =
        M.is_ref[seq_idx] ? ref_min_hit[st] : novel_min_hit[st];
    if (j - i < min_hit_required) {
      i = j;
      continue;
    }
    if (remove_only_repeats[st]) {
      bool has_unique = false;
      for (int k = i; k < j; k++)
        if (hits[k].repeats <= 10000) {
          has_unique = true;
          break;
        }
      if (!has_unique) {
        i = j;
        continue;
      }
    }

    static thread_local std::vector<Coord> hcd;
    hcd.clear();
    hcd.reserve(j - i);
    for (int k = i; k < j; k++)
      hcd.push_back({hits[k].read_off, hits[k].seq_off,
                     hits[k].read_off - hits[k].seq_off});
    std::sort(hcd.begin(), hcd.end(), [](const Coord &x, const Coord &y) {
      if (x.diff != y.diff) return x.diff < y.diff;
      if (x.seq_off != y.seq_off) return x.seq_off < y.seq_off;
      return x.read_off < y.read_off;
    });
    int group_n = j - i;
    int adjust_radius = M.is_ref[seq_idx] ? C.radius : 0;

    int s = 0;
    while (s < group_n) {
      int e = s + 1;
      while (e < group_n) {
        int diff = hcd[e].diff - hcd[e - 1].diff;
        if (iabs(diff) > adjust_radius) break;
        e++;
      }

      if (e - s < min_hit_required || (e - s) * kl < hit_len_required) {
        s = e;
        continue;
      }
      if (remove_only_repeats[st]) {
        // Reference quirk: indexes the GLOBAL hit array with the
        // group-local positions (SeqSet.hpp:929-935).
        bool has_unique = false;
        int hi = e < hit_size ? e : hit_size;
        for (int k = s; k < hi; k++)
          if (hits[k].repeats <= 10000) {
            has_unique = true;
            break;
          }
        if (!has_unique) {
          s = e;
          continue;
        }
      }

      static thread_local std::vector<RC> concordant;
      concordant.clear();
      concordant.reserve(e - s);
      for (int k = s; k < e; k++)
        concordant.push_back({hcd[k].read_off, hcd[k].seq_off});
      if (adjust_radius > 0)
        std::sort(concordant.begin(), concordant.end(),
                  [](const RC &x, const RC &y) {
                    if (x.b != y.b) return x.b < y.b;
                    return x.a < y.a;
                  });
      static thread_local std::vector<RC> lis;
      longest_increasing_subsequence(concordant, lis);
      if ((int)lis.size() * kl < hit_len_required) {
        s = e;
        continue;
      }
      if (conservative_chain) remove_low_quality_hits_from_chain(lis);

      int lis_start = 0;
      int lis_end = (int)lis.size() - 1;
      if (C.is_long_seq_set) {
        int max_gap = 2 * hit_len_required + 3 * kl;
        if (filter_ == 0) max_gap *= 4;
        if (max_gap < 200) max_gap = 200;
        int best = -1;
        int k = 0;
        int n_lis = (int)lis.size();
        while (k < n_lis) {
          int l = k + 1;
          while (l < n_lis && lis[l].a - lis[l - 1].a <= max_gap) l++;
          if (l - k > best) {
            best = l - k;
            lis_start = k;
            lis_end = l - 1;
          }
          k = l;
        }
      }

      std::vector<RC> final_chain(lis.begin() + lis_start,
                                  lis.begin() + lis_end + 1);
      // (final_chain is moved into the overlap below; keep it local)
      int hit_len = total_hit_length_on_a(final_chain, kl);
      if (hit_len < hit_len_required) {
        s = e;
        continue;
      }
      if (total_hit_length_on_b(final_chain, kl) < hit_len_required) {
        s = e;
        continue;
      }

      Ov no;
      no.seq_idx = seq_idx;
      no.read_start = final_chain.front().a;
      no.read_end = final_chain.back().a + kl - 1;
      no.strand = st == 1 ? 1 : -1;
      no.seq_start = final_chain.front().b;
      no.seq_end = final_chain.back().b + kl - 1;
      no.match_cnt = 2 * hit_len;
      if (!M.is_ref[seq_idx] &&
          hit_len * 2 < no.seq_end - no.seq_start + 1) {
        s = e;
        continue;
      }
      no.coords = std::move(final_chain);
      overlaps.push_back(std::move(no));
      s = e;
    }
    i = j;
  }
  return (int)overlaps.size();
}

// ---- GetVJOverlapsFromHits (overlap.py:484-521; SeqSet.hpp:1066-1161) ----

int get_vj_overlaps_from_hits(int kmer_len, const Conf &C, const Meta &M,
                              const std::vector<Hit> &hits,
                              std::vector<Ov> &overlaps) {
  std::vector<Hit> vj_hits;
  for (const Hit &h : hits) {
    if (!M.is_ref[h.seq_idx]) continue;
    const uint8_t *n4 = M.name4 + 4 * h.seq_idx;
    if (n4[3] == 'V' && h.seq_off >= M.seq_len[h.seq_idx] - 31)
      vj_hits.push_back(h);
    else if (n4[3] == 'J' && h.seq_off < 31)
      vj_hits.push_back(h);
  }

  std::vector<Ov> tmp;
  get_overlaps_from_hits(kmer_len, C, M, vj_hits, 17, 0, false, tmp);

  int overlap_cnt = (int)tmp.size();
  int max_match = 0;
  int tagi = 0, tagj = 0;
  for (int i = 0; i < overlap_cnt; i++) {
    for (int j = i + 1; j < overlap_cnt; j++) {
      const uint8_t *ni = M.name4 + 4 * tmp[i].seq_idx;
      const uint8_t *nj = M.name4 + 4 * tmp[j].seq_idx;
      if (memcmp(ni, nj, 3) != 0 || ni[3] == nj[3]) continue;
      if (ni[3] == 'V') {
        if (tmp[i].read_start > tmp[j].read_start) continue;
      } else {
        if (tmp[i].read_start < tmp[j].read_start) continue;
      }
      if (tmp[i].match_cnt + tmp[j].match_cnt > max_match) {
        max_match = tmp[i].match_cnt + tmp[j].match_cnt;
        tagi = i;
        tagj = j;
      }
    }
  }
  if (max_match == 0) return 0;
  overlaps.push_back(tmp[tagi]);
  overlaps.push_back(tmp[tagj]);
  return 2;
}

// ---- GetHitsFromRead + SortHits (overlap.py:216-303) ---------------------

void get_hits_from_read(const Engine &E, const Conf &C, const Meta &M,
                        const char *read, int len, int strand, int barcode,
                        bool allow_total_skip, const uint8_t *puse,
                        std::vector<Hit> &hits) {
  hits.clear();
  int kl = E.kmer_len;
  std::vector<uint64_t> codes;
  std::vector<uint8_t> valid;
  std::string rc;
  static const std::vector<std::pair<int, int>> kEmpty;

  auto scan = [&](const char *s, int slen, int st) {
    window_codes(s, slen, kl, codes, valid);
    int n = (int)codes.size();
    int skip_cnt = 0;
    uint64_t prev_code = 0;
    for (int w = 0; w < n; w++) {
      if (C.down_sample > 1 && w % C.down_sample != 0) continue;
      uint64_t code = codes[w];
      if (w == 0 || code != prev_code) {
        const std::vector<std::pair<int, int>> *postings = &kEmpty;
        if (valid[w]) {
          auto it = E.index.find(make_key(E, code, barcode));
          if (it != E.index.end()) postings = &it->second;
        }
        int size = (int)postings->size();
        if (size >= 100 && puse == nullptr && w != 0 && w != n - 1 &&
            skip_cnt < C.skip_limit) {
          skip_cnt += 1;
          continue;  // quirk: bypasses the prev_code update
        }
        if (size >= 100 && allow_total_skip) continue;  // same quirk
        skip_cnt = 0;
        int repeats;
        if (puse != nullptr) {
          repeats = 0;
          for (const auto &p : *postings)
            if (puse[p.first]) repeats++;
        } else {
          repeats = size;
        }
        if (barcode != -1) repeats = 1;
        for (const auto &p : *postings) {
          if (puse != nullptr && !puse[p.first]) continue;
          if (barcode != -1 && M.barcode[p.first] != barcode) continue;
          hits.push_back({st == 1 ? 1 : 0, p.first, w, p.second, repeats});
        }
      }
      prev_code = code;
    }
  };

  if (strand != -1) scan(read, len, 1);
  if (strand != 1) {
    revcomp(read, len, rc);
    scan(rc.c_str(), len, -1);
  }
}

void sort_hits(std::vector<Hit> &hits, int n_seqs) {
  if ((int)hits.size() > 2 * n_seqs) {
    std::stable_sort(hits.begin(), hits.end(), [](const Hit &x, const Hit &y) {
      if (x.strand_key != y.strand_key) return x.strand_key < y.strand_key;
      return x.seq_idx < y.seq_idx;
    });
  } else {
    // Python's sorted() is stable; (strand, idx, read_off, seq_off) keys
    // are unique in practice but stable_sort removes any doubt.
    std::stable_sort(hits.begin(), hits.end(), [](const Hit &x, const Hit &y) {
      if (x.strand_key != y.strand_key) return x.strand_key < y.strand_key;
      if (x.seq_idx != y.seq_idx) return x.seq_idx < y.seq_idx;
      if (x.read_off != y.read_off) return x.read_off < y.read_off;
      return x.seq_off < y.seq_off;
    });
  }
}

}  // namespace

extern "C" {

void *t4o_create(int kmer_len) {
  Engine *E = new Engine;
  E->kmer_len = kmer_len;
  return E;
}

void t4o_destroy(void *h) { delete (Engine *)h; }

void t4o_set_kmer_len(void *h, int kl) { ((Engine *)h)->kmer_len = kl; }

void t4o_set_consider_barcode(void *h, int v) {
  ((Engine *)h)->consider_barcode = v != 0;
}

void t4o_clear(void *h) { ((Engine *)h)->index.clear(); }

// KmerIndex.build_from_read (ops/kmer_index.py:79-96).
void t4o_build_from_read(void *h, const char *s, int len, int kl, int sid,
                         int64_t barcode, int shift) {
  Engine *E = (Engine *)h;
  std::vector<uint64_t> codes;
  std::vector<uint8_t> valid;
  window_codes(s, len, kl, codes, valid);
  int n = (int)codes.size();
  for (int w = 0; w < n; w++) {
    if (!valid[w]) continue;
    if (w != 1) {
      uint64_t prev = (w == 0) ? 0 : codes[w - 1];
      if (codes[w] == prev) continue;
    }
    E->index[make_key(*E, codes[w], barcode)].push_back({sid, w + shift});
  }
}

// KmerIndex.remove_from_read (ops/kmer_index.py:98-104).
void t4o_remove_from_read(void *h, const char *s, int len, int kl, int sid,
                          int64_t barcode, int offset) {
  Engine *E = (Engine *)h;
  std::vector<uint64_t> codes;
  std::vector<uint8_t> valid;
  window_codes(s, len, kl, codes, valid);
  int n = (int)codes.size();
  for (int w = 0; w < n; w++) {
    if (!valid[w]) continue;
    Key key = make_key(*E, codes[w], barcode);
    auto it = E->index.find(key);
    if (it == E->index.end()) continue;
    auto &lst = it->second;
    for (size_t i = 0; i < lst.size(); i++) {
      if (lst[i].first == sid && lst[i].second == w + offset) {
        lst.erase(lst.begin() + i);
        if (lst.empty()) E->index.erase(key);
        break;
      }
    }
  }
}

// KmerIndex.update_from_read (ops/kmer_index.py:106-119).
void t4o_update_from_read(void *h, const char *s, int len, int kl,
                          int64_t barcode, int shift, int old_id, int new_id) {
  Engine *E = (Engine *)h;
  std::vector<uint64_t> codes;
  std::vector<uint8_t> valid;
  window_codes(s, len, kl, codes, valid);
  int n = (int)codes.size();
  for (int w = 0; w < n; w++) {
    if (!valid[w]) continue;
    auto it = E->index.find(make_key(*E, codes[w], barcode));
    if (it == E->index.end()) continue;
    for (auto &p : it->second) {
      if (p.first == old_id && p.second == w) {
        p.first = new_id;
        p.second = w + shift;
        break;
      }
    }
  }
}

// Full query: GetOverlapsFromRead up to (excluding) the sort/similarity
// pass (overlap.py:693-718).  Returns 0 on success, -1 if an output buffer
// is too small.  out_ov holds 9 int32 per overlap: seq_idx, read_start,
// read_end, strand, seq_start, seq_end, match_cnt, coord_off, coord_cnt;
// out_coords holds (read_off, seq_off) int32 pairs.
int t4o_query(void *h, const char *read, int len, int strand, int barcode,
              int read_type, int skip_repeats, const uint8_t *puse,
              int n_seqs, const int8_t *is_ref, const int32_t *seq_bc,
              const int32_t *seq_len, const uint8_t *name4, int radius,
              int hit_len_required, int is_long_seq_set, int skip_limit,
              int down_sample, int32_t *out_ov, int cap_ov,
              int32_t *out_coords, int cap_coords, int32_t *out_counts) {
  Engine *E = (Engine *)h;
  Conf C{radius, hit_len_required, is_long_seq_set != 0, skip_limit,
         down_sample};
  Meta M{n_seqs, is_ref, seq_bc, seq_len, name4};

  std::vector<Ov> overlaps;
  std::vector<Hit> hits;
  int overlap_cnt = 0;
  if (skip_repeats && puse == nullptr) {
    get_hits_from_read(*E, C, M, read, len, strand, barcode, true, nullptr,
                       hits);
    sort_hits(hits, n_seqs);
    overlap_cnt = get_overlaps_from_hits(E->kmer_len, C, M, hits,
                                         hit_len_required, 0, false, overlaps);
    if (overlap_cnt == 0) overlaps.clear();
  }
  if (overlap_cnt == 0) {
    get_hits_from_read(*E, C, M, read, len, strand, barcode, false, puse,
                       hits);
    sort_hits(hits, n_seqs);
    int filter_hits = read_type == 0 ? 1 : 0;
    overlap_cnt =
        get_overlaps_from_hits(E->kmer_len, C, M, hits, hit_len_required,
                               filter_hits, read_type != 0, overlaps);
  }
  if (overlap_cnt == 0)
    overlap_cnt = get_vj_overlaps_from_hits(E->kmer_len, C, M, hits, overlaps);

  int n_ov = (int)overlaps.size();
  if (n_ov > cap_ov) return -1;
  int n_pairs = 0;
  for (const Ov &o : overlaps) n_pairs += (int)o.coords.size();
  if (n_pairs > cap_coords) return -1;

  int coff = 0;
  for (int i = 0; i < n_ov; i++) {
    const Ov &o = overlaps[i];
    int32_t *row = out_ov + 9 * i;
    row[0] = o.seq_idx;
    row[1] = o.read_start;
    row[2] = o.read_end;
    row[3] = o.strand;
    row[4] = o.seq_start;
    row[5] = o.seq_end;
    row[6] = o.match_cnt;
    row[7] = coff;
    row[8] = (int32_t)o.coords.size();
    for (const RC &p : o.coords) {
      out_coords[2 * coff] = p.a;
      out_coords[2 * coff + 1] = p.b;
      coff++;
    }
  }
  out_counts[0] = n_ov;
  out_counts[1] = n_pairs;
  return 0;
}

// Diagnostics: number of postings lists / total postings.
void t4o_stats(void *h, int64_t *out) {
  Engine *E = (Engine *)h;
  out[0] = (int64_t)E->index.size();
  int64_t tot = 0;
  for (const auto &kv : E->index) tot += (int64_t)kv.second.size();
  out[1] = tot;
}


// ---- Canonical k-mer counting (ops/kmer_count.py; KmerCount.hpp) ---------
//
// Port of the 21-mer support counter with the reference's persistent
// stale sort buffer and N-handling quirks (KmerCount.hpp:64-288,
// ops/kmer_count.py docstring).  Single-thread semantics, matching the
// host implementation exactly.

namespace {

struct KCount {
  int k;
  int64_t max_read_len = -1;
  std::unordered_map<uint64_t, int64_t> counts;
  std::vector<int64_t> buf;  // persistent; stale values participate in
                             // the trim quirk exactly as in the reference
};

// canonical (min of fwd/rc) window codes with validity.
void canon_codes(const char *s, int len, int k, std::vector<uint64_t> &codes,
                 std::vector<uint8_t> &valid) {
  codes.clear();
  valid.clear();
  int n = len - k + 1;
  if (n <= 0) return;
  codes.resize(n);
  valid.resize(n);
  uint64_t mask = (k >= 32) ? ~uint64_t(0) : ((uint64_t(1) << (2 * k)) - 1);
  uint64_t code = 0, rc = 0;
  int last_n = -1;
  for (int i = 0; i < len; i++) {
    uint64_t b = (uint64_t)(nuc2num((unsigned char)s[i]) & 3);
    code = ((code << 2) | b) & mask;
    rc = (rc >> 2) | ((uint64_t(3) - b) << (2 * (k - 1)));
    if (s[i] == 'N') last_n = i;
    if (i >= k - 1) {
      uint64_t c = code < rc ? code : rc;
      codes[i - k + 1] = c;
      valid[i - k + 1] = (last_n < i - k + 1) ? 1 : 0;
    }
  }
}

}  // namespace

extern "C" {

void *t4kc_create(int k) {
  KCount *kc = new KCount;
  kc->k = k;
  return kc;
}

void t4kc_destroy(void *h) { delete (KCount *)h; }

int64_t t4kc_get_max_read_len(void *h) { return ((KCount *)h)->max_read_len; }

void t4kc_set_max_read_len(void *h, int64_t v) {
  ((KCount *)h)->max_read_len = v;
}

void t4kc_set_count(void *h, uint64_t code, int64_t c) {
  ((KCount *)h)->counts[code] = c;
}

int64_t t4kc_get_count_code(void *h, uint64_t code) {
  KCount *K = (KCount *)h;
  auto it = K->counts.find(code);
  return it == K->counts.end() ? 0 : it->second;
}

int t4kc_add_count(void *h, const char *read, int len) {
  KCount *K = (KCount *)h;
  if (len < K->k) return 0;
  std::vector<uint64_t> codes;
  std::vector<uint8_t> valid;
  canon_codes(read, len, K->k, codes, valid);
  for (size_t w = 0; w < codes.size(); w++)
    if (valid[w]) K->counts[codes[w]]++;
  if (len > K->max_read_len) K->max_read_len = len;
  return 1;
}

// GetCountStatsAndTrim.  out_i64 = {min, median, ok, new_len};
// out_f64 = {avg}.  new_len is the trimmed prefix length of read/qual
// (caller slices); -1 means unchanged.
void t4kc_stats_trim(void *h, const char *read, int len, const char *qual,
                     int has_qual, int64_t *out_i64, double *out_f64) {
  KCount *K = (KCount *)h;
  int64_t &omin = out_i64[0];
  int64_t &omed = out_i64[1];
  int64_t &ook = out_i64[2];
  int64_t &olen = out_i64[3];
  double &oavg = out_f64[0];
  olen = -1;
  if (K->max_read_len == -1) {
    omin = omed = 0;
    oavg = 0.0;
    ook = 0;
    return;
  }
  int k = K->k;
  if (len < k) {
    omin = omed = -1;
    oavg = -1.0;
    ook = 0;
    return;
  }
  if ((int64_t)K->buf.size() < K->max_read_len)
    K->buf.resize(K->max_read_len, 0);
  std::vector<int64_t> &c = K->buf;
  std::vector<uint64_t> codes;
  std::vector<uint8_t> valid;
  canon_codes(read, len, k, codes, valid);
  int64_t s = 0;
  int nk = 0;
  for (size_t w = 0; w < codes.size(); w++) {
    if (!valid[w]) continue;
    int64_t v = 0;
    auto it = K->counts.find(codes[w]);
    if (it != K->counts.end()) v = it->second;
    if (v <= 0) v = 1;
    c[nk] = v;
    s += v;
    nk++;
  }
  int stored = nk;
  if (nk == 0) {
    if (has_qual) olen = 0;
    omin = omed = -(int64_t)len;
    oavg = (double)(-(int64_t)len);
    ook = 0;
    return;
  }

  bool nulled_trim = false, nulled_zero = false;
  int trim_start = -1;
  if (has_qual) {
    int i = stored - 1;
    while (i >= 0) {
      if (c[i] > 1) break;
      i--;
    }
    i++;
    int bad_cnt = 0;
    int j = len - 1;
    while (j >= i + k - 1) {
      if ((int)qual[j] - 32 <= 15) {
        bad_cnt++;
        if ((double)bad_cnt >= 0.1 * (double)(len - j)) trim_start = j;
      }
      j--;
    }
    if (trim_start > 0) {
      nk = trim_start - k + 1;
      olen = trim_start;
      nulled_trim = true;
    }
    if (trim_start > 0 && trim_start < k) {
      nk = 0;
      olen = 0;
      nulled_zero = true;
    }
  }

  if (nk == 0) {
    omin = c[0];
    omed = c[0];
    oavg = 1.0 / 0.0;  // +inf, matching the reference's div-by-zero float
  } else {
    std::sort(c.begin(), c.begin() + nk);
    omin = c[0];
    omed = c[nk / 2];
    oavg = (double)s / (double)nk;
  }

  bool has_n = false;
  for (int i = 0; i < len; i++) {
    if (nulled_trim && i == trim_start) continue;
    if (nulled_zero && i == 0) continue;
    if (read[i] == 'N') {
      has_n = true;
      break;
    }
  }
  if (has_n) {
    if (omin >= 0)
      omin = 0;
    else
      omin -= 1;
  }
  ook = 1;
}

}  // extern "C"

}  // extern "C"
