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
#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <thread>
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

// Small-inline postings vector: most barcode-salted keys hold 1-2
// postings, so inline capacity 2 removes the per-key heap allocation
// that dominates large barcoded index builds (26k-contig annotator load:
// ~2x).  Values live inside unordered_map nodes, which are
// reference-stable and never moved, so the inline self-pointer is safe;
// copies/moves are deleted to make any future copying a compile error.
struct PostVec {
  std::pair<int, int> *d;
  int32_t n = 0;
  int32_t cap = 2;
  std::pair<int, int> inl[2];
  PostVec() : d(inl) {}
  PostVec(const PostVec &) = delete;
  PostVec &operator=(const PostVec &) = delete;
  ~PostVec() {
    if (d != inl) free(d);
  }
  int size() const { return n; }
  bool empty() const { return n == 0; }
  std::pair<int, int> *begin() { return d; }
  std::pair<int, int> *end() { return d + n; }
  const std::pair<int, int> *begin() const { return d; }
  const std::pair<int, int> *end() const { return d + n; }
  const std::pair<int, int> *data() const { return d; }
  std::pair<int, int> &operator[](int i) { return d[i]; }
  void grow() {
    int32_t nc = cap * 2;
    std::pair<int, int> *nd =
        (std::pair<int, int> *)malloc(sizeof(std::pair<int, int>) * (size_t)nc);
    memcpy(nd, d, sizeof(*nd) * (size_t)n);
    if (d != inl) free(d);
    d = nd;
    cap = nc;
  }
  void push_back(std::pair<int, int> v) {
    if (n == cap) grow();
    d[n++] = v;
  }
  void insert(std::pair<int, int> *pos, std::pair<int, int> v) {
    int at = (int)(pos - d);
    if (n == cap) grow();
    memmove(d + at + 1, d + at, sizeof(*d) * (size_t)(n - at));
    d[at] = v;
    n++;
  }
  void erase(std::pair<int, int> *pos) {
    int at = (int)(pos - d);
    memmove(d + at, d + at + 1, sizeof(*d) * (size_t)(n - 1 - at));
    n--;
  }
};

// Hash-sharded postings index: 8 independent maps keyed by the high
// bits of the key hash (the maps use the low bits for bucketing).  The
// shard of a key is deterministic, per-key postings order is unchanged,
// and bulk builds fan shards out across threads — the 50M-insert
// barcoded annotator load was bound by serial unordered_map insertion.
struct ShardedIndex {
  static constexpr int NS = 8;
  using Map = std::unordered_map<Key, PostVec, KeyHash>;
  Map shards[NS];
  static inline int shard_of(const Key &k) {
    return (int)((KeyHash()(k) >> 24) & (NS - 1));
  }
  PostVec *find(const Key &k) {
    Map &m = shards[shard_of(k)];
    auto it = m.find(k);
    return it == m.end() ? nullptr : &it->second;
  }
  PostVec &operator[](const Key &k) { return shards[shard_of(k)][k]; }
  void erase(const Key &k) { shards[shard_of(k)].erase(k); }
  void clear() {
    for (Map &m : shards) m.clear();
  }
  size_t size() const {
    size_t t = 0;
    for (const Map &m : shards) t += m.size();
    return t;
  }
  void reserve(size_t n) {
    for (Map &m : shards) m.reserve(n / NS + 1);
  }
};

struct Engine {
  int kmer_len = 9;
  bool consider_barcode = false;
  ShardedIndex index;
  // Direct-addressed CSR snapshot of the postings (code -> pairs), built
  // lazily at batch-query entry when the index is frozen for the batch
  // (annotator/quick-annotation sweeps): one array lookup replaces the
  // unordered_map find in the hits hot loop.  Invalidated by ANY index
  // mutation; only valid in the non-barcode-hashed mode at kl <= 10
  // (4^10 slots = 4MB of offsets).
  bool csr_valid = false;
  int csr_kl = 0;
  std::vector<int32_t> csr_off;
  std::vector<std::pair<int, int>> csr_post;
};

inline void invalidate_csr(Engine *E) { E->csr_valid = false; }

inline Key make_key(const Engine &E, uint64_t code, int64_t barcode) {
  if (E.consider_barcode)
    return {code, ((int64_t)code + barcode + 1) % KINDEX_HASH_MAX};
  return {code, (int64_t)(code % (uint64_t)KINDEX_HASH_MAX)};
}

// Build (or skip) the CSR snapshot; call single-threaded before a batch.
inline void engine_ensure_csr(Engine *E) {
  if (E->csr_valid && E->csr_kl == E->kmer_len) return;
  E->csr_valid = false;
  if (E->consider_barcode || E->kmer_len > 10 || E->index.size() < 1024)
    return;
  size_t slots = (size_t)1 << (2 * E->kmer_len);
  E->csr_off.assign(slots + 1, 0);
  size_t total = 0;
  for (const auto &m : E->index.shards)
    for (const auto &kv : m) {
      // Mirror find(make_key(code, ·)) in non-barcode mode exactly: keys
      // inserted under barcode hashing (different second) are unreachable
      // in this mode and are skipped.
      if (kv.first.code >= slots) return;  // stale longer-k key: bail
      if (kv.first.h !=
          (int64_t)(kv.first.code % (uint64_t)KINDEX_HASH_MAX))
        continue;
      E->csr_off[kv.first.code + 1] = (int32_t)kv.second.size();
      total += kv.second.size();
    }
  for (size_t i = 1; i <= slots; i++) E->csr_off[i] += E->csr_off[i - 1];
  E->csr_post.resize(total);
  for (const auto &m : E->index.shards)
    for (const auto &kv : m) {
      if (kv.first.h !=
          (int64_t)(kv.first.code % (uint64_t)KINDEX_HASH_MAX))
        continue;
      std::copy(kv.second.begin(), kv.second.end(),
                E->csr_post.begin() + E->csr_off[kv.first.code]);
    }
  E->csr_kl = E->kmer_len;
  E->csr_valid = true;
}

struct SOv;  // fwd

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

// 12-byte hit: (strand, seq) pack into one comparable int32 bucket,
// and `repeats` — only ever consumed as `repeats <= 10000` — becomes a
// flag bit on the read offset.  435M+ hits flow through append, bucket
// sort, and three scan passes per annotation batch; the 20 -> 12 byte
// cut is pure memory-traffic savings with identical ordering semantics
// ((strand, seq) major order == signed bucket order; read offsets are
// window indices < 2^21).
struct Hit {
  int32_t bucket;   // strand_key << 30 | seq_idx
  int32_t ro_flag;  // read_off | (rep_ok << 30)
  int32_t seq_off;
  inline int sk() const { return (int)((uint32_t)bucket >> 30); }
  inline int sq() const { return bucket & ((1 << 30) - 1); }
  inline int ro() const { return ro_flag & ((1 << 30) - 1); }
  inline bool rep_ok() const { return (ro_flag & (1 << 30)) != 0; }
};

inline Hit make_hit(int strand_key, int seq_idx, int read_off, int seq_off,
                    bool rep_ok) {
  return Hit{(int32_t)((strand_key << 30) | seq_idx),
             (int32_t)(read_off | ((rep_ok ? 1 : 0) << 30)),
             (int32_t)seq_off};
}

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

// T4_PROF=1 phase counters (seconds in ns ticks + volumes), dumped by
// t4o_prof_dump / t4o_prof_dump7.
std::atomic<int64_t> g_t_hits{0}, g_t_chain{0}, g_t_score{0}, g_t_rest{0};
std::atomic<int64_t> g_t_gsort{0}, g_t_gfin{0};  // chain sub-buckets
std::atomic<int64_t> g_t_ssort{0}, g_t_sdp{0}, g_c_hits{0}, g_c_ovl{0};
inline int64_t now_ns() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}
bool prof_on() {
  static int v = -1;
  if (v == -1) {
    const char* e = getenv("T4_PROF");
    v = (e && e[0] == '1') ? 1 : 0;
  }
  return v == 1;
}

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

// Binary search over the contiguous top-values mirror (top_a[k] =
// hits[top[k]].a) — the indirect hits[top[m]].a loads dominated LIS on
// IMGT-scale hit volumes.
int binary_search_lis(const std::vector<int> &top_a, int size, int val_a) {
  int l = 0, r = size - 1;
  while (l <= r) {
    int m = (l + r) / 2;
    if (val_a == top_a[m]) return m;
    if (val_a < top_a[m])
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

  static thread_local std::vector<int> top, top_a, link;
  top.assign(size, 0);
  top_a.assign(size, hits[0].a);
  link.assign(size, -1);
  int ret = 1;
  for (int i = 1; i < size; i++) {
    const RC &hi = hits[i];
    int tag;
    if (top_a[ret - 1] <= hi.a)
      tag = ret - 1;
    else
      tag = binary_search_lis(top_a, ret, hi.a);
    if (tag == -1) {
      top[0] = i;
      top_a[0] = hi.a;
      link[i] = -1;
    } else if (hi.a > top_a[tag]) {
      if (tag == ret - 1) {
        top[ret] = i;
        top_a[ret] = hi.a;
        ret += 1;
        link[i] = top[tag];
      } else if (hi.a < top_a[tag + 1]) {
        top[tag + 1] = i;
        top_a[tag + 1] = hi.a;
        link[i] = top[tag];
      }
    } else if (hi.a == top_a[tag]) {
      if (fabs_(hi.a - hi.b - avg_diff) <
          fabs_(hits[top[tag]].a - hits[top[tag]].b - avg_diff)) {
        top[tag] = i;
        top_a[tag] = hi.a;
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
      int st = hits[i].sk();
      int bucket = hits[i].bucket;
      int j = i + 1;
      while (j < hit_size && hits[j].bucket == bucket)
        j++;
      if (!M.is_ref[hits[i].sq()]) {
        if (j - i > novel_min_hit[st]) possible_overlap_cnt[st] += 1;
        if (j - i > longest_hits[st]) longest_hits[st] = j - i;
      }
      if (!remove_only_repeats[st]) {
        int cnt = 0;
        for (int k = i; k < j; k++)
          if (hits[k].rep_ok()) cnt++;
        if (cnt >= novel_min_hit[st]) remove_only_repeats[st] = true;
      }
      // Reference quirk (SeqSet.hpp:811 `i = j` inside a `++i` for-loop):
      // the scan resumes at j+1, so every subsequent group is counted one
      // hit short and single-hit groups are skipped entirely.  This skews
      // possible_overlap_cnt / longest_hits / remove_only_repeats, which
      // gates the novel_min_hit adaptation — observable on long-read
      // corpora where the count sits near the 100 bucket boundary.
      i = j + 1;
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

  // Pack (diff, seq_off, read_off) into one uint64 so the group sort
  // compares plain integers and the per-cluster (b, a) re-sort is just
  // `key & MASK42` (layout [63:42]=diff+bias [41:21]=seq_off
  // [20:0]=read_off) — no intermediate Coord array.  Offsets fit 21
  // bits each in this domain (reads/contigs << 2M); fall back to the
  // struct sort if a group ever exceeds that.  Scratch vectors live at
  // function scope: a per-group `static thread_local` access re-does the
  // TLS load every group, and groups number in the millions per batch.
  constexpr uint64_t M21 = (1u << 21) - 1;
  constexpr uint64_t MASK42 = ((uint64_t)1 << 42) - 1;
  static thread_local std::vector<uint64_t> keys_tls;
  static thread_local std::vector<Coord> hcd_tls;
  static thread_local std::vector<RC> concordant_tls;
  static thread_local std::vector<uint64_t> ckeys_tls;
  std::vector<uint64_t>& keys = keys_tls;
  std::vector<Coord>& hcd = hcd_tls;
  std::vector<RC>& concordant = concordant_tls;
  std::vector<uint64_t>& ckeys = ckeys_tls;

  int i = 0;
  while (i < hit_size) {
    int st = hits[i].sk();
    int seq_idx = hits[i].sq();
    int bucket = hits[i].bucket;
    int j = i + 1;
    while (j < hit_size && hits[j].bucket == bucket)
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
        if (hits[k].rep_ok()) {
          has_unique = true;
          break;
        }
      if (!has_unique) {
        i = j;
        continue;
      }
    }

    bool gprof = prof_on();
    int64_t tg0 = gprof ? now_ns() : 0;
    keys.clear();
    hcd.clear();
    // Build keys optimistically while range-checking (the packed form
    // holds for every real domain — reads/contigs << 2M); the pre-scan
    // this fuses away was a full extra pass over the batch's hits
    // (1.7B at the 897k annotate scale).
    bool packed = true;
    keys.reserve(j - i);
    for (int k = i; k < j; k++) {
      uint32_t ro = (uint32_t)hits[k].ro();
      uint32_t so = (uint32_t)hits[k].seq_off;
      if ((ro | so) >= (1u << 21)) {
        packed = false;
        keys.clear();
        break;
      }
      int64_t diff = (int64_t)ro - (int64_t)so;
      keys.push_back(((uint64_t)(diff + (1 << 21)) << 42) |
                     ((uint64_t)so << 21) | (uint64_t)ro);
    }
    if (packed) {
      std::sort(keys.begin(), keys.end());
    } else {
      hcd.reserve(j - i);
      for (int k = i; k < j; k++)
        hcd.push_back({hits[k].ro(), hits[k].seq_off,
                       hits[k].ro() - hits[k].seq_off});
      std::sort(hcd.begin(), hcd.end(), [](const Coord &x, const Coord &y) {
        if (x.diff != y.diff) return x.diff < y.diff;
        if (x.seq_off != y.seq_off) return x.seq_off < y.seq_off;
        return x.read_off < y.read_off;
      });
    }
    if (gprof) g_t_gsort += now_ns() - tg0;
    int group_n = j - i;
    int adjust_radius = M.is_ref[seq_idx] ? C.radius : 0;

    int s = 0;
    while (s < group_n) {
      int e = s + 1;
      if (packed) {
        int prev_d = (int)(keys[s] >> 42);
        while (e < group_n) {
          int d = (int)(keys[e] >> 42);
          if (iabs(d - prev_d) > adjust_radius) break;
          prev_d = d;
          e++;
        }
      } else {
        while (e < group_n) {
          int diff = hcd[e].diff - hcd[e - 1].diff;
          if (iabs(diff) > adjust_radius) break;
          e++;
        }
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
          if (hits[k].rep_ok()) {
            has_unique = true;
            break;
          }
        if (!has_unique) {
          s = e;
          continue;
        }
      }

      concordant.clear();
      concordant.reserve(e - s);
      if (packed) {
        if (adjust_radius > 0 && (keys[s] >> 42) != (keys[e - 1] >> 42)) {
          // (b, a) re-sort: the low 42 key bits already ARE (b << 21 | a).
          ckeys.clear();
          ckeys.reserve(e - s);
          for (int k = s; k < e; k++) ckeys.push_back(keys[k] & MASK42);
          std::sort(ckeys.begin(), ckeys.end());
          for (uint64_t key : ckeys)
            concordant.push_back({(int)(key & M21), (int)(key >> 21)});
        } else {
          // Single-diff clusters are already (b, a)-ordered by the group
          // sort (key layout is (diff, b, a)), so the re-sort is a no-op.
          for (int k = s; k < e; k++)
            concordant.push_back({(int)(keys[k] & M21),
                                  (int)((keys[k] >> 21) & M21)});
        }
      } else {
        for (int k = s; k < e; k++)
          concordant.push_back({hcd[k].read_off, hcd[k].seq_off});
        if (adjust_radius > 0)
          std::sort(concordant.begin(), concordant.end(),
                    [](const RC &x, const RC &y) {
                      if (x.b != y.b) return x.b < y.b;
                      return x.a < y.a;
                    });
      }
      static thread_local std::vector<RC> lis;
      bool lprof = prof_on();
      int64_t tl0 = lprof ? now_ns() : 0;
      longest_increasing_subsequence(concordant, lis);
      if (lprof) g_t_rest += now_ns() - tl0;
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

      int64_t tf0 = gprof ? now_ns() : 0;
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
      if (gprof) g_t_gfin += now_ns() - tf0;
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
    int sq = h.sq();
    if (!M.is_ref[sq]) continue;
    const uint8_t *n4 = M.name4 + 4 * sq;
    if (n4[3] == 'V' && h.seq_off >= M.seq_len[sq] - 31)
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
  static thread_local std::vector<uint64_t> codes;
  static thread_local std::vector<uint8_t> valid;
  static thread_local std::string rc;

  const bool use_csr = E.csr_valid && !E.consider_barcode &&
                       E.csr_kl == kl;
  auto scan = [&](const char *s, int slen, int st) {
    window_codes(s, slen, kl, codes, valid);
    int n = (int)codes.size();
    int skip_cnt = 0;
    uint64_t prev_code = 0;
    for (int w = 0; w < n; w++) {
      if (C.down_sample > 1 && w % C.down_sample != 0) continue;
      uint64_t code = codes[w];
      if (w == 0 || code != prev_code) {
        const std::pair<int, int> *pdata = nullptr;
        int size = 0;
        if (valid[w]) {
          if (use_csr) {
            int32_t a = E.csr_off[code];
            size = E.csr_off[code + 1] - a;
            pdata = E.csr_post.data() + a;
          } else {
            const PostVec *pv =
                const_cast<Engine &>(E).index.find(make_key(E, code, barcode));
            if (pv != nullptr) {
              pdata = pv->data();
              size = pv->size();
            }
          }
        }
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
          for (int pi = 0; pi < size; pi++)
            if (puse[pdata[pi].first]) repeats++;
        } else {
          repeats = size;
        }
        if (barcode != -1) repeats = 1;
        for (int pi = 0; pi < size; pi++) {
          const std::pair<int, int> &p = pdata[pi];
          if (puse != nullptr && !puse[p.first]) continue;
          if (barcode != -1 && M.barcode[p.first] != barcode) continue;
          hits.push_back(make_hit(st == 1 ? 1 : 0, p.first, w, p.second,
                                  repeats <= 10000));
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
    // True bucket sort by (strand_key, seq_idx), preserving insertion
    // order within buckets (the reference's SortHits fast path,
    // SeqSet.hpp:1312-1339) — O(n + seqs) instead of O(n log n).
    static thread_local std::vector<int> cnt;
    static thread_local std::vector<Hit> out;
    cnt.assign(2 * n_seqs + 1, 0);
    for (const Hit &hh : hits) cnt[hh.sk() * n_seqs + hh.sq() + 1]++;
    for (int i = 1; i <= 2 * n_seqs; i++) cnt[i] += cnt[i - 1];
    out.resize(hits.size());
    for (const Hit &hh : hits)
      out[cnt[hh.sk() * n_seqs + hh.sq()]++] = hh;
    hits.swap(out);
  } else {
    // Python's sorted() is stable; (strand, idx, read_off, seq_off) keys
    // are unique in practice but stable_sort removes any doubt.  The
    // signed bucket compares as (strand, seq) lexicographic.
    std::stable_sort(hits.begin(), hits.end(), [](const Hit &x, const Hit &y) {
      if (x.bucket != y.bucket) return x.bucket < y.bucket;
      if (x.ro() != y.ro()) return x.ro() < y.ro();
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

void t4o_clear(void *h) {
  ((Engine *)h)->index.clear();
  invalidate_csr((Engine *)h);
}

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
    Key key = make_key(*E, codes[w], barcode);
    E->index[key].push_back({sid, w + shift});
  }
  invalidate_csr(E);
}

// Batched build for full rebuilds (SeqSet clean / annotator load): one
// FFI call for all seqs, with the postings map reserved up front so the
// 5M+ inserts of a 10k-contig rebuild don't rehash repeatedly.
void t4o_build_batch_mt(void *h, const char *blob, const int64_t *offs,
                        const int32_t *sids, const int64_t *barcodes, int n,
                        int kl, int threads);

void t4o_build_batch(void *h, const char *blob, const int64_t *offs,
                     const int32_t *sids, const int64_t *barcodes, int n,
                     int kl) {
  t4o_build_batch_mt(h, blob, offs, sids, barcodes, n, kl, 1);
}

// Threaded bulk build: shards are independent maps, so worker t owns a
// contiguous range of shard ids, scans every read's windows (the rolling
// codes are cheap to recompute), and inserts only its shards' keys — in
// global read order, so per-key postings sequences are exactly the
// serial build's.
void t4o_build_batch_mt(void *h, const char *blob, const int64_t *offs,
                        const int32_t *sids, const int64_t *barcodes, int n,
                        int kl, int threads) {
  Engine *E = (Engine *)h;
  invalidate_csr(E);
  int64_t total = 0;
  for (int i = 0; i < n; i++) total += offs[i + 1] - offs[i];
  // Barcode-salted keys are near-unique (one cell's windows rarely
  // collide with another's), so reserve the full window count there —
  // an underestimate rehashes a multi-10M-node table mid-build.
  size_t est = (size_t)total / (E->consider_barcode ? 1 : 2);
  E->index.reserve(E->index.size() + est);
  int nw = threads;
  if (nw > ShardedIndex::NS) nw = ShardedIndex::NS;
  if (nw < 1) nw = 1;
  if (nw == 1 || total < (int64_t)1 << 20) {
    for (int i = 0; i < n; i++)
      t4o_build_from_read(h, blob + offs[i], (int)(offs[i + 1] - offs[i]),
                          kl, sids[i], barcodes[i], 0);
    return;
  }
  auto work = [&](int shard_lo, int shard_hi) {
    std::vector<uint64_t> codes;
    std::vector<uint8_t> valid;
    for (int i = 0; i < n; i++) {
      const char *s = blob + offs[i];
      int len = (int)(offs[i + 1] - offs[i]);
      window_codes(s, len, kl, codes, valid);
      int wn = (int)codes.size();
      for (int w = 0; w < wn; w++) {
        if (!valid[w]) continue;
        if (w != 1) {
          uint64_t prev = (w == 0) ? 0 : codes[w - 1];
          if (codes[w] == prev) continue;
        }
        Key key = make_key(*E, codes[w], barcodes[i]);
        int sh = ShardedIndex::shard_of(key);
        if (sh < shard_lo || sh >= shard_hi) continue;
        E->index.shards[sh][key].push_back({sids[i], w});
      }
    }
  };
  std::vector<std::thread> ts;
  int per = (ShardedIndex::NS + nw - 1) / nw;
  for (int t = 0; t < nw; t++) {
    int lo = t * per;
    int hi = lo + per;
    if (hi > ShardedIndex::NS) hi = ShardedIndex::NS;
    if (lo >= hi) break;
    ts.emplace_back(work, lo, hi);
  }
  for (auto &th : ts) th.join();
}

// Ordered single-seq index resync: remove the old consensus's postings
// and insert the new one's at their (sid, w)-sorted positions.  A full
// rebuild (t4o_build_batch over seqs in sid order) leaves every postings
// vector sorted by (sid, w); ordered insertion reproduces that exact
// state, so resyncing the handful of impute-rewritten contigs is
// bit-equivalent to the reference annotator's whole-set Clean()
// (SeqSet.hpp:4591-4622) at a fraction of the cost (no 10M-node map
// teardown + rebuild).
extern "C" void t4o_resync_seq(void *h, const char *olds, int old_len,
                               const char *news, int new_len, int kl,
                               int sid, int64_t barcode);

// KmerIndex.remove_from_read (ops/kmer_index.py:98-104).
void t4o_remove_from_read(void *h, const char *s, int len, int kl, int sid,
                          int64_t barcode, int offset) {
  Engine *E = (Engine *)h;
  invalidate_csr(E);
  std::vector<uint64_t> codes;
  std::vector<uint8_t> valid;
  window_codes(s, len, kl, codes, valid);
  int n = (int)codes.size();
  for (int w = 0; w < n; w++) {
    if (!valid[w]) continue;
    Key key = make_key(*E, codes[w], barcode);
    PostVec *pv = E->index.find(key);
    if (pv == nullptr) continue;
    PostVec &lst = *pv;
    for (int i = 0; i < lst.size(); i++) {
      if (lst[i].first == sid && lst[i].second == w + offset) {
        lst.erase(lst.begin() + i);
        if (lst.empty()) E->index.erase(key);
        break;
      }
    }
  }
}

extern "C" void t4o_resync_seq(void *h, const char *olds, int old_len,
                               const char *news, int new_len, int kl,
                               int sid, int64_t barcode) {
  Engine *E = (Engine *)h;
  invalidate_csr(E);
  t4o_remove_from_read(h, olds, old_len, kl, sid, barcode, 0);
  std::vector<uint64_t> codes;
  std::vector<uint8_t> valid;
  window_codes(news, new_len, kl, codes, valid);
  int n = (int)codes.size();
  for (int w = 0; w < n; w++) {
    if (!valid[w]) continue;
    if (w != 1) {
      uint64_t prev = (w == 0) ? 0 : codes[w - 1];
      if (codes[w] == prev) continue;
    }
    Key key = make_key(*E, codes[w], barcode);
    auto &lst = E->index[key];
    auto it = std::lower_bound(lst.begin(), lst.end(), std::make_pair(sid, w));
    lst.insert(it, {sid, w});
  }
}

// KmerIndex.update_from_read (ops/kmer_index.py:106-119).
void t4o_update_from_read(void *h, const char *s, int len, int kl,
                          int64_t barcode, int shift, int old_id, int new_id) {
  Engine *E = (Engine *)h;
  invalidate_csr(E);
  std::vector<uint64_t> codes;
  std::vector<uint8_t> valid;
  window_codes(s, len, kl, codes, valid);
  int n = (int)codes.size();
  for (int w = 0; w < n; w++) {
    if (!valid[w]) continue;
    Key key = make_key(*E, codes[w], barcode);
    PostVec *pv = E->index.find(key);
    if (pv == nullptr) continue;
    for (auto &p : *pv) {
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
  for (const auto &m : E->index.shards)
    for (const auto &kv : m) tot += (int64_t)kv.second.size();
  out[1] = tot;
}


// ---- Canonical k-mer counting (ops/kmer_count.py; KmerCount.hpp) ---------
//
// Port of the 21-mer support counter with the reference's persistent
// stale sort buffer and N-handling quirks (KmerCount.hpp:64-288,
// ops/kmer_count.py docstring).  Single-thread semantics, matching the
// host implementation exactly.

namespace {

// Flat open-addressing count table (linear probe, pow-2 capacity): the
// node-based unordered_map paid one allocation plus several dependent
// cache misses per unique 21-mer (~700 ns/insert measured — 5.6s of a
// 14s bulk -t4 run at 100k reads); contiguous 16B slots with one probe
// cut that ~6x.  EMPTY = ~0 is safe: canonical codes are min(code, rc)
// with k <= 31, so all-ones never occurs.
struct FlatCounts {
  static constexpr uint64_t EMPTY = ~0ull;
  std::vector<uint64_t> keys;
  std::vector<int64_t> vals;
  size_t mask = 0, n = 0;
  static inline uint64_t hashk(uint64_t x) {
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdull;
    x ^= x >> 33;
    x *= 0xc4ceb9fe1a85ec53ull;
    x ^= x >> 33;
    return x;
  }
  void init(size_t cap) {
    size_t c = 16;
    while (c < cap * 2) c <<= 1;
    keys.assign(c, EMPTY);
    vals.assign(c, 0);
    mask = c - 1;
    n = 0;
  }
  void grow() {
    std::vector<uint64_t> ok;
    std::vector<int64_t> ov;
    ok.swap(keys);
    ov.swap(vals);
    keys.assign(ok.empty() ? 16 : ok.size() * 2, EMPTY);
    vals.assign(keys.size(), 0);
    mask = keys.size() - 1;
    for (size_t i = 0; i < ok.size(); i++)
      if (ok[i] != EMPTY) {
        size_t s = hashk(ok[i]) & mask;
        while (keys[s] != EMPTY) s = (s + 1) & mask;
        keys[s] = ok[i];
        vals[s] = ov[i];
      }
  }
  inline int64_t* upsert(uint64_t k2) { return upsert_h(k2, hashk(k2)); }
  inline int64_t* upsert_h(uint64_t k2, uint64_t hv) {
    if (mask == 0) init(16);
    else if (n * 2 >= keys.size()) grow();
    size_t s = hv & mask;
    while (keys[s] != EMPTY && keys[s] != k2) s = (s + 1) & mask;
    if (keys[s] == EMPTY) {
      keys[s] = k2;
      n++;
    }
    return &vals[s];
  }
  inline int64_t get(uint64_t k2) const {
    if (mask == 0) return 0;
    size_t s = hashk(k2) & mask;
    while (keys[s] != EMPTY) {
      if (keys[s] == k2) return vals[s];
      s = (s + 1) & mask;
    }
    return 0;
  }
  void reserve_more(size_t add) {
    if (mask == 0) {
      init(add < 16 ? 16 : add);
      return;
    }
    while ((n + add) * 2 >= keys.size()) grow();
  }
};

// 8-way hash-sharded counter: shards are disjoint by the hash's top
// bits, so the threaded batch insert needs no locks or merges — worker
// t scans every read's windows (recomputing rolling codes is cheap) and
// touches only its shards, exactly the scheme of the overlap index's
// threaded build (t4o_build_batch_mt).
struct ShardedCounts {
  static constexpr int NS = 8;
  FlatCounts sh[NS];
  static inline int shard_of(uint64_t hv) { return (int)(hv >> 61); }
  inline int64_t* upsert(uint64_t k2) {
    uint64_t hv = FlatCounts::hashk(k2);
    return sh[shard_of(hv)].upsert_h(k2, hv);
  }
  inline int64_t get(uint64_t k2) const {
    uint64_t hv = FlatCounts::hashk(k2);
    const FlatCounts& f = sh[shard_of(hv)];
    if (f.mask == 0) return 0;
    size_t s = hv & f.mask;
    while (f.keys[s] != FlatCounts::EMPTY) {
      if (f.keys[s] == k2) return f.vals[s];
      s = (s + 1) & f.mask;
    }
    return 0;
  }
  void reserve_more(size_t add) {
    for (auto& f : sh) f.reserve_more(add / NS + 1);
  }
};

struct KCount {
  int k;
  int64_t max_read_len = -1;
  ShardedCounts counts;
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
  *((KCount *)h)->counts.upsert(code) = c;
}

int64_t t4kc_get_count_code(void *h, uint64_t code) {
  KCount *K = (KCount *)h;
  return K->counts.get(code);
}

int t4kc_add_count(void *h, const char *read, int len) {
  KCount *K = (KCount *)h;
  if (len < K->k) return 0;
  static thread_local std::vector<uint64_t> codes;
  static thread_local std::vector<uint8_t> valid;
  canon_codes(read, len, K->k, codes, valid);
  K->counts.reserve_more(codes.size());
  for (size_t w = 0; w < codes.size(); w++)
    if (valid[w]) (*K->counts.upsert(codes[w]))++;
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
    v = K->counts.get(codes[w]);
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

// One call for a whole ingest batch (assembler.py ingest count_myself
// loop): per-read ctypes overhead dominated the Python loop at 68k reads.
void t4kc_add_count_batch(void *h, const char *blob, const int64_t *offs,
                          int n_reads) {
  for (int i = 0; i < n_reads; i++)
    t4kc_add_count(h, blob + offs[i], (int)(offs[i + 1] - offs[i]));
}

// Threaded bulk 21-mer count: counting is commutative and the shards
// are hash-disjoint, so worker t scans every read and inserts only its
// shards' codes — identical final counts to the serial path.
void t4kc_add_count_batch_mt(void *h, const char *blob, const int64_t *offs,
                             int n_reads, int n_threads) {
  KCount *K = (KCount *)h;
  int nt = n_threads;
  if (nt > ShardedCounts::NS) nt = ShardedCounts::NS;
  int64_t total = 0, maxlen = K->max_read_len;
  for (int i = 0; i < n_reads; i++) {
    int64_t L = offs[i + 1] - offs[i];
    total += L;
    if (L > maxlen) maxlen = L;
  }
  if (nt <= 1 || total < (int64_t)1 << 20) {
    t4kc_add_count_batch(h, blob, offs, n_reads);
    return;
  }
  K->max_read_len = maxlen;
  int per = (ShardedCounts::NS + nt - 1) / nt;
  std::vector<std::thread> ths;
  for (int t = 0; t < nt; t++) {
    int lo = t * per, hi = lo + per;
    if (hi > ShardedCounts::NS) hi = ShardedCounts::NS;
    if (lo >= hi) break;
    ths.emplace_back([=]() {
      std::vector<uint64_t> codes;
      std::vector<uint8_t> valid;
      for (int sh = lo; sh < hi; sh++)
        K->counts.sh[sh].reserve_more((size_t)total / ShardedCounts::NS);
      for (int i = 0; i < n_reads; i++) {
        int len = (int)(offs[i + 1] - offs[i]);
        if (len < K->k) continue;
        canon_codes(blob + offs[i], len, K->k, codes, valid);
        for (size_t w = 0; w < codes.size(); w++) {
          if (!valid[w]) continue;
          uint64_t hv = FlatCounts::hashk(codes[w]);
          int sh = ShardedCounts::shard_of(hv);
          if (sh < lo || sh >= hi) continue;
          ++*K->counts.sh[sh].upsert_h(codes[w], hv);
        }
      }
    });
  }
  for (auto& th : ths) th.join();
}

// Batched GetCountStatsAndTrim over the shared counter.  SERIAL on
// purpose: the persistent sort buffer carries stale values across calls
// (the reference quirk), so read order is semantics.  qual_blob may be
// NULL (no-qual mode); out_i64 rows are {min, median, ok, new_len},
// out_f64 is {avg} per read.
void t4kc_stats_trim_batch(void *h, const char *blob, const int64_t *offs,
                           const char *qual_blob, int has_qual, int n_reads,
                           int64_t *out_i64, double *out_f64) {
  for (int i = 0; i < n_reads; i++) {
    int len = (int)(offs[i + 1] - offs[i]);
    t4kc_stats_trim(h, blob + offs[i], len,
                    has_qual ? qual_blob + offs[i] : nullptr, has_qual,
                    out_i64 + 4 * i, out_f64 + i);
  }
}

// Per-barcode 21-mer pass (assembler.py _barcode_kmer_pass; reference
// main.cpp:1123-1193): reads arrive sorted by barcode; each consecutive
// group gets a fresh counter (add_count over the group, then per-read
// stats with no qual/trim).  Groups are independent -> threaded.
void t4kc_barcode_pass(int k, const char *blob, const int64_t *offs,
                       const int64_t *barcodes, int n_reads,
                       int64_t max_read_len, int n_threads,
                       int64_t *out_min, int64_t *out_med, double *out_avg) {
  // Collect group boundaries.
  std::vector<int> starts;
  for (int i = 0; i < n_reads; i++)
    if (i == 0 || barcodes[i] != barcodes[i - 1]) starts.push_back(i);
  starts.push_back(n_reads);
  int n_groups = (int)starts.size() - 1;
  auto do_group = [&](int g) {
    int lo = starts[g], hi = starts[g + 1];
    KCount kc;
    kc.k = k;
    kc.max_read_len = max_read_len;
    int64_t oi[4];
    double of;
    for (int i = lo; i < hi; i++)
      t4kc_add_count(&kc, blob + offs[i], (int)(offs[i + 1] - offs[i]));
    for (int i = lo; i < hi; i++) {
      t4kc_stats_trim(&kc, blob + offs[i], (int)(offs[i + 1] - offs[i]),
                      nullptr, 0, oi, &of);
      out_min[i] = oi[0];
      out_med[i] = oi[1];
      out_avg[i] = of;
    }
  };
  if (n_threads <= 1 || n_groups < 4) {
    for (int g = 0; g < n_groups; g++) do_group(g);
  } else {
    std::atomic<int> cursor{0};
    int nt = n_threads < n_groups ? n_threads : n_groups;
    std::vector<std::thread> ts;
    ts.reserve(nt);
    for (int t = 0; t < nt; t++)
      ts.emplace_back([&]() {
        for (;;) {
          int g = cursor.fetch_add(1);
          if (g >= n_groups) break;
          do_group(g);
        }
      });
    for (auto &t : ts) t.join();
  }
}

}  // extern "C"

}  // extern "C"

// ===========================================================================
// Scored query engine: the COMPLETE GetOverlapsFromRead (similarity pass,
// dominance filters, low-complexity, core rescue, thresholds) plus the
// detail-0 AnnotateRead (assembler quick annotation) and AssignRead, all
// native.  Ports engine/overlap.py:700-1152, engine/annotate.py:87-497
// (detail 0) and engine/assemble.py:1009-1032 semantics-identically
// (reference: SeqSet.hpp:1508-2124, 6016-6576 detail-0 subset, 4632-4701,
// 5160-5287).
//
// Per-seq data (name, consensus, posWeight pointer, CDR3 anchor) is
// registered by Python (engine/overlap_native.py) whenever a sequence is
// created or mutated; posWeight arrays are Python-owned numpy buffers whose
// in-place mutations need no re-registration (the pointer is stable).
//
// DP primitives come from libt4align.so (linked; see Makefile).
// ===========================================================================

#include <atomic>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <map>
#include <thread>

namespace {

// Work-stealing parallel-for: workers grab fixed-size index blocks from a
// shared atomic cursor.  Read costs in these batches are highly skewed
// (repeat-heavy reads chain 10-100x longer), so static chunking leaves
// threads idle behind one straggler chunk; block-stealing keeps all cores
// busy to the end.  The calling thread doubles as worker 0.
template <class F>
void steal_for(int n, int n_threads, int block, F&& body) {
  std::atomic<int> next{0};
  auto worker = [&](int tid) {
    for (;;) {
      int lo = next.fetch_add(block, std::memory_order_relaxed);
      if (lo >= n) break;
      int hi = lo + block < n ? lo + block : n;
      body(tid, lo, hi);
    }
  };
  std::vector<std::thread> ts;
  ts.reserve((size_t)(n_threads > 1 ? n_threads - 1 : 0));
  for (int t = 1; t < n_threads; t++) ts.emplace_back(worker, t);
  worker(0);
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {
int64_t t4_global_alignment_counts(const char* t, int lent, const char* p,
                                   int lenp, int* out3);
int64_t t4_global_alignment_posweight_counts(const int32_t* w, int lent,
                                             const char* p, int lenp,
                                             int* out3);
void t4_extend_overlap(const int32_t* w, const char* r, int read_len,
                       int seq_len, int read_start, int read_end,
                       int seq_start, int seq_end, int64_t* out8);
void t4_chain_score2(const int32_t* coords, int n_coords, int kl, int radius,
                     int nomatch_gap_limit, int is_ref, const char* consensus,
                     const int32_t* posweight, const char* r, int read_start,
                     int read_end, int64_t* out);
void t4_chain_score(const int32_t* coords, int n_coords, int kl, int radius,
                    int nomatch_gap_limit, int is_ref, const char* consensus,
                    const int32_t* posweight, const char* r, int64_t* out);
}

namespace {

// Prefix ACGT counts of a read ((len+1) x 4, pc[0]=0), built once per
// query so every overlap's low-complexity test (t4_chain_score2's tail,
// SeqSet.hpp:1990-2007) is O(1) instead of an O(span) rescan — the scan
// dominated the score phase at IMGT hit volumes (~200 overlaps/query).
void build_prefix_counts(const char* s, int len, std::vector<int32_t>& pc) {
  pc.assign((size_t)(len + 1) * 4, 0);
  for (int i = 0; i < len; i++) {
    const int32_t* prev = pc.data() + (size_t)i * 4;
    int32_t* cur = pc.data() + (size_t)(i + 1) * 4;
    cur[0] = prev[0];
    cur[1] = prev[1];
    cur[2] = prev[2];
    cur[3] = prev[3];
    switch (s[i]) {
      case 'A': cur[0]++; break;
      case 'C': cur[1]++; break;
      case 'G': cur[2]++; break;
      case 'T': cur[3]++; break;
      default: break;  // N skipped
    }
  }
}

inline int low_complexity_from_prefix(const std::vector<int32_t>& pc,
                                      int read_start, int read_end) {
  const int32_t* a = pc.data() + (size_t)read_start * 4;
  const int32_t* b = pc.data() + (size_t)(read_end + 1) * 4;
  long low_cnt = 0, low_total = 0;
  for (int i = 0; i < 4; i++) {
    long c = b[i] - a[i];
    if (c <= 2) {
      low_cnt++;
      low_total += c;
    }
  }
  if (low_total * 7 >= read_end - read_start + 1) return 0;
  return low_cnt >= 2 ? 1 : 0;
}

}  // namespace

namespace {

// Registered per-seq record (mirror of engine/types.py SeqWrapper fields the
// native paths read).
struct SeqRec {
  bool active = false;
  bool is_ref = false;
  int32_t barcode = -1;
  int32_t cdr3_anchor = -1;  // info[2][0] for IMGT V refs
  std::string name;
  std::string consensus;
  const int32_t* pw = nullptr;  // (L,4) int32; Python-owned in registry
                                // mode, own_pw.data() in master mode
  // Master-mode owned state (engine/types.py SeqWrapper fields):
  std::vector<int32_t> own_pw;  // (L,4) flattened, or compressed flat
  int64_t num_read = 0;
  int32_t min_left_ext_anchor = 0;
  int32_t min_right_ext_anchor = 0;
  bool index_flag = true;
  bool pw_compressed = false;
  bool info_zero = false;  // info was zeroed (input_novel_read)
  // CDR1/2 IMGT coords for V refs (engine/types.py info[0..1]; set by
  // t4o_reg_seq_cdr after registration): {c1s, c1e, c2s, c2e}.
  int32_t cdr_info[4] = {-1, -1, -1, -1};
};

struct Engine2 {
  std::vector<SeqRec> seqs;
  // flat meta arrays for the query layer (kept in sync with seqs)
  std::vector<int8_t> m_is_ref;
  std::vector<int32_t> m_barcode;
  std::vector<int32_t> m_seq_len;
  std::vector<uint8_t> m_name4;
};

// One registry per engine handle; keyed by the Engine pointer.  (The Engine
// struct is defined in an earlier anonymous namespace section; we keep the
// registry in a side table to avoid touching its layout/ABI.)
std::map<void*, Engine2> g_registries;

Engine2& registry_for(void* h) { return g_registries[h]; }

// Scored overlap: the final product of GetOverlapsFromRead.
struct SOv {
  int seq_idx = -1;
  int read_start = -1, read_end = -1;
  int strand = 1;  // +1/-1
  int seq_start = -1, seq_end = -1;
  int64_t match_cnt = 0;
  int64_t indel_cnt = 0;
  double similarity = 0.0;
  int info_from_hits = 0;
  std::vector<RC> coords;  // consumed internally; not exported
};

// Overlap::sort_key() (engine/types.py:78-91; reference SeqSet.hpp:103-127).
inline bool sov_key_less(const SOv& a, const SOv& b) {
  if (a.match_cnt != b.match_cnt) return a.match_cnt > b.match_cnt;
  if (a.similarity != b.similarity) return a.similarity > b.similarity;
  long sa = a.read_end - a.read_start, sb = b.read_end - b.read_start;
  if (sa != sb) return sa > sb;
  if (a.seq_idx != b.seq_idx) return a.seq_idx < b.seq_idx;
  if (a.strand != b.strand) return a.strand < b.strand;
  if (a.read_start != b.read_start) return a.read_start < b.read_start;
  if (a.read_end != b.read_end) return a.read_end < b.read_end;
  if (a.seq_start != b.seq_start) return a.seq_start < b.seq_start;
  return a.seq_end < b.seq_end;
}

// sort_overlap_on_ref_key (engine/assemble.py:50-61; SeqSet.hpp:139-160).
inline bool sov_ref_key_less(const SOv& a, const SOv& b) {
  if (a.match_cnt != b.match_cnt) return a.match_cnt > b.match_cnt;
  if (a.similarity != b.similarity) return a.similarity > b.similarity;
  long sa = a.read_end - a.read_start, sb = b.read_end - b.read_start;
  if (sa != sb) return sa > sb;
  if (a.strand != b.strand) return a.strand < b.strand;
  if (a.seq_start != b.seq_start) return a.seq_start < b.seq_start;
  if (a.seq_end != b.seq_end) return a.seq_end < b.seq_end;
  if (a.read_start != b.read_start) return a.read_start < b.read_start;
  return a.read_end < b.read_end;
}

// Tuning parameters for one scored query (SeqSet tuning state).
struct SConf {
  int radius;
  int hit_len_required;
  bool is_long_seq_set;
  int nomatch_gap_limit;
  double novel_seq_similarity;
  double ref_seq_similarity;
  double repeat_similarity;
};

// is_overlap_substring_of (engine/overlap.py:673-694; SeqSet.hpp:1282-1308).
bool sov_is_substring_of(const Engine2& R, const SOv& a, const SOv& b,
                         bool strict, int max_mismatch) {
  if (a.seq_idx == -1 || b.seq_idx == -1) return false;
  if (a.read_start < b.read_start || a.read_end > b.read_end) return false;
  if (strict && a.read_end - a.read_start == b.read_end - b.read_start)
    return false;
  int offset = a.read_start - b.read_start;
  int mism = 0;
  const std::string& ca = R.seqs[a.seq_idx].consensus;
  const std::string& cb = R.seqs[b.seq_idx].consensus;
  int j = b.seq_start + offset;
  for (int i = a.seq_start; i <= a.seq_end; i++) {
    if (j >= (int)cb.size() || ca[i] != cb[j]) mism++;
    if (mism > max_mismatch) return false;
    j++;
  }
  return true;
}

// Device gap-fill oracle (two-phase batched annotation): phase 1 collects
// every is_ref gap-fill job a batch of queries would run (keyed by (query,
// sorted-overlap index, gap ordinal) — deterministic across phases because
// the chains and overlap order are identical); the Pallas kernel scores
// them and the traceback-bits walker produces (match, mismatch, indel)
// counts; phase 2 re-runs the batch consuming those counts instead of the
// CPU DP.  Count-dependent early breaks only shorten phase-2 consumption,
// so phase-1 enumerates a superset.
struct GapJob {
  int32_t q, ov_idx, gap_ord;
  int32_t seq_idx, t_from, t_len, r_from, r_len;
};
struct GapCtx {
  int mode = 0;  // 1 = collect, 2 = consume
  int q = 0;
  int ov_idx = 0;
  std::vector<GapJob>* sink = nullptr;          // collect (per thread)
  const std::unordered_map<uint64_t, int32_t>* oracle = nullptr;
  const int32_t* counts = nullptr;              // (n_jobs, 3)
  // annotate0 batches: pieces of one read share q, so the piece ordinal
  // rides in ov_idx's high bits and jobs anchor into the FULL forward
  // read (piece base + strand-aware anchor; see t4o_emit_gap_codes).
  int ov_base = 0;
  int ov_cap = 1 << 24;  // max ov_idx keyed (1<<16 under piece encoding)
  int strand = 1;     // current overlap's strand (set with ov_idx)
  bool piece_set = false;  // annotate0 sets real piece bounds per piece
  int piece_a = 0;    // full-read span of the current piece query
  int piece_b = 0;    // (piece_b only read for strand -1 anchors)
};
inline uint64_t gap_key(int q, int ov_idx, int gap_ord) {
  return ((uint64_t)(uint32_t)q << 34) | ((uint64_t)(uint32_t)ov_idx << 10) |
         (uint32_t)gap_ord;
}

// Chain scoring + low-complexity.  Without a GapCtx this defers to
// t4_chain_score2 (the exact code the host path runs); with one, is_ref
// gap fills are enumerated (collect) or answered from the device counts
// (consume), falling back to the CPU DP on a miss.
void score_chain(const Engine2& R, const SConf& C, int kl, const SOv& o,
                 const char* r, int64_t* out5, GapCtx* gctx = nullptr,
                 const std::vector<int32_t>* pc = nullptr) {
  const SeqRec& s = R.seqs[o.seq_idx];
  // RC is {int32 a; int32 b;}, so the coords vector's storage IS the
  // interleaved (a, b) int32 layout t4_chain_score2 consumes — no copy.
  static_assert(sizeof(RC) == 2 * sizeof(int32_t), "RC must pack to 2xi32");
  const int32_t* flat = reinterpret_cast<const int32_t*>(o.coords.data());
  if (gctx == nullptr || !s.is_ref) {
    if (pc != nullptr) {
      // Caller-built prefix counts: chain walk without the per-overlap
      // low-complexity rescan (bit-identical result by construction).
      t4_chain_score(flat, (int)o.coords.size(), kl, C.radius,
                     C.nomatch_gap_limit, s.is_ref ? 1 : 0,
                     s.is_ref ? s.consensus.data() : nullptr,
                     s.is_ref ? nullptr : s.pw, r, out5);
      out5[4] = low_complexity_from_prefix(*pc, o.read_start, o.read_end);
    } else {
      t4_chain_score2(flat, (int)o.coords.size(), kl, C.radius,
                      C.nomatch_gap_limit, s.is_ref ? 1 : 0,
                      s.is_ref ? s.consensus.data() : nullptr,
                      s.is_ref ? nullptr : s.pw, r, o.read_start, o.read_end,
                      out5);
    }
    return;
  }
  // Inline chain walk with oracle-backed gap fills (mirrors
  // t4_chain_score in align_kernels.cpp).
  const int32_t* coords = flat;
  int n_coords = (int)o.coords.size();
  int64_t match_cnt = 2 * kl, mismatch_cnt = 0, indel_cnt = 0;
  int sim_zero = 0;
  int gap_ord = 0;
  int radius = C.radius;
  int cnts[3];
  for (int j = 1; j < n_coords; j++) {
    int pa = coords[2 * (j - 1)], pb = coords[2 * (j - 1) + 1];
    int ca = coords[2 * j], cb = coords[2 * j + 1];
    bool same_diag = (pb - pa == cb - ca);
    bool need_fill = false;
    if (same_diag) {
      if (pa + kl - 1 >= ca) {
        match_cnt += 2 * (ca - pa);
      } else {
        need_fill = true;
      }
    } else {
      if (radius == 0) {  // is_ref here; novel handled by the early branch
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
        need_fill = true;
      }
    }
    if (need_fill) {
      match_cnt += 2 * kl;
      if (cb - (pb + kl) > C.nomatch_gap_limit ||
          ca - (pa + kl) > C.nomatch_gap_limit) {
        sim_zero = 1;
        break;
      }
      // gap_key packs the composite overlap ordinal into 24 bits and the
      // gap ordinal into 10; out-of-range jobs are simply not collected
      // (phase 2's lookup miss falls back to the CPU DP, so outputs are
      // unaffected).
      bool key_ok = gctx->ov_idx < gctx->ov_cap &&
                    (gctx->ov_base + gctx->ov_idx) < (1 << 24) &&
                    gap_ord < (1 << 10);
      if (gctx->mode == 1) {
        if (key_ok) {
          int r_loc = pa + kl;
          int32_t r_anchor = gctx->strand == 1 ? gctx->piece_a + r_loc
                                               : gctx->piece_b - r_loc;
          int32_t sflag = gctx->strand == 1 ? 0 : ((int32_t)1 << 30);
          gctx->sink->push_back({(int32_t)gctx->q,
                                 (int32_t)(gctx->ov_base + gctx->ov_idx),
                                 (int32_t)gap_ord,
                                 (int32_t)o.seq_idx | sflag,
                                 pb + kl, cb - pb - kl, r_anchor,
                                 ca - pa - kl});
        }
        gap_ord++;
        if (radius == 0) {
          // Count-dependent break below (indel_cnt) — keep the CPU DP so
          // the fill enumeration matches the real pass.  Never taken by
          // the annotator (radius 10).
          t4_global_alignment_counts(s.consensus.data() + pb + kl,
                                     cb - pb - kl, r + pa + kl, ca - pa - kl,
                                     cnts);
        } else {
          // radius>0 + is_ref: neither the chain walk nor the dominance
          // pass (novel-only) branches on fill counts, so collect mode
          // skips the DP entirely — that's the whole point of phase 1
          // being cheap.  Collect-mode similarities are discarded.
          cnts[0] = cnts[1] = cnts[2] = 0;
        }
      } else {
        auto it = key_ok ? gctx->oracle->find(gap_key(
                               gctx->q, gctx->ov_base + gctx->ov_idx,
                               gap_ord))
                         : gctx->oracle->end();
        gap_ord++;
        if (it != gctx->oracle->end()) {
          const int32_t* c3 = gctx->counts + 3 * it->second;
          cnts[0] = c3[0];
          cnts[1] = c3[1];
          cnts[2] = c3[2];
        } else {
          t4_global_alignment_counts(s.consensus.data() + pb + kl,
                                     cb - pb - kl, r + pa + kl,
                                     ca - pa - kl, cnts);
        }
      }
      match_cnt += 2 * cnts[0];
      mismatch_cnt += cnts[1];
      indel_cnt += cnts[2];
      if (same_diag) {
        if (radius == 0 && indel_cnt > 0) {
          sim_zero = 1;
          break;
        }
      }
      // cross-diagonal fills break only for novel seqs (not is_ref)
    }
  }
  out5[0] = match_cnt;
  out5[1] = mismatch_cnt;
  out5[2] = indel_cnt;
  out5[3] = sim_zero;
  if (pc != nullptr) {
    out5[4] = low_complexity_from_prefix(*pc, o.read_start, o.read_end);
    return;
  }
  long cnt4[4] = {0, 0, 0, 0};
  for (int i = o.read_start; i <= o.read_end; i++) {
    switch (r[i]) {
      case 'A': cnt4[0]++; break;
      case 'C': cnt4[1]++; break;
      case 'G': cnt4[2]++; break;
      case 'T': cnt4[3]++; break;
      default: break;
    }
  }
  long low_cnt = 0, low_total = 0;
  for (int i = 0; i < 4; i++)
    if (cnt4[i] <= 2) {
      low_cnt++;
      low_total += cnt4[i];
    }
  if (low_total * 7 >= o.read_end - o.read_start + 1)
    out5[4] = 0;
  else
    out5[4] = low_cnt >= 2 ? 1 : 0;
}

// The similarity/dominance pass (engine/overlap.py:808-1152; reference
// SeqSet.hpp:1508-2124 post-chaining part).  `overlaps` arrive unsorted
// from the hit/chain stage with similarity 0; `out` receives the final
// thresholded list in order.
void score_overlaps(const Engine2& R, const SConf& C, int kl,
                    const char* read, int len, int read_type,
                    std::vector<SOv>& overlaps, GapCtx* gctx = nullptr) {
  bool prof = prof_on();
  int64_t tp0 = prof ? now_ns() : 0;
  if (prof) g_c_ovl += (int64_t)overlaps.size();
  // Sort (overlap.py:808) — Python list.sort is stable.
  std::stable_sort(overlaps.begin(), overlaps.end(), sov_key_less);
  if (prof) {
    g_t_ssort += now_ns() - tp0;
  }
  int overlap_cnt = (int)overlaps.size();

  // Strand consistency filter (overlap.py:811-820).
  {
    std::vector<SOv> kept;
    kept.reserve(overlap_cnt);
    if (read_type == 0) {
      kept.push_back(std::move(overlaps[0]));
      for (int i = 1; i < overlap_cnt; i++)
        if (overlaps[i].strand == kept[0].strand)
          kept.push_back(std::move(overlaps[i]));
    } else {
      for (int i = 0; i < overlap_cnt; i++)
        if (overlaps[i].strand == 1) kept.push_back(std::move(overlaps[i]));
    }
    overlaps = std::move(kept);
    overlap_cnt = (int)overlaps.size();
  }

  std::string rc_read;
  revcomp(read, len, rc_read);

  // One prefix-count build per query orientation; every overlap's
  // low-complexity test becomes O(1) (see build_prefix_counts).
  static thread_local std::vector<int32_t> pc_fwd, pc_rc;
  build_prefix_counts(read, len, pc_fwd);
  build_prefix_counts(rc_read.c_str(), len, pc_rc);

  int first_ref = -1;
  int best_novel = -1;
  std::vector<int> representatives;
  int64_t out5[5];

  for (int i = 0; i < overlap_cnt; i++) {
    SOv& o = overlaps[i];
    const char* r = o.strand == 1 ? read : rc_read.c_str();
    o.info_from_hits = i;
    const SeqRec& sw = R.seqs[o.seq_idx];

    if (sw.is_ref) {
      if (first_ref == -1) first_ref = i;
    } else if (best_novel != -1 && read_type == 0 && overlap_cnt > 50) {
      // Dominance skips vs the best novel overlap (overlap.py:941-995).
      const SOv& bo = overlaps[best_novel];
      if (bo.read_start == 0 && bo.read_end == len - 1) {
        if (bo.similarity == 1) {
          o.similarity = 0;
          continue;
        } else if (bo.similarity > C.repeat_similarity &&
                   o.match_cnt < 0.9 * bo.match_cnt) {
          o.similarity = 0;
          continue;
        }
      }
      if (bo.read_start + len - 1 - bo.read_end < C.radius) {
        if (bo.similarity == 1 && o.match_cnt < 0.9 * bo.match_cnt) {
          o.similarity = 0;
          continue;
        } else if ((bo.similarity > C.repeat_similarity ||
                    C.is_long_seq_set) &&
                   o.match_cnt < 0.8 * bo.match_cnt) {
          o.similarity = 0;
          continue;
        }
      }
      int cons_len = (int)sw.consensus.size();
      if (o.seq_start - o.read_start >= C.radius &&
          o.seq_end + (len - 1 - o.read_end) + C.radius < cons_len &&
          bo.match_cnt > 0.97 * (2 * len) &&
          bo.similarity > C.repeat_similarity &&
          o.match_cnt < 0.9 * bo.match_cnt) {
        o.similarity = 0;
        continue;
      }
      if (!representatives.empty() && C.is_long_seq_set) {
        bool hit = false;
        for (int rk : representatives) {
          const SOv& ro = overlaps[rk];
          if (o.read_start >= ro.read_start && o.read_end <= ro.read_end &&
              (o.match_cnt < 0.8 * ro.match_cnt ||
               sov_is_substring_of(R, o, ro, true, 1))) {
            hit = true;
            break;
          }
        }
        if (hit) {
          o.similarity = 0;
          continue;
        }
      }
      if (o.match_cnt < 0.4 * bo.match_cnt) {
        o.similarity = 0;
        continue;
      }
      if (overlap_cnt > 1000 && o.match_cnt < 0.9 * bo.match_cnt) {
        o.similarity = 0;
        continue;
      }
    }

    if (gctx != nullptr) {
      gctx->ov_idx = i;
      gctx->strand = o.strand;
    }
    int64_t tdp = prof ? now_ns() : 0;
    score_chain(R, C, kl, o, r, out5, gctx,
                o.strand == 1 ? &pc_fwd : &pc_rc);
    if (prof) g_t_sdp += now_ns() - tdp;
    int64_t match_cnt = out5[0];
    int64_t indel_cnt = out5[2];
    bool sim_zero = out5[3] != 0;
    bool low_complex = out5[4] != 0;

    o.match_cnt = match_cnt;
    o.indel_cnt = indel_cnt;
    if (!sim_zero)
      o.similarity =
          (double)match_cnt / (double)(o.seq_end - o.seq_start + 1 +
                                       o.read_end - o.read_start + 1);
    else
      o.similarity = 0;
    if (low_complex) o.similarity = 0;

    if (!sw.is_ref && o.similarity > 0) {
      if (best_novel == -1 || sov_key_less(o, overlaps[best_novel]))
        best_novel = i;
    }

    // Core high-identity rescue (overlap.py:1101-1128; SeqSet.hpp:2037-2076).
    if (!sw.is_ref && read_type == 1 &&
        o.similarity < C.novel_seq_similarity) {
      int hit_cnt = (int)o.coords.size();
      int max_len = 0, max_s = 0, max_e = 0;
      int j = 0;
      while (j < hit_cnt) {
        int k = j + 1;
        while (k < hit_cnt) {
          if (o.coords[k].a > o.coords[k - 1].a + kl - 1 ||
              o.coords[k].a - o.coords[k].b !=
                  o.coords[k - 1].a - o.coords[k - 1].b)
            break;
          k++;
        }
        int run_len = o.coords[k - 1].a - o.coords[j].a + kl;
        if (run_len > max_len) {
          max_len = run_len;
          max_s = j;
          max_e = k - 1;
        }
        j = k;
      }
      if (max_len >= C.hit_len_required) {
        o.read_start = o.coords[max_s].a;
        o.read_end = o.coords[max_e].a + kl - 1;
        o.seq_start = o.coords[max_s].b;
        o.seq_end = o.coords[max_e].b + kl - 1;
        o.similarity = 1.0;
        o.match_cnt = 2 * max_len;
        o.indel_cnt = 0;
      }
    }

    if (o.similarity > 0) {
      bool contained = false;
      for (int rk : representatives) {
        const SOv& ro = overlaps[rk];
        if (o.read_start >= ro.read_start && o.read_end <= ro.read_end) {
          contained = true;
          break;
        }
      }
      if (!contained) representatives.push_back(i);
    }
  }

  // Threshold filter (overlap.py:1143-1151).
  std::vector<SOv> kept;
  kept.reserve(overlap_cnt);
  for (SOv& o : overlaps) {
    const SeqRec& sw = R.seqs[o.seq_idx];
    if (sw.is_ref) {
      if (o.similarity < C.ref_seq_similarity) continue;
    } else if (o.similarity < C.novel_seq_similarity) {
      continue;
    }
    o.coords.clear();
    kept.push_back(std::move(o));
  }
  overlaps = std::move(kept);
}

// Phase timing diagnostics (T4_PROF=1): cumulative nanoseconds per phase,
// printed by t4o_annotate0_batch when enabled.

// Full GetOverlapsFromRead: hits -> chains -> VJ rescue -> score
// (engine/overlap.py:700-1152).  Returns overlap count (0 when none).
int query_scored_core(Engine* E, Engine2& R, const SConf& C, const char* read,
                      int len, int strand, int barcode, int read_type,
                      bool skip_repeats, const uint8_t* puse,
                      std::vector<SOv>& out, GapCtx* gctx = nullptr,
                      std::vector<int32_t>* hit_sids = nullptr) {
  out.clear();
  int kl = E->kmer_len;
  if (len < kl) return -1;
  int n_seqs = (int)R.seqs.size();
  int skip_limit = kl / 2;
  // Python: seqs[0] is not None and seqs[0].is_ref (released wrappers keep
  // their is_ref flag), engine/overlap.py:237.
  if (n_seqs > 0 && R.seqs[0].is_ref) skip_limit = 0;
  int down_sample = 1;
  if (len > 200 && C.is_long_seq_set) down_sample = 1 + len / 200;
  Conf C0{C.radius, C.hit_len_required, C.is_long_seq_set, skip_limit,
          down_sample};
  Meta M{n_seqs, R.m_is_ref.data(), R.m_barcode.data(), R.m_seq_len.data(),
         R.m_name4.data()};

  bool prof = prof_on();
  int64_t t0 = prof ? now_ns() : 0;
  std::vector<Ov> overlaps;
  std::vector<Hit> hits;
  int overlap_cnt = 0;
  auto collect_sids = [&](const std::vector<Hit>& hh) {
    if (hit_sids == nullptr) return;
    for (const Hit& x : hh) hit_sids->push_back(x.sq());
  };
  if (skip_repeats && puse == nullptr) {
    get_hits_from_read(*E, C0, M, read, len, strand, barcode, true, nullptr,
                       hits);
    sort_hits(hits, n_seqs);
    collect_sids(hits);
    overlap_cnt = get_overlaps_from_hits(kl, C0, M, hits, C.hit_len_required,
                                         0, false, overlaps);
    if (overlap_cnt == 0) overlaps.clear();
  }
  if (overlap_cnt == 0) {
    get_hits_from_read(*E, C0, M, read, len, strand, barcode, false, puse,
                       hits);
    collect_sids(hits);
    if (prof) {
      int64_t t1 = now_ns();
      g_t_hits += t1 - t0;
      g_c_hits += (int64_t)hits.size();
      t0 = t1;
    }
    sort_hits(hits, n_seqs);
    if (prof) {
      int64_t t1 = now_ns();
      g_t_ssort += t1 - t0;  // reused as the sort_hits bucket in dump7
      t0 = t1;  // keep the sort out of the chain bucket below
    }
    int filter_hits = read_type == 0 ? 1 : 0;
    overlap_cnt = get_overlaps_from_hits(kl, C0, M, hits, C.hit_len_required,
                                         filter_hits, read_type != 0,
                                         overlaps);
  }
  if (overlap_cnt == 0)
    overlap_cnt = get_vj_overlaps_from_hits(kl, C0, M, hits, overlaps);
  if (prof) {
    int64_t t1 = now_ns();
    g_t_chain += t1 - t0;
    t0 = t1;
  }
  if (overlap_cnt == 0) return 0;

  out.reserve(overlaps.size());
  for (Ov& o : overlaps) {
    SOv s;
    s.seq_idx = o.seq_idx;
    s.read_start = o.read_start;
    s.read_end = o.read_end;
    s.strand = o.strand;
    s.seq_start = o.seq_start;
    s.seq_end = o.seq_end;
    s.match_cnt = o.match_cnt;
    s.indel_cnt = 0;
    s.similarity = 0.0;
    s.info_from_hits = 0;
    s.coords = std::move(o.coords);
    out.push_back(std::move(s));
  }
  if (gctx != nullptr && !gctx->piece_set) {
    // Defensive anchor bounds for non-annotate0 collectors: with the
    // whole read as the single piece, strand -1 anchors stay in range.
    // (Unreachable today: read_type 1 batches keep only strand 1
    // overlaps; annotate0 sets the real piece bounds itself.)
    gctx->piece_a = 0;
    gctx->piece_b = len - 1;
  }
  score_overlaps(R, C, kl, read, len, read_type, out, gctx);
  if (prof) g_t_score += now_ns() - t0;
  return (int)out.size();
}

}  // namespace

extern "C" {

// Register (or refresh) one sequence record.  consensus may be NULL for a
// released seq; pw may be NULL for reference seqs.
void t4o_reg_seq(void* h, int sid, int is_ref, int barcode, const char* name,
                 int name_len, const char* consensus, int cons_len,
                 const int32_t* pw, int cdr3_anchor) {
  Engine2& R = registry_for(h);
  if (sid >= (int)R.seqs.size()) {
    R.seqs.resize(sid + 1);
    R.m_is_ref.resize(sid + 1, 0);
    R.m_barcode.resize(sid + 1, -1);
    R.m_seq_len.resize(sid + 1, 0);
    R.m_name4.resize(4 * (sid + 1), 0);
  }
  SeqRec& s = R.seqs[sid];
  s.active = consensus != nullptr;
  s.is_ref = is_ref != 0;
  s.barcode = barcode;
  s.cdr3_anchor = cdr3_anchor;
  s.cdr_info[0] = s.cdr_info[1] = s.cdr_info[2] = s.cdr_info[3] = -1;
  s.name.assign(name ? name : "", name ? name_len : 0);
  s.consensus.assign(consensus ? consensus : "", consensus ? cons_len : 0);
  s.pw = pw;
  R.m_is_ref[sid] = is_ref ? 1 : 0;
  R.m_barcode[sid] = barcode;
  R.m_seq_len[sid] = s.active ? cons_len : 0;
  for (int j = 0; j < 4; j++)
    R.m_name4[4 * sid + j] =
        (name && j < name_len) ? (uint8_t)name[j] : 0;
}

void t4o_clear_seqs(void* h) {
  Engine2& R = registry_for(h);
  R.seqs.clear();
  R.m_is_ref.clear();
  R.m_barcode.clear();
  R.m_seq_len.clear();
  R.m_name4.clear();
}

int t4o_reg_count(void* h) { return (int)registry_for(h).seqs.size(); }

void t4o_destroy_registry(void* h) { g_registries.erase(h); }

// Full scored GetOverlapsFromRead.  Output: 9 int32 per overlap
// {seq_idx, read_start, read_end, strand, seq_start, seq_end, match_cnt,
// indel_cnt, info_from_hits} + 1 double (similarity).  Returns the overlap
// count, or -2 when cap is too small (retry with a bigger buffer).
int t4o_query_scored(void* h, const char* read, int len, int strand,
                     int barcode, int read_type, int skip_repeats,
                     const uint8_t* puse, int radius, int hit_len_required,
                     int is_long_seq_set, int nomatch_gap_limit,
                     double novel_sim, double ref_sim, double repeat_sim,
                     int32_t* out_i32, double* out_f64, int cap) {
  Engine* E = (Engine*)h;
  Engine2& R = registry_for(h);
  SConf C{radius,    hit_len_required, is_long_seq_set != 0,
          nomatch_gap_limit, novel_sim, ref_sim, repeat_sim};
  std::vector<SOv> out;
  int n = query_scored_core(E, R, C, read, len, strand, barcode, read_type,
                            skip_repeats != 0, puse, out);
  if (n <= 0) return n;
  if (n > cap) return -2;
  for (int i = 0; i < n; i++) {
    const SOv& o = out[i];
    int32_t* row = out_i32 + 9 * i;
    row[0] = o.seq_idx;
    row[1] = o.read_start;
    row[2] = o.read_end;
    row[3] = o.strand;
    row[4] = o.seq_start;
    row[5] = o.seq_end;
    row[6] = (int32_t)o.match_cnt;
    row[7] = (int32_t)o.indel_cnt;
    row[8] = o.info_from_hits;
    out_f64[i] = o.similarity;
  }
  return n;
}

}  // extern "C"

// ===========================================================================
// Detail-0 AnnotateRead (assembler quick annotation) + AssignRead
// ===========================================================================

namespace {

// get_gene_type (engine/seqset.py:49-63; SeqSet.hpp:5076-5100).
int chain_type_of(const std::string& name);

int gene_type_of(const std::string& name) {
  if (name.size() >= 2 && name[0] == 'N' && name[1] == 'o') return -1;
  if (name.size() < 4) return 3;
  char c = name[3];
  if (c == 'V') return 0;
  if (c == 'D')
    return (name.size() > 4 && name[4] >= '0' && name[4] <= '9') ? 1 : 3;
  if (c == 'J') return 2;
  if (c == 'L' && chain_type_of(name) == 2) return -1;  // IGLL genes
  return 3;
}

// get_chain_type (engine/seqset.py:66-74; SeqSet.hpp:5132-5155).
int chain_type_of(const std::string& name) {
  if (name.empty()) return 8;
  if (name[0] == 'I' && name.size() > 2) {
    switch (name[2]) {
      case 'H': return 0;
      case 'K': return 1;
      case 'L': return 2;
      default: return 8;
    }
  }
  if (name[0] == 'T' && name.size() > 2) {
    switch (name[2]) {
      case 'A': return 3;
      case 'B': return 4;
      case 'G': return 5;
      case 'D': return 6;
      default: return 8;
    }
  }
  return 8;
}

// is_same_gene_allele (engine/seqset.py:77-84; SeqSet.hpp:5102-5116).
bool same_gene_allele(const std::string& a, const std::string& b) {
  size_t i = 0;
  while (i < a.size() && i < b.size() && a[i] != '*' && b[i] != '*') {
    if (a[i] != b[i]) return false;
    i++;
  }
  return true;
}

// is_better_gene_match (engine/annotate.py:87-191; SeqSet.hpp:5160-5287).
bool is_better_gene_match(const Engine2& R, int kmer_len, const SOv& a,
                          const SOv& b, double threshold) {
  int64_t match_cnt = a.match_cnt;
  int gap_allow = kmer_len + 1;
  if (threshold >= 1) gap_allow = 3;
  if (a.seq_idx == -1) return false;
  if (b.seq_idx == -1) return true;
  const SeqRec& sa = R.seqs[a.seq_idx];
  const SeqRec& sb = R.seqs[b.seq_idx];
  int gene_type = gene_type_of(sa.name);
  if (gene_type == 2) {
    int a_len = (int)sa.consensus.size();
    int b_len = (int)sb.consensus.size();
    if (a.seq_end >= a_len - gap_allow && b.seq_end >= b_len - gap_allow) {
      if (a.similarity - 0.1 > b.similarity && a.match_cnt > b.match_cnt - 20) {
        bool directly_better = true;
        if (a.seq_end - a.seq_start < b.seq_end - b.seq_start) {
          int mismatch_cnt = 0;
          int i = a.seq_end, j = b.seq_end;
          while (i >= a.seq_start) {
            if (sa.consensus[i] != sb.consensus[j]) mismatch_cnt++;
            i--;
            j--;
          }
          if (mismatch_cnt <= 1) directly_better = false;
        }
        if (directly_better) return true;
      } else if (a.similarity + 0.1 < b.similarity &&
                 a.match_cnt <= b.match_cnt - 20) {
        return false;
      }
    } else if (a.seq_end >= a_len - gap_allow && a.read_end >= a_len &&
               threshold < 1) {
      return true;
    }
  } else if (gene_type == 0) {
    if (threshold == 1) {
      int ia = sa.cdr3_anchor;
      int ib = sb.cdr3_anchor;
      if (a.seq_end >= ia && b.seq_end >= ib && ia != -1 && ib != -1 &&
          iabs(a.read_start - b.read_start) <= 5 &&
          a.indel_cnt < b.indel_cnt &&
          (b.similarity < 0.9 || a.indel_cnt == 0)) {
        if ((a.similarity > b.similarity + 0.03 ||
             (a.similarity > b.similarity && a.read_start < b.read_start)) &&
            (a.match_cnt > b.match_cnt - 20 || a.seq_start <= b.seq_start))
          return true;
      }
    } else {
      if (a.indel_cnt == 0 && b.indel_cnt > 0 && a.similarity > b.similarity)
        return true;
    }
  }

  if (a.read_start == b.read_start && a.read_end == b.read_end) {
    if (a.similarity > b.similarity) {
      return true;
    } else if (a.similarity < b.similarity) {
      return false;
    } else {
      const std::string& name = sb.name;
      for (size_t i = 0; i + 1 < name.size(); i++) {
        if ((name[i + 1] == '-' || name[i + 1] == '*') &&
            !(name[i] >= '0' && name[i] <= '9') && gene_type != 3)
          return true;
        if (name[i] == 'O' && name[i + 1] == 'R') return true;
      }
    }
  }

  if (threshold == 1.0 && same_gene_allele(sa.name, sb.name)) {
    if ((double)(a.seq_end - a.seq_start + 1) / (double)sa.consensus.size() >=
            (double)(b.seq_end - b.seq_start + 1) /
                (double)sb.consensus.size() &&
        a.similarity > b.similarity)
      return true;
  }

  if ((double)match_cnt > (double)b.match_cnt * threshold) {
    return true;
  } else if (threshold < 1.0 &&
             (a.match_cnt + 10 >= b.match_cnt ||
              (a.similarity > b.similarity + 0.01 &&
               a.match_cnt + 2 * kmer_len >= b.match_cnt))) {
    return true;
  }
  return false;
}

// get_contig_intervals (engine/annotate.py:28-49; SeqSet.hpp:5289-5331).
void contig_intervals(const char* read, int n, int gap_n,
                      std::vector<std::pair<int, int>>& out) {
  out.clear();
  int i = 0;
  while (i < n) {
    int n_cnt = 0;
    int j = i + 1;
    while (j < n) {
      if (j >= i + gap_n && read[j - gap_n] == 'N') n_cnt--;
      if (read[j] == 'N') n_cnt++;
      if (n_cnt >= gap_n) break;
      j++;
    }
    if (j < n) {
      out.push_back({i, j - gap_n});
    } else {
      out.push_back({i, j - 1});
      break;
    }
    i = j + 1;
  }
}

// Detail-0 AnnotateRead (engine/annotate.py:197-497 detail-0 subset;
// SeqSet.hpp:6016-6576 minus the detail>=1 branches).  Fills gene[4].
void annotate_detail0(Engine* E, Engine2& R, const SConf& C, int gap_n,
                      const char* read, int len, SOv gene[4],
                      GapCtx* gctx = nullptr) {
  for (int g = 0; g < 4; g++) {
    gene[g] = SOv();
    gene[g].seq_idx = -1;
    gene[g].read_start = gene[g].read_end = -1;
    gene[g].seq_start = gene[g].seq_end = -1;
    gene[g].strand = 1;
    gene[g].match_cnt = 0;
    gene[g].indel_cnt = 0;
    gene[g].similarity = 0.0;
  }
  static thread_local std::vector<std::pair<int, int>> contigs;
  contig_intervals(read, len, gap_n, contigs);

  std::vector<SOv> overlaps;
  std::vector<SOv> ovs;
  int piece_ord = 0;
  for (const auto& ab : contigs) {
    int a = ab.first, b = ab.second;
    if (gctx != nullptr) {
      // One read's pieces share q; the piece ordinal rides in ov_idx's
      // high bits and jobs anchor into the FULL forward read.
      gctx->ov_base = piece_ord << 16;
      gctx->ov_cap = 1 << 16;
      gctx->piece_set = true;
      gctx->piece_a = a;
      gctx->piece_b = b;
    }
    piece_ord++;
    int n = query_scored_core(E, R, C, read + a, b - a + 1, 0, -1, 0, false,
                              nullptr, ovs, gctx);
    if (n <= 0) continue;
    for (SOv& o : ovs) {
      o.read_start += a;
      o.read_end += a;
    }
    // std::sort — the reference's unstable introsort decides full-key ties
    // (engine/annotate.py:228-235 runs the libstdc++ replica for this).
    std::sort(ovs.begin(), ovs.end(), sov_key_less);
    for (SOv& o : ovs) overlaps.push_back(std::move(o));
  }
  std::sort(overlaps.begin(), overlaps.end(), sov_key_less);
  int overlap_cnt = (int)overlaps.size();

  const double gene_similarity[4] = {0.8, 0.8, 0.8, 0.8};

  // Per-seq dominance filter + J-gene tie-break (annotate.py:337-372).
  std::unordered_map<int, int> seq_used;
  std::vector<SOv> kept;
  kept.reserve(overlap_cnt);
  for (int i = 0; i < overlap_cnt; i++) {
    SOv& o = overlaps[i];
    int gt = gene_type_of(R.seqs[o.seq_idx].name);
    if (gt < 0 || gt == 1) continue;
    auto it = seq_used.find(o.seq_idx);
    if (it == seq_used.end() && o.similarity >= gene_similarity[gt]) {
      seq_used[o.seq_idx] = (int)kept.size();
      kept.push_back(o);
    } else if (it != seq_used.end() && gt == 2) {
      SOv& baseline = kept[it->second];
      if (o.match_cnt == baseline.match_cnt &&
          o.similarity == baseline.similarity) {
        int cj = -1;
        for (int j = 0; j < (int)kept.size(); j++) {
          if (gene_type_of(R.seqs[kept[j].seq_idx].name) == 3) {
            cj = j;
            break;
          }
        }
        if (cj != -1) {
          int cstart = kept[cj].read_start;
          if (o.read_end <= cstart + 3) {
            if (baseline.read_end > cstart + 3 ||
                iabs(o.read_end - cstart) < iabs(baseline.read_end - cstart))
              kept[it->second] = o;
          }
        }
      }
    }
  }
  overlap_cnt = (int)kept.size();
  if (overlap_cnt == 0) return;

  // Gene coverage with B/T-cell + chain locking (annotate.py:378-420;
  // detail 0 skips the all_overlaps secondary tracking).
  char bt = 0, chain = 0;
  for (int i = 0; i < overlap_cnt; i++) {
    SOv& o = kept[i];
    const std::string& name = R.seqs[o.seq_idx].name;
    char n0 = name.size() > 0 ? name[0] : 0;
    char n2 = name.size() > 2 ? name[2] : 0;
    if (bt && n0 != bt) continue;
    bt = n0;
    if (chain && !(n2 == chain || (n2 == 'D' && chain == 'A') ||
                   (n2 == 'A' && chain == 'D')))
      continue;
    chain = n2;
    int gt = gene_type_of(name);
    if (gt >= 0 && gene[gt].seq_idx == -1) gene[gt] = o;
  }

  // Random C-gene match check (annotate.py:423-449; SeqSet.hpp:6307-6337).
  SOv& g3 = gene[3];
  if (g3.seq_idx != -1 && g3.read_end - g3.read_start + 1 <= len / 2 &&
      g3.read_end - g3.read_start + 1 <= 50) {
    for (int i = 0; i < 3; i++) {
      SOv& gi = gene[i];
      if (gi.seq_idx >= 0 &&
          (gi.read_end - 17 > g3.read_start || g3.read_end < gi.read_end) &&
          g3.seq_start >= 100) {
        gene[3] = SOv();
        gene[3].seq_idx = -1;
        gene[3].read_start = gene[3].read_end = -1;
        gene[3].seq_start = gene[3].seq_end = -1;
        gene[3].strand = 1;
        gene[3].match_cnt = 0;
        gene[3].similarity = 0.0;
        break;
      }
    }
  }
}

// ExtendOverlap + _finish_extend_overlap (engine/overlap.py:528-653;
// SeqSet.hpp:1165-1277): both overhang profile DPs, the mismatch-density
// rule, and the similarity-threshold rejection.  Returns 1 on a full
// extension, 0 otherwise (ext holds the "good"-prefix fallback coords).
int extend_overlap_full(int kmer_len, const SConf& C, const SeqRec& sw,
                        const char* r, int len, double factor, const SOv& o,
                        SOv* out) {
  int64_t e8[8];
  int seq_len = (int)sw.consensus.size();
  t4_extend_overlap(sw.pw, r, len, seq_len, o.read_start, o.read_end,
                    o.seq_start, o.seq_end, e8);
  int64_t ret = e8[0], left = e8[1], right = e8[2];
  int64_t good_left = e8[3], good_right = e8[4];
  int64_t match_cnt = e8[5], mismatch_cnt = e8[6];
  double mismatch_threshold = 2;
  if (left >= 2) mismatch_threshold += 1;
  if (right >= 2) mismatch_threshold += 1;
  double density_threshold = 1.5 / kmer_len;
  mismatch_threshold *= factor;
  if ((double)mismatch_cnt > mismatch_threshold && (left + right) != 0 &&
      (double)mismatch_cnt / (double)(left + right) > density_threshold)
    ret = 0;
  SOv ext = o;
  ext.read_start = o.read_start - (int)left;
  ext.read_end = o.read_end + (int)right;
  ext.seq_start = o.seq_start - (int)left;
  ext.seq_end = o.seq_end + (int)right;
  ext.match_cnt = 2 * match_cnt + o.match_cnt;
  ext.similarity =
      (double)(2 * match_cnt + o.match_cnt) /
      (double)(ext.read_end - ext.read_start + 1 + ext.seq_end -
               ext.seq_start + 1);
  if ((sw.is_ref && ext.similarity < C.ref_seq_similarity) ||
      (!sw.is_ref && ext.similarity < C.novel_seq_similarity)) {
    ext = o;
    ret = 0;
  }
  if (ret == 0) {
    ext.read_start = o.read_start - (int)good_left;
    ext.read_end = o.read_end + (int)good_right;
    ext.seq_start = o.seq_start - (int)good_left;
    ext.seq_end = o.seq_end + (int)good_right;
  }
  *out = ext;
  return (int)ret;
}

// AssignRead (engine/assemble.py:1009-1032 + overlap.py:528-653;
// SeqSet.hpp:4632-4701, 1165-1277).  Returns 1 + fills out when assigned,
// 0 when not, -3 when a hit seq has no registered posWeight (host fallback).
int assign_read_core(Engine* E, Engine2& R, const SConf& C, const char* read,
                     int len, int strand, int barcode, SOv* out) {
  std::vector<SOv> overlaps;
  int n = query_scored_core(E, R, C, read, len, strand, barcode, 0, false,
                            nullptr, overlaps);
  if (n <= 0 || R.seqs.empty()) return 0;
  if (!R.seqs[0].is_ref)
    std::stable_sort(overlaps.begin(), overlaps.end(), sov_key_less);
  else
    std::stable_sort(overlaps.begin(), overlaps.end(), sov_ref_key_less);

  std::string rc;
  revcomp(read, len, rc);
  const char* r = overlaps[0].strand == 1 ? read : rc.c_str();
  double factor = barcode == -1 ? 1.0 : 2.0;
  for (const SOv& o : overlaps) {
    const SeqRec& sw = R.seqs[o.seq_idx];
    if (sw.pw == nullptr) return -3;
    SOv ext;
    int ok = extend_overlap_full(E->kmer_len, C, sw, r, len, factor, o, &ext);
    if (ok == 1 && ext.read_start == 0 && ext.read_end == len - 1) {
      *out = ext;
      return 1;
    }
  }
  return 0;
}

void write_g8(const SOv& o, int32_t* row, double* sim) {
  row[0] = o.seq_idx;
  row[1] = o.read_start;
  row[2] = o.read_end;
  row[3] = o.strand;
  row[4] = o.seq_start;
  row[5] = o.seq_end;
  row[6] = (int32_t)o.match_cnt;
  row[7] = (int32_t)o.indel_cnt;
  *sim = o.similarity;
}

}  // namespace

extern "C" {

// Quick annotation of one read (detail 0).  out_i32: 4 genes x 8 int32;
// out_f64: 4 similarities.
void t4o_annotate0(void* h, const char* read, int len, int radius,
                   int hit_len_required, int is_long_seq_set,
                   int nomatch_gap_limit, double novel_sim, double ref_sim,
                   double repeat_sim, int gap_n, int32_t* out_i32,
                   double* out_f64) {
  Engine* E = (Engine*)h;
  Engine2& R = registry_for(h);
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  SOv gene[4];
  annotate_detail0(E, R, C, gap_n, read, len, gene);
  for (int g = 0; g < 4; g++)
    write_g8(gene[g], out_i32 + 8 * g, out_f64 + g);
}

// Batched quick annotation with internal threads.  Reads are concatenated
// in `blob` with offsets offs[0..n] (offs[i]..offs[i+1] is read i).
// Consecutive identical reads within a thread's contiguous chunk reuse the
// previous result (pure cache, mirroring main.cpp:524-529).
void t4o_annotate0_batch(void* h, const char* blob, const int64_t* offs,
                         int n_reads, int n_threads, int radius,
                         int hit_len_required, int is_long_seq_set,
                         int nomatch_gap_limit, double novel_sim,
                         double ref_sim, double repeat_sim, int gap_n,
                         int32_t* out_i32, double* out_f64) {
  Engine* E = (Engine*)h;
  engine_ensure_csr(E);  // frozen index for this batch
  Engine2& R = registry_for(h);
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  auto work = [&](int lo, int hi) {
    SOv gene[4];
    const char* prev = nullptr;
    int prev_len = -1;
    for (int i = lo; i < hi; i++) {
      const char* rd = blob + offs[i];
      int len = (int)(offs[i + 1] - offs[i]);
      if (prev == nullptr || len != prev_len ||
          memcmp(rd, prev, len) != 0) {
        annotate_detail0(E, R, C, gap_n, rd, len, gene);
        prev = rd;
        prev_len = len;
      }
      for (int g = 0; g < 4; g++)
        write_g8(gene[g], out_i32 + 32 * (int64_t)i + 8 * g,
                 out_f64 + 4 * (int64_t)i + g);
    }
  };
  if (n_threads <= 1 || n_reads < 64) {
    work(0, n_reads);
  } else {
    // Block 64 keeps sorted-duplicate runs contiguous for the prev-read cache.
    steal_for(n_reads, n_threads, 64,
              [&](int, int lo, int hi) { work(lo, hi); });
  }
  if (prof_on())
    fprintf(stderr, "[t4prof] annotate0_batch hits=%.3fs chain=%.3fs score=%.3fs\n",
            g_t_hits.load() / 1e9, g_t_chain.load() / 1e9,
            g_t_score.load() / 1e9);
}

// Dump/reset the T4_PROF phase counters (hits/chain/score seconds).
void t4o_prof_dump(void* h, double* out3) {
  (void)h;
  out3[0] = g_t_hits.exchange(0) / 1e9;
  out3[1] = g_t_chain.exchange(0) / 1e9;
  out3[2] = g_t_score.exchange(0) / 1e9;
}

// Extended dump — 8 slots despite the legacy name: [hits_s, chain_s,
// score_s, sort_hits_s, score_dp_s, n_hits, n_overlaps, lis_s].
void t4o_prof_dump7(void* h, double* out7) {
  (void)h;
  out7[0] = g_t_hits.exchange(0) / 1e9;
  out7[1] = g_t_chain.exchange(0) / 1e9;
  out7[2] = g_t_score.exchange(0) / 1e9;
  out7[3] = g_t_ssort.exchange(0) / 1e9;
  out7[4] = g_t_sdp.exchange(0) / 1e9;
  out7[5] = (double)g_c_hits.exchange(0);
  out7[6] = (double)g_c_ovl.exchange(0);
  out7[7] = g_t_rest.exchange(0) / 1e9;  // LIS time (caller passes 8 slots)
}

// dump7 plus the chain sub-buckets (group key-build+sort; overlap
// finalization: final_chain copy + Ov push).
void t4o_prof_dump10(void* h, double* out10) {
  t4o_prof_dump7(h, out10);
  out10[8] = g_t_gsort.exchange(0) / 1e9;
  out10[9] = g_t_gfin.exchange(0) / 1e9;
}

// Single AssignRead.  Returns 1 (assigned; out filled), 0 (no), -3 (a hit
// seq lacks a registered posWeight -> caller must use the host path).
int t4o_assign_read(void* h, const char* read, int len, int strand,
                    int barcode, int radius, int hit_len_required,
                    int is_long_seq_set, int nomatch_gap_limit,
                    double novel_sim, double ref_sim, double repeat_sim,
                    int32_t* out_i32, double* out_f64) {
  Engine* E = (Engine*)h;
  Engine2& R = registry_for(h);
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  SOv out;
  int rc = assign_read_core(E, R, C, read, len, strand, barcode, &out);
  if (rc == 1) write_g8(out, out_i32, out_f64);
  return rc;
}

// Batched AssignRead with internal threads.  strands/barcodes per read.
// out_found[i] = 1/0/-3 as above.
void t4o_assign_batch(void* h, const char* blob, const int64_t* offs,
                      const int32_t* strands, const int32_t* barcodes,
                      int n_reads, int n_threads, int radius,
                      int hit_len_required, int is_long_seq_set,
                      int nomatch_gap_limit, double novel_sim, double ref_sim,
                      double repeat_sim, int32_t* out_i32, double* out_f64,
                      int32_t* out_found) {
  Engine* E = (Engine*)h;
  engine_ensure_csr(E);  // frozen index for this batch
  Engine2& R = registry_for(h);
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  auto work = [&](int lo, int hi) {
    SOv out;
    for (int i = lo; i < hi; i++) {
      const char* rd = blob + offs[i];
      int len = (int)(offs[i + 1] - offs[i]);
      int rc = assign_read_core(E, R, C, rd, len, strands[i], barcodes[i],
                                &out);
      out_found[i] = rc;
      if (rc == 1)
        write_g8(out, out_i32 + 8 * (int64_t)i, out_f64 + i);
    }
  };
  if (n_threads <= 1 || n_reads < 64) {
    work(0, n_reads);
    return;
  }
  steal_for(n_reads, n_threads, 32,
            [&](int, int lo, int hi) { work(lo, hi); });
}

// Offsets+lengths variant of t4o_assign_batch: reads live at arbitrary
// positions inside one backing blob (e.g. the raw _assembled_reads.fa
// bytes), so callers can fancy-index record subsets without repacking
// 30MB of sequence.  Assignment per read is pure (the consecutive-dedup
// of the serial path is only a cache), so results are independent of
// the packing.
void t4o_assign_batch_ol(void* h, const char* blob, const int64_t* offs,
                         const int32_t* lens, const int32_t* strands,
                         const int32_t* barcodes, int n_reads, int n_threads,
                         int radius, int hit_len_required, int is_long_seq_set,
                         int nomatch_gap_limit, double novel_sim,
                         double ref_sim, double repeat_sim, int32_t* out_i32,
                         double* out_f64, int32_t* out_found) {
  Engine* E = (Engine*)h;
  engine_ensure_csr(E);  // frozen index for this batch
  Engine2& R = registry_for(h);
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  auto work = [&](int lo, int hi) {
    SOv out;
    for (int i = lo; i < hi; i++) {
      int rc = assign_read_core(E, R, C, blob + offs[i], lens[i], strands[i],
                                barcodes[i], &out);
      out_found[i] = rc;
      if (rc == 1)
        write_g8(out, out_i32 + 8 * (int64_t)i, out_f64 + i);
    }
  };
  if (n_threads <= 1 || n_reads < 64) {
    work(0, n_reads);
    return;
  }
  steal_for(n_reads, n_threads, 32,
            [&](int, int lo, int hi) { work(lo, hi); });
}

}  // extern "C"

// ===========================================================================
// Master-mode assembly: the native engine OWNS novel-contig state
// (consensus, posWeight, anchors, index) for the duration of the greedy
// assembly loop, and Python pulls wrappers back afterwards.  Ports
// engine/assemble.py:231-999 (AddRead + helpers, RepeatAddRead,
// InputNovelRead, UpdateAllConsensus, ReleaseFinishedBarcodeSeq, clean)
// semantics-identically (reference: SeqSet.hpp:3426-4738, 10815-10924,
// 4591-4622).
// ===========================================================================

namespace {

struct PrevAdd {
  int seq_idx = -1;
  int read_start = -1, read_end = -1;
  int seq_start = -1, seq_end = -1;
  int strand = 0;
};

std::map<void*, PrevAdd> g_prev_add;

// Owned posWeight lives in SeqRec::own_pw; keep SeqRec::pw pointing at it
// and the flat meta arrays current.
void ms_sync(Engine2& R, int sid) {
  SeqRec& s = R.seqs[sid];
  s.pw = (s.own_pw.empty() || s.pw_compressed) ? nullptr : s.own_pw.data();
  R.m_is_ref[sid] = s.is_ref ? 1 : 0;
  R.m_barcode[sid] = s.barcode;
  R.m_seq_len[sid] = s.active ? (int32_t)s.consensus.size() : 0;
  for (int j = 0; j < 4; j++)
    R.m_name4[4 * sid + j] =
        ((int)s.name.size() > j) ? (uint8_t)s.name[j] : 0;
}

int ms_new_seq(Engine2& R) {
  int sid = (int)R.seqs.size();
  R.seqs.emplace_back();
  R.m_is_ref.push_back(0);
  R.m_barcode.push_back(-1);
  R.m_seq_len.push_back(0);
  R.m_name4.insert(R.m_name4.end(), 4, 0);
  return sid;
}

// accumulate_read (engine/assemble.py:34-40): N skipped; the reference's
// nucToNum maps other non-ACGT to -1, which numpy's add.at folds into
// column 3 (negative index) — reproduced.
void ms_accumulate(SeqRec& s, int offset, const char* r, int len) {
  for (int i = 0; i < len; i++) {
    char c = r[i];
    if (c == 'N') continue;
    int v = nuc2num((unsigned char)c);
    int col = v < 0 ? 3 : v;
    s.own_pw[(size_t)(offset + i) * 4 + col]++;
  }
}

void ms_pw_from_seq(SeqRec& s) {
  s.own_pw.assign(s.consensus.size() * 4, 0);
  ms_accumulate(s, 0, s.consensus.data(), (int)s.consensus.size());
}

void ms_release(Engine2& R, int sid) {
  SeqRec& s = R.seqs[sid];
  // Python release_seq: name/consensus/pos_weight -> None; anchors kept
  // (the reference reads released wrappers' anchors, SeqSet.hpp:4118-4120).
  s.active = false;
  s.name.clear();
  s.consensus.clear();
  s.own_pw.clear();
  s.own_pw.shrink_to_fit();
  ms_sync(R, sid);
}

// update_consensus (engine/assemble.py:166-192).
void ms_update_consensus(Engine* E, Engine2& R, int sid, bool update_index) {
  SeqRec& s = R.seqs[sid];
  if (s.pw_compressed) return;
  int L = (int)s.consensus.size();
  static thread_local std::vector<int> changes;
  changes.clear();
  for (int i = 0; i < L; i++) {
    const int32_t* row = s.own_pw.data() + (size_t)i * 4;
    int arg = 0;
    int32_t mx = row[0];
    for (int j = 1; j < 4; j++)
      if (row[j] > mx) {
        mx = row[j];
        arg = j;
      }
    int cur = nuc2num((unsigned char)s.consensus[i]);  // N->0, other -1
    int32_t cur_count = row[cur < 0 ? 3 : cur];
    if (mx > 0 && arg != cur && cur_count < mx) changes.push_back(i);
  }
  if (changes.empty()) return;
  if (update_index && s.index_flag)
    t4o_remove_from_read((void*)E, s.consensus.data(), L, E->kmer_len, sid,
                         s.barcode, 0);
  for (int i : changes) {
    const int32_t* row = s.own_pw.data() + (size_t)i * 4;
    int arg = 0;
    int32_t mx = row[0];
    for (int j = 1; j < 4; j++)
      if (row[j] > mx) {
        mx = row[j];
        arg = j;
      }
    s.consensus[i] = "ACGT"[arg];
  }
  if (update_index && s.index_flag)
    t4o_build_from_read((void*)E, s.consensus.data(), L, E->kmer_len, sid,
                        s.barcode, 0);
  ms_sync(R, sid);
}

// substitute_consensus_pos (engine/assemble.py:147-164).
void ms_substitute(Engine* E, Engine2& R, int sid, int pos, char c,
                   bool update_index) {
  SeqRec& s = R.seqs[sid];
  int L = (int)s.consensus.size();
  if (pos >= L || s.consensus[pos] == c) return;
  int kl = E->kmer_len;
  int start = pos - kl + 1;
  if (start < 0) start = 0;
  int end = pos + kl - 1;
  if (end > L - 1) end = L - 1;
  if (update_index)
    t4o_remove_from_read((void*)E, s.consensus.data() + start,
                         end - start + 1, kl, sid, s.barcode, start);
  s.consensus[pos] = c;
  if (update_index && s.index_flag)
    t4o_build_from_read((void*)E, s.consensus.data() + start,
                        end - start + 1, kl, sid, s.barcode, start);
}

// is_name_compatible (engine/seqset.py:91-108).
bool ms_name_compatible(const std::string& a, const std::string& b) {
  int max_a = -1;
  size_t i = 0;
  while (i <= a.size()) {
    size_t j = a.find('+', i);
    if (j == std::string::npos) j = a.size();
    if (j > i) {
      int gt = gene_type_of(a.substr(i, j - i));
      if (gt > max_a) max_a = gt;
    }
    i = j + 1;
  }
  int min_b = 10;
  i = 0;
  while (i <= b.size()) {
    size_t j = b.find('+', i);
    if (j == std::string::npos) j = b.size();
    if (j > i) {
      int gt = gene_type_of(b.substr(i, j - i));
      if (gt < min_b && gt != -1) min_b = gt;
    }
    i = j + 1;
  }
  return max_a <= min_b;
}

// _merge_contigs_with_read (engine/assemble.py:573-690).  Returns 0 on
// name-incompatibility (caller returns -1), else 1 with *out_seq/-offset.
// TRUST4_TPU_DEBUG=1: replica of the reference's -DDEBUG AddRead decision
// trace (defs.h:6; main.cpp:1590-1592,1870; SeqSet.hpp:3442,3476,3533,
// 3835,3888,3937,4454) with identical printf formats, so a run can be
// diffed against a reference DEBUG build.
inline bool dbg_on() {
  static int v = -1;
  if (v == -1) {
    const char* e = getenv("TRUST4_TPU_DEBUG");
    v = (e && e[0] == '1') ? 1 : 0;
  }
  return v == 1;
}

int ms_merge_contigs(Engine* E, Engine2& R, const char* r, int len,
                     std::vector<SOv>& extended, bool sort_extended,
                     int barcode, int* out_seq, int* out_offset) {
  if (sort_extended)
    std::stable_sort(extended.begin(), extended.end(),
                     [](const SOv& a, const SOv& b) {
                       return a.read_start < b.read_start;
                     });
  if (dbg_on()) {
    for (int i = 0; i < (int)extended.size(); i++) {
      const SOv& e = extended[i];
      printf("sort extended %d: %d %s. %d. %d %d %d %d\n", i, e.seq_idx,
             R.seqs[e.seq_idx].name.c_str(), e.strand, e.read_start,
             e.read_end, e.seq_start, e.seq_end);
    }
  }
  int n = (int)extended.size();
  for (int i = 0; i < n; i++)
    for (int j = i + 1; j < n; j++)
      if (!ms_name_compatible(R.seqs[extended[i].seq_idx].name,
                              R.seqs[extended[j].seq_idx].name))
        return 0;

  std::vector<int> seq_offset(n, 0);
  if (extended[0].read_start > 0) {
    for (int i = 0; i < n; i++) seq_offset[i] = extended[i].read_start;
  } else {
    seq_offset[0] = 0;
    for (int i = 1; i < n; i++)
      seq_offset[i] =
          seq_offset[i - 1] +
          (int)R.seqs[extended[i - 1].seq_idx].consensus.size() - 1 +
          (extended[i].read_start - extended[i - 1].read_end);
  }

  if (dbg_on()) {
    for (int i = 0; i < n; i++) {
      const SOv& e = extended[i];
      printf("merge %d: %d %d %d %d %d. %d\n", i, e.read_start, e.read_end,
             e.seq_start, e.seq_end,
             (int)R.seqs[e.seq_idx].consensus.size(), seq_offset[i]);
    }
  }

  size_t total = (size_t)len;
  for (const SOv& e : extended)
    total += R.seqs[e.seq_idx].consensus.size();
  std::string buf(total, '\0');
  int read_at = extended[0].read_start > 0 ? 0 : extended[0].seq_start;
  memcpy(&buf[read_at], r, len);
  for (int i = n - 1; i >= 0; i--) {
    const std::string& cons = R.seqs[extended[i].seq_idx].consensus;
    memcpy(&buf[seq_offset[i]], cons.data(), cons.size());
  }

  int last_end_idx = n - 1;
  int k = 0;
  for (int i = 0; i < n; i++) {
    int end = seq_offset[i] + (int)R.seqs[extended[i].seq_idx].consensus.size();
    if (end > k) {
      k = end;
      last_end_idx = i;
    }
  }
  int new_len;
  if (extended[last_end_idx].read_end < len)
    new_len = k + (len - extended[last_end_idx].read_end - 1);
  else
    new_len = k;
  std::string new_consensus = buf.substr(0, new_len);

  int new_seq_idx = extended[0].seq_idx;
  for (const SOv& e : extended)
    if (e.seq_idx < new_seq_idx) new_seq_idx = e.seq_idx;
  int k_at = 0;
  for (int i = 0; i < n; i++)
    if (extended[i].seq_idx == new_seq_idx) {
      k_at = i;
      break;
    }
  SeqRec& host = R.seqs[new_seq_idx];
  int old_len = (int)host.consensus.size();
  std::vector<int32_t> w((size_t)new_len * 4, 0);
  memcpy(w.data() + (size_t)seq_offset[k_at] * 4, host.own_pw.data(),
         (size_t)old_len * 4 * sizeof(int32_t));
  for (int i = 0; i < n; i++) {
    const SOv& e = extended[i];
    if (e.seq_idx == new_seq_idx) continue;
    SeqRec& donor = R.seqs[e.seq_idx];
    host.num_read += donor.num_read;
    int dl = (int)donor.consensus.size();
    for (size_t t = 0; t < (size_t)dl * 4; t++)
      w[(size_t)seq_offset[i] * 4 + t] += donor.own_pw[t];
  }
  host.own_pw = std::move(w);

  for (const SOv& e : extended) {
    SeqRec& sw = R.seqs[e.seq_idx];
    t4o_remove_from_read((void*)E, sw.consensus.data(),
                         (int)sw.consensus.size(), E->kmer_len, e.seq_idx,
                         barcode, 0);
  }

  // Merge names with '+' (assemble.py:656-671).
  int name_idx = 0;
  for (int i = 0; i < n; i++)
    if (R.seqs[extended[i].seq_idx].name != "Novel") {
      name_idx = i;
      break;
    }
  std::string merged = R.seqs[extended[name_idx].seq_idx].name;
  for (int i = 0; i < n; i++) {
    if (i == name_idx) continue;
    if (i > 0 && R.seqs[extended[i].seq_idx].name !=
                     R.seqs[extended[i - 1].seq_idx].name)
      merged += "+" + R.seqs[extended[i].seq_idx].name;
  }
  host.name = merged;

  for (const SOv& e : extended)
    if (e.seq_idx != new_seq_idx) ms_release(R, e.seq_idx);

  host.consensus = new_consensus;
  ms_sync(R, new_seq_idx);
  ms_update_consensus(E, R, new_seq_idx, false);
  t4o_build_from_read((void*)E, host.consensus.data(),
                      (int)host.consensus.size(), E->kmer_len, new_seq_idx,
                      barcode, 0);
  // Released donors keep their anchor ints (SeqSet.hpp:4118-4120).
  host.min_left_ext_anchor = R.seqs[extended[0].seq_idx].min_left_ext_anchor;
  host.min_right_ext_anchor =
      R.seqs[extended[last_end_idx].seq_idx].min_right_ext_anchor;
  ms_sync(R, new_seq_idx);

  *out_seq = new_seq_idx;
  *out_offset = extended[0].seq_start > 0 ? extended[0].seq_start : 0;
  return 1;
}

// _extend_contig_with_read (engine/assemble.py:692-807).
void ms_extend_contig(Engine* E, Engine2& R, const char* r, int len,
                      const SOv& ext, const std::vector<SOv>& overlaps,
                      int barcode, int min_kmer_count, int* out_seq,
                      int* out_offset) {
  int seq_idx = ext.seq_idx;
  SeqRec& sw = R.seqs[seq_idx];
  sw.num_read += 1;
  int kl = E->kmer_len;

  if (ext.read_start > 0 || ext.read_end < len - 1) {
    std::vector<std::pair<int, char>> consensus_replacement;
    int old_len = (int)sw.consensus.size();
    std::string new_consensus;
    new_consensus.reserve(old_len + len);
    new_consensus.append(r, ext.read_start);
    new_consensus += sw.consensus;
    new_consensus.append(r + ext.read_end + 1, len - ext.read_end - 1);
    int new_len = (int)new_consensus.size();
    int shift = ext.read_start;

    if (shift > 0) {
      t4o_build_from_read((void*)E, new_consensus.data(),
                          ext.read_start + kl - 1, kl, seq_idx, barcode, 0);
      t4o_update_from_read((void*)E, sw.consensus.data(), old_len, kl,
                           barcode, shift, seq_idx, seq_idx);
    }
    if (ext.read_end < len - 1) {
      int start = ext.read_start + ext.seq_end - kl + 2;
      t4o_build_from_read((void*)E, new_consensus.data() + start,
                          new_len - start, kl, seq_idx, barcode, start);
    }

    std::vector<int32_t> w((size_t)new_len * 4, 0);
    memcpy(w.data() + (size_t)shift * 4, sw.own_pw.data(),
           (size_t)old_len * 4 * sizeof(int32_t));
    if (shift > 0) {
      // Demote boundary weights of the original prefix
      // (SeqSet.hpp:4192-4213).
      if (barcode == -1 || min_kmer_count > 1) {
        for (int i = 0; i < 2; i++) {
          int p = i + shift;
          if (p >= len || r[p] == 'N') continue;
          char cbase = new_consensus[p];
          int cb = nuc2num((unsigned char)cbase);
          int cbcol = cb < 0 ? 3 : cb;
          if (r[p] != cbase && cbase != 'N' &&
              w[(size_t)p * 4 + cbcol] == 1)
            consensus_replacement.push_back({p, r[p]});
          for (int j = 0; j < 4; j++)
            if (r[p] != "ACGT"[j] && w[(size_t)p * 4 + j] > 1)
              w[(size_t)p * 4 + j] -= 1;
        }
      }
      memset(w.data(), 0, (size_t)shift * 4 * sizeof(int32_t));
    }

    if (ext.read_end < len - 1) {
      int start = ext.read_start + old_len;
      memset(w.data() + (size_t)start * 4, 0,
             (size_t)(len - ext.read_end - 1) * 4 * sizeof(int32_t));
      if (barcode == -1 || min_kmer_count > 1) {
        for (int i = old_len - 2; i < old_len; i++) {
          int pos = i - ext.seq_start;
          int seq_pos = i + shift;
          if (pos < 0 || r[pos] == 'N') continue;
          char cbase = new_consensus[seq_pos];
          int cb = nuc2num((unsigned char)cbase);
          int cbcol = cb < 0 ? 3 : cb;
          if (r[pos] != cbase && cbase != 'N' &&
              w[(size_t)seq_pos * 4 + cbcol] == 1)
            consensus_replacement.push_back({seq_pos, r[pos]});
          for (int j = 0; j < 4; j++)
            if (r[pos] != "ACGT"[j] && w[(size_t)seq_pos * 4 + j] > 1)
              w[(size_t)seq_pos * 4 + j] -= 1;
        }
      }
    }
    sw.own_pw = std::move(w);

    if (shift > 0) sw.min_left_ext_anchor = 0;
    if (ext.read_end < len - 1) sw.min_right_ext_anchor = 0;

    // Attach the best reference gene name (SeqSet.hpp:4256-4296).
    int ref_idx = -1;
    for (int i = 0; i < (int)overlaps.size(); i++) {
      const SOv& o = overlaps[i];
      if (!R.seqs[o.seq_idx].is_ref) continue;
      if (ref_idx == -1 ||
          o.read_end - o.read_start > overlaps[ref_idx].read_end -
                                          overlaps[ref_idx].read_start)
        ref_idx = i;
      if (sw.name.find(R.seqs[o.seq_idx].name) != std::string::npos) {
        ref_idx = i;
        break;
      }
    }
    if (ref_idx != -1) {
      int rsid = overlaps[ref_idx].seq_idx;
      if (sw.name.find(R.seqs[rsid].name) == std::string::npos) {
        if (ext.read_start > 0)
          sw.name = R.seqs[rsid].name + "+" + sw.name;
        else
          sw.name = sw.name + "+" + R.seqs[rsid].name;
      }
    }

    int offset = ext.seq_start > 0 ? ext.seq_start : 0;
    sw.consensus = new_consensus;
    ms_sync(R, seq_idx);
    for (const auto& pc : consensus_replacement)
      ms_substitute(E, R, seq_idx, pc.first, pc.second, true);
    ms_sync(R, seq_idx);
    *out_seq = seq_idx;
    *out_offset = offset;
    return;
  }

  *out_seq = seq_idx;
  *out_offset = ext.seq_start;
}

// _accumulate_into_contig (engine/assemble.py:809-848).
int ms_accumulate_into_contig(Engine* E, Engine2& R, void* h, const char* r,
                              int len, int seq_idx, int offset, int barcode,
                              int strand) {
  SeqRec& sw = R.seqs[seq_idx];
  int kl = E->kmer_len;
  ms_accumulate(sw, offset, r, len);
  static thread_local std::vector<int> n_pos;
  n_pos.clear();
  for (int i = 0; i < len; i++)
    if (r[i] != 'N' && sw.consensus[i + offset] == 'N') n_pos.push_back(i);
  g_prev_add[h] = {seq_idx, 0, len - 1, offset, offset + len - 1, strand};
  int i = 0;
  int size = (int)n_pos.size();
  while (i < size) {
    int j = i + 1;
    while (j < size && n_pos[j] <= n_pos[j - 1] + kl - 1) j++;
    for (int l = i; l < j; l++)
      sw.consensus[n_pos[l] + offset] = r[n_pos[l]];
    int start = n_pos[i] - kl + 1 + offset;
    if (start < 0) start = 0;
    int end = n_pos[j - 1] + kl - 1 + offset;
    if (end > (int)sw.consensus.size() - 1) end = (int)sw.consensus.size() - 1;
    t4o_build_from_read((void*)E, sw.consensus.data() + start,
                        end - start + 1, kl, seq_idx, barcode, start);
    i = j;
  }
  if (size > 0)
    ms_sync(R, seq_idx);  // consensus N-repair: structural resync
  return seq_idx;
}

}  // namespace

namespace {

// AddRead (engine/assemble.py:231-569; SeqSet.hpp:3426-4473).  Fills
// out2 = {ret, strand}.
// Commit half of AddRead: takes the already-computed scored overlap list
// (either fresh from query_scored_core or replayed from a validated
// speculative batch — round-based assembly) and applies the greedy
// decision + state mutation.  `overlaps` is consumed.
void ms_add_read_commit(void* h, const char* read, int len,
                        const char* gene_name, int gene_name_len, int strand,
                        int barcode, int min_kmer_count, bool repetitive,
                        double sim_threshold, const SConf& C,
                        std::vector<SOv>& overlaps, int overlap_cnt,
                        int* out2) {
  Engine* E = (Engine*)h;
  Engine2& R = registry_for(h);
  g_prev_add[h] = PrevAdd{-1, -1, -1, -1, -1, 0};

  if (overlap_cnt <= 0) {
    out2[0] = -1;
    out2[1] = strand;
    return;
  }

  if (dbg_on())
    printf("geneName: %.*s\n", gene_name_len, gene_name ? gene_name : "");

  if (gene_name_len > 0) {
    std::vector<SOv> kept;
    for (SOv& o : overlaps) {
      const std::string& name = R.seqs[o.seq_idx].name;
      int j = 3;
      if (!name.empty() && name[0] >= 'A' && name[0] <= 'Z') {
        j = 0;
        while (j < 3 && j < (int)name.size() && j < gene_name_len &&
               name[j] == gene_name[j])
          j++;
      }
      if (j == 3 || name == "Novel") kept.push_back(std::move(o));
    }
    overlaps = std::move(kept);
    overlap_cnt = (int)overlaps.size();
    if (overlap_cnt <= 0) {
      out2[0] = -1;
      out2[1] = strand;
      return;
    }
  }

  std::stable_sort(overlaps.begin(), overlaps.end(), sov_key_less);

  if (dbg_on()) {
    for (int i = 0; i < overlap_cnt; i++) {
      const SOv& o = overlaps[i];
      const SeqRec& sw = R.seqs[o.seq_idx];
      printf("%d: %d %d %s. %d(%d %d). %d %d %d %d. %lf.\n", i, o.seq_idx,
             (int)sw.consensus.size(), sw.name.c_str(), o.strand,
             sw.min_left_ext_anchor, sw.min_right_ext_anchor, o.read_start,
             o.read_end, o.seq_start, o.seq_end, o.similarity);
      printf("%s\n", sw.consensus.c_str());
    }
  }

  int first_novel = 0;
  while (first_novel < overlap_cnt &&
         R.seqs[overlaps[first_novel].seq_idx].is_ref)
    first_novel++;

  std::vector<SOv> extended;
  std::vector<SOv> failed_extended;
  int ret = -1;
  bool add_new = true;
  bool have_good_extended = false;
  SOv good_extended;
  int read_in_consensus_offset = 0;
  int seq_idx = -1;
  int tag = -1;
  std::string rc_read;

  if (first_novel < overlap_cnt) {
    revcomp(read, len, rc_read);
    const char* r = overlaps[0].strand == 1 ? read : rc_read.c_str();
    if (dbg_on() && overlaps[0].strand == -1) printf("rc: %s\n", r);
    bool sort_extended = true;
    std::vector<std::pair<int, int>> old_min_ext_anchor;
    double mismatch_factor =
        (barcode == -1 && !repetitive) ? 1.0 : 2.0;

    for (int i = 0; i < overlap_cnt; i++) {
      const SOv& o = overlaps[i];
      SeqRec& sw = R.seqs[o.seq_idx];
      old_min_ext_anchor.push_back(
          {sw.min_left_ext_anchor, sw.min_right_ext_anchor});
      // Subset relation vs already-extended overlaps (SeqSet.hpp:3564-3589).
      bool skip = false;
      for (const SOv& e : extended) {
        int lrad = e.seq_start == 0 ? 0 : C.radius;
        int rrad = (e.seq_end ==
                    (int)R.seqs[e.seq_idx].consensus.size() - 1)
                       ? 0
                       : C.radius;
        if (o.read_start >= e.read_start - lrad &&
            o.read_end <= e.read_end + rrad &&
            (o.seq_start >= C.radius ||
             o.seq_end <= (int)sw.consensus.size() - C.radius - 1)) {
          skip = true;
          break;
        }
        lrad = o.seq_start == 0 ? 0 : C.radius;
        rrad = (o.seq_end == (int)sw.consensus.size() - 1) ? 0 : C.radius;
        if (e.read_start >= o.read_start - lrad &&
            e.read_end <= o.read_end + rrad) {
          skip = true;
          break;
        }
      }
      if (skip || sw.is_ref) continue;

      SOv ext;
      int ok = extend_overlap_full(E->kmer_len, C, sw, r, len,
                                   mismatch_factor, o, &ext);
      if (ok == 1) {
        if (ext.similarity < sim_threshold) {
          if ((min_kmer_count <= 1 ||
               ext.similarity + 0.01 >= sim_threshold) &&
              ext.read_start == 0 && ext.read_end == len - 1) {
            good_extended = ext;
            have_good_extended = true;
          }
          continue;
        }
        // Double-check subset vs already extended (SeqSet.hpp:3615-3641).
        skip = false;
        for (const SOv& e : extended) {
          int lrad = e.seq_start == 0 ? 0 : C.radius;
          int rrad = (e.seq_end ==
                      (int)R.seqs[e.seq_idx].consensus.size() - 1)
                         ? 0
                         : C.radius;
          if (ext.read_start >= e.read_start - lrad &&
              ext.read_end <= e.read_end + rrad &&
              (o.seq_start > 0 ||
               o.seq_end < (int)sw.consensus.size() - 1)) {
            skip = true;
            break;
          }
          if (e.read_start >= ext.read_start - C.radius &&
              e.read_end <= ext.read_end + C.radius) {
            skip = true;
            break;
          }
        }
        if (skip) continue;

        // Extended portion subset of earlier overlaps' matched portions
        // (SeqSet.hpp:3644-3677).
        skip = false;
        for (int j = 0; j < i; j++) {
          const SOv& oj = overlaps[j];
          if (R.seqs[oj.seq_idx].is_ref) continue;
          if (ext.seq_start == 0 &&
              ext.seq_end ==
                  (int)R.seqs[ext.seq_idx].consensus.size() - 1)
            continue;
          if (ext.read_start >= oj.read_start &&
              ext.read_end <= oj.read_end &&
              (oj.read_end - oj.read_start >=
                   ext.read_end - ext.read_start + 10 ||
               oj.similarity + 0.02 >= ext.similarity)) {
            SeqRec& esw = R.seqs[ext.seq_idx];
            int span = ext.read_end - ext.read_start + 1;
            if (ext.read_start > 0 && esw.min_left_ext_anchor < span)
              esw.min_left_ext_anchor = span;
            if (ext.read_end < len - 1 && esw.min_right_ext_anchor < span)
              esw.min_right_ext_anchor = span;
            skip = true;
            break;
          }
        }
        if (skip) continue;

        // Previously failed extensions covering this one
        // (SeqSet.hpp:3680-3708).
        skip = false;
        for (const SOv& fe : failed_extended) {
          if (ext.seq_start == 0 &&
              ext.seq_end ==
                  (int)R.seqs[ext.seq_idx].consensus.size() - 1)
            continue;
          if (ext.read_start >= fe.read_start &&
              ext.read_end <= fe.read_end) {
            SeqRec& esw = R.seqs[ext.seq_idx];
            int span = ext.read_end - ext.read_start + 1;
            if (ext.read_start > 0 && esw.min_left_ext_anchor < span)
              esw.min_left_ext_anchor = span;
            if (ext.read_end < len - 1 && esw.min_right_ext_anchor < span)
              esw.min_right_ext_anchor = span;
            skip = true;
            break;
          }
        }
        if (skip) continue;

        SeqRec& esw = R.seqs[ext.seq_idx];
        int span = ext.read_end - ext.read_start + 1;
        if (ext.read_start > 0 && esw.min_left_ext_anchor >= span) continue;
        if (ext.read_end < len - 1 && esw.min_right_ext_anchor >= span)
          continue;

        tag = i;
        extended.push_back(ext);
      } else {
        failed_extended.push_back(ext);
      }
    }

    // Possibly merge two contigs that already overlap each other
    // (SeqSet.hpp:3732-3793).
    if (extended.size() == 1 && extended[0].read_start <= C.radius &&
        extended[0].read_end >= len - C.radius) {
      int jtag = -1;
      for (int i = 0; i < overlap_cnt; i++) {
        if (i == tag) continue;
        SeqRec& sw = R.seqs[overlaps[i].seq_idx];
        if (sw.is_ref) continue;
        SOv ext;
        int ok = extend_overlap_full(E->kmer_len, C, sw, r, len,
                                     mismatch_factor, overlaps[i], &ext);
        if (ok == 1) {
          jtag = i;
          extended.push_back(ext);
        }
      }
      if (extended.size() > 2) {
        extended.resize(1);
      } else if (extended.size() == 2) {
        int span1 = extended[1].read_end - extended[1].read_start + 1;
        if (extended[1].read_start > 0 &&
            old_min_ext_anchor[jtag].first >= span1)
          extended.resize(1);
        else if (extended[1].read_end < len - 1 &&
                 old_min_ext_anchor[jtag].second >= span1)
          extended.resize(1);
        if (extended.size() == 2) {
          if (extended[0].seq_end ==
                  (int)R.seqs[extended[0].seq_idx].consensus.size() - 1 &&
              extended[1].seq_start == 0) {
            sort_extended = false;
          } else if (extended[0].seq_start == 0 &&
                     extended[1].seq_end ==
                         (int)R.seqs[extended[1].seq_idx].consensus.size() -
                             1) {
            sort_extended = false;
            std::swap(extended[0], extended[1]);
          } else {
            extended.resize(1);
          }
        }
      }
    }

    if (sim_threshold > C.novel_seq_similarity) {
      std::vector<SOv> kept;
      for (SOv& e : extended)
        if (e.similarity >= sim_threshold) kept.push_back(std::move(e));
      extended = std::move(kept);
    }

    if (extended.empty() && have_good_extended)
      extended.push_back(good_extended);

    if (extended.size() > 1) {
      bool all_bad = true;
      for (const SOv& e : extended)
        if (e.similarity >= 0.95) {
          all_bad = false;
          break;
        }
      if (all_bad) {
        // min by sort_key — Python min keeps the FIRST minimal element.
        int best = 0;
        for (int i = 1; i < (int)extended.size(); i++)
          if (sov_key_less(extended[i], extended[best])) best = i;
        SOv keep = extended[best];
        extended.clear();
        extended.push_back(keep);
      }
    }

    if (dbg_on()) {
      for (int i = 0; i < (int)extended.size(); i++) {
        const SOv& e = extended[i];
        printf("extended %d: %d %s. %d. %d %d %d %d %lf\n", i, e.seq_idx,
               R.seqs[e.seq_idx].name.c_str(), e.strand, e.read_start,
               e.read_end, e.seq_start, e.seq_end, e.similarity);
      }
      fflush(stdout);
    }

    if (extended.size() > 1) {
      std::vector<int> ids;
      for (const SOv& e : extended) ids.push_back(e.seq_idx);
      std::sort(ids.begin(), ids.end());
      if (std::adjacent_find(ids.begin(), ids.end()) != ids.end())
        extended.clear();
    }

    if (extended.size() > 1) {
      int ok = ms_merge_contigs(E, R, r, len, extended, sort_extended,
                                barcode, &seq_idx,
                                &read_in_consensus_offset);
      if (!ok) {
        out2[0] = -1;
        out2[1] = strand;
        return;
      }
      add_new = false;
    } else if (extended.size() == 1) {
      ms_extend_contig(E, R, r, len, extended[0], overlaps, barcode,
                       min_kmer_count, &seq_idx, &read_in_consensus_offset);
      add_new = false;
    }

    if (!add_new)
      ret = ms_accumulate_into_contig(E, R, h, r, len, seq_idx,
                                      read_in_consensus_offset, barcode,
                                      overlaps[0].strand);
  }

  // Novel contig creation anchored on a reference overlap
  // (SeqSet.hpp:4370-4458).
  if (add_new) {
    int anchor_seq_idx = -1;
    for (const SOv& o : overlaps)
      if (R.seqs[o.seq_idx].is_ref) {
        anchor_seq_idx = o.seq_idx;
        break;
      }
    if (anchor_seq_idx == -1) add_new = false;

    if (add_new) {
      int idx = ms_new_seq(R);
      SeqRec& ns = R.seqs[idx];
      ns.active = true;
      ns.is_ref = false;
      ns.name = R.seqs[anchor_seq_idx].name;
      // Reference quirk (SeqSet.hpp:4426): the strand test indexes the
      // overlap list with the *seq* index; out-of-range reads never
      // equal -1 in practice, so no RC happens then.
      if (anchor_seq_idx < (int)overlaps.size() &&
          overlaps[anchor_seq_idx].strand == -1) {
        std::string rc2;
        revcomp(read, len, rc2);
        ns.consensus = rc2;
      } else {
        ns.consensus.assign(read, len);
      }
      ns.barcode = barcode;
      ns.num_read = 1;
      ms_pw_from_seq(ns);
      ms_sync(R, idx);
      t4o_build_from_read((void*)E, ns.consensus.data(),
                          (int)ns.consensus.size(), E->kmer_len, idx,
                          barcode, 0);
      g_prev_add[h] =
          PrevAdd{idx, 0, len - 1, 0, len - 1, overlaps[0].strand};
      if (dbg_on()) printf("add novel seq: %d\n", idx);
      ret = idx;
    }
  }

  if (ret == -1) {
    g_prev_add[h] = PrevAdd{-2, -1, -1, -1, -1, 0};
    ret = -2;
  }

  if (ret >= 0 && strand == 0) strand = overlaps[0].strand;
  out2[0] = ret;
  out2[1] = strand;
}

// AddRead = fresh query + commit (the non-speculative path).
void ms_add_read(void* h, const char* read, int len, const char* gene_name,
                 int gene_name_len, int strand, int barcode,
                 int min_kmer_count, bool repetitive, double sim_threshold,
                 const SConf& C, int* out2) {
  Engine* E = (Engine*)h;
  Engine2& R = registry_for(h);
  std::vector<SOv> overlaps;
  int overlap_cnt = query_scored_core(E, R, C, read, len, strand, barcode, 0,
                                      repetitive, nullptr, overlaps);
  ms_add_read_commit(h, read, len, gene_name, gene_name_len, strand, barcode,
                     min_kmer_count, repetitive, sim_threshold, C, overlaps,
                     overlap_cnt, out2);
}

}  // namespace

namespace {

// decompress_pos_weight (engine/assemble.py:854-871).
void ms_decompress(const std::string& cons, const std::vector<int32_t>& flat,
                   std::vector<int32_t>& out) {
  int length = (int)cons.size();
  out.assign((size_t)length * 4, 0);
  size_t k = 0;
  for (int j = 0; j < length; j++) {
    int32_t v = k < flat.size() ? flat[k] : 0;
    if (v < 0) {
      int code = nuc2num((unsigned char)cons[j]);
      out[(size_t)j * 4 + (code < 0 ? 3 : code)] = -v;
      k += 1;
    } else {
      for (int i = 0; i < 4; i++) {
        out[(size_t)j * 4 + i] = k < flat.size() ? flat[k] : 0;
        k += 1;
      }
    }
  }
}

// is_contig_shallow (engine/assemble.py:873-899).
bool ms_is_contig_shallow(Engine2& R, int i, int min_cov) {
  SeqRec& sw = R.seqs[i];
  if (!sw.active || sw.is_ref) return false;
  int length = (int)sw.consensus.size();
  if (sw.own_pw.empty()) return sw.num_read < min_cov;
  static thread_local std::vector<int32_t> dec;
  const int32_t* w;
  if (sw.pw_compressed) {
    ms_decompress(sw.consensus, sw.own_pw, dec);
    w = dec.data();
  } else {
    w = sw.own_pw.data();
  }
  static thread_local std::vector<int64_t> sums;
  sums.resize(length);
  for (int j = 0; j < length; j++)
    sums[j] = (int64_t)w[j * 4] + w[j * 4 + 1] + w[j * 4 + 2] + w[j * 4 + 3];
  int j = 0;
  while (j < length && sums[j] < min_cov) j++;
  int start = j;
  j = length - 1;
  while (j >= start && sums[j] < min_cov) j--;
  int end = j;
  for (j = start; j <= end; j++)
    if (sums[j] < min_cov) return true;
  if (end < start) return true;
  return false;
}

// release_finished_barcode_seq (engine/assemble.py:906-979;
// SeqSet.hpp:10815-10924) for a single finished barcode.
void ms_release_finished_barcode(void* h, int barcode, bool remove_from_index,
                                 int contig_min_cov, bool early_stop) {
  Engine* E = (Engine*)h;
  Engine2& R = registry_for(h);
  for (int i = (int)R.seqs.size() - 1; i >= 0; i--) {
    SeqRec& sw = R.seqs[i];
    if (!sw.active) continue;
    if (early_stop && (!sw.index_flag || sw.own_pw.empty())) break;
    if (sw.barcode != barcode) {
      if (early_stop) break;
      continue;
    }
    if (contig_min_cov > 0 && ms_is_contig_shallow(R, i, contig_min_cov)) {
      t4o_remove_from_read((void*)E, sw.consensus.data(),
                           (int)sw.consensus.size(), E->kmer_len, i,
                           sw.barcode, 0);
      ms_release(R, i);
      continue;
    }
    if (remove_from_index) {
      sw.index_flag = false;
      t4o_remove_from_read((void*)E, sw.consensus.data(),
                           (int)sw.consensus.size(), E->kmer_len, i,
                           sw.barcode, 0);
    }
    ms_update_consensus(E, R, i, false);

    // Even-coverage test (assemble.py:940-957).
    const std::string& cons = sw.consensus;
    int length = (int)cons.size();
    const std::vector<int32_t>& w = sw.own_pw;
    int32_t cov = 0;
    if (length > 0) {
      int c0 = nuc2num((unsigned char)cons[0]);
      if (c0 >= 0) cov = w[c0];
    }
    bool even = true;
    for (int j = 0; j < length && even; j++) {
      int code = nuc2num((unsigned char)cons[j]);
      int64_t row_sum = (int64_t)w[j * 4] + w[j * 4 + 1] + w[j * 4 + 2] +
                        w[j * 4 + 3];
      if (code >= 0) {
        int32_t at = w[j * 4 + code];
        int64_t others = row_sum - at;
        if (at == 0 || others != 0 || at != cov) even = false;
      } else {
        if (row_sum != 0) even = false;
      }
    }
    if (!even) {
      // Run-length quarter-slot compression (SeqSet.hpp:10883-10915).
      std::vector<int32_t> res;
      res.reserve(length);
      for (int j = 0; j < length; j++) {
        const int32_t* row = w.data() + (size_t)j * 4;
        int pos_cnt = 0;
        int32_t mx = row[0];
        for (int t = 0; t < 4; t++) {
          if (row[t] > 0) pos_cnt++;
          if (row[t] > mx) mx = row[t];
        }
        if (pos_cnt == 1) {
          res.push_back(-mx);
        } else {
          for (int t = 0; t < 4; t++) res.push_back(row[t]);
        }
      }
      while (res.size() % 4 != 0) res.push_back(0);
      sw.own_pw = std::move(res);
    } else {
      sw.num_read = cov;
      sw.own_pw.clear();
    }
    sw.pw_compressed = true;
    ms_sync(R, i);  // drops the pw pointer for compressed seqs
  }
}

// clean + change_kmer_length (engine/assemble.py:200-225).
void ms_clean(void* h, bool remove_ref_seq) {
  Engine* E = (Engine*)h;
  Engine2& R = registry_for(h);
  E->index.clear();
  invalidate_csr(E);
  std::vector<SeqRec> kept;
  for (SeqRec& sw : R.seqs) {
    if (!sw.active) continue;
    if (remove_ref_seq && sw.is_ref) continue;
    kept.push_back(std::move(sw));
  }
  R.seqs = std::move(kept);
  int n = (int)R.seqs.size();
  R.m_is_ref.assign(n, 0);
  R.m_barcode.assign(n, -1);
  R.m_seq_len.assign(n, 0);
  R.m_name4.assign((size_t)n * 4, 0);
  for (int k = 0; k < n; k++) {
    ms_sync(R, k);
    SeqRec& sw = R.seqs[k];
    if (sw.index_flag)
      t4o_build_from_read((void*)E, sw.consensus.data(),
                          (int)sw.consensus.size(), E->kmer_len, k,
                          sw.barcode, 0);
  }
  g_prev_add[h] = PrevAdd{-1, -1, -1, -1, -1, 0};
}

}  // namespace

extern "C" {

void t4s_add_read(void* h, const char* read, int len, const char* gene_name,
                  int gene_name_len, int strand, int barcode,
                  int min_kmer_count, int repetitive, double sim_threshold,
                  int radius, int hit_len_required, int is_long_seq_set,
                  int nomatch_gap_limit, double novel_sim, double ref_sim,
                  double repeat_sim, int32_t* out2) {
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  int o2[2];
  ms_add_read(h, read, len, gene_name, gene_name_len, strand, barcode,
              min_kmer_count, repetitive != 0, sim_threshold, C, o2);
  out2[0] = o2[0];
  out2[1] = o2[1];
}

// repeat_add_read (engine/assemble.py:985-999).
int t4s_repeat_add_read(void* h, const char* read, int len) {
  Engine2& R = registry_for(h);
  PrevAdd& info = g_prev_add[h];
  if (info.seq_idx < 0) return info.seq_idx;
  std::string rc;
  const char* r = read;
  if (info.strand == -1) {
    revcomp(read, len, rc);
    r = rc.c_str();
  }
  SeqRec& sw = R.seqs[info.seq_idx];
  ms_accumulate(sw, info.read_start + info.seq_start, r + info.read_start,
                info.read_end - info.read_start + 1);
  sw.num_read += 1;
  return info.seq_idx;
}

// input_novel_read (engine/assemble.py:93-104).
int t4s_input_novel_read(void* h, const char* name, int name_len,
                         const char* read, int len, int strand, int barcode) {
  Engine* E = (Engine*)h;
  Engine2& R = registry_for(h);
  int sid = ms_new_seq(R);
  SeqRec& sw = R.seqs[sid];
  sw.active = true;
  sw.is_ref = false;
  sw.name.assign(name, name_len);
  if (strand == -1) {
    std::string rc;
    revcomp(read, len, rc);
    sw.consensus = rc;
  } else {
    sw.consensus.assign(read, len);
  }
  sw.barcode = barcode;
  sw.num_read = 1;
  sw.info_zero = true;
  ms_pw_from_seq(sw);
  ms_sync(R, sid);
  t4o_build_from_read((void*)E, sw.consensus.data(),
                      (int)sw.consensus.size(), E->kmer_len, sid, barcode, 0);
  g_prev_add[h] = PrevAdd{sid, 0, len - 1, 0, len - 1, strand};
  if (dbg_on()) printf("add novel seq: %d\n", sid);
  return sid;
}

void t4s_update_all_consensus(void* h) {
  Engine* E = (Engine*)h;
  Engine2& R = registry_for(h);
  for (int i = 0; i < (int)R.seqs.size(); i++) {
    SeqRec& sw = R.seqs[i];
    if (!sw.active || sw.is_ref) continue;
    ms_update_consensus(E, R, i, true);
  }
}

void t4s_release_finished_barcode(void* h, int barcode, int remove_from_index,
                                  int contig_min_cov, int early_stop) {
  ms_release_finished_barcode(h, barcode, remove_from_index != 0,
                              contig_min_cov, early_stop != 0);
}

void t4s_change_kmer_length(void* h, int kl) {
  ((Engine*)h)->kmer_len = kl;
  ms_clean(h, false);
}

int t4s_seq_count(void* h) { return (int)registry_for(h).seqs.size(); }

void t4s_get_prev_add(void* h, int32_t* out6) {
  PrevAdd& p = g_prev_add[h];
  out6[0] = p.seq_idx;
  out6[1] = p.read_start;
  out6[2] = p.read_end;
  out6[3] = p.seq_start;
  out6[4] = p.seq_end;
  out6[5] = p.strand;
}

// Pull API: per-seq metadata then payloads.
// out[10] = {active, is_ref, barcode, num_read, min_left, min_right,
//            index_flag, pw_compressed, cons_len, pw_len_ints, info_zero}
void t4s_pull_meta(void* h, int sid, int64_t* out11) {
  SeqRec& s = registry_for(h).seqs[sid];
  out11[0] = s.active ? 1 : 0;
  out11[1] = s.is_ref ? 1 : 0;
  out11[2] = s.barcode;
  out11[3] = s.num_read;
  out11[4] = s.min_left_ext_anchor;
  out11[5] = s.min_right_ext_anchor;
  out11[6] = s.index_flag ? 1 : 0;
  out11[7] = s.pw_compressed ? 1 : 0;
  out11[8] = (int64_t)s.consensus.size();
  out11[9] = (int64_t)s.own_pw.size();
  out11[10] = s.info_zero ? 1 : 0;
}

int t4s_pull_name_len(void* h, int sid) {
  return (int)registry_for(h).seqs[sid].name.size();
}

void t4s_pull_data(void* h, int sid, char* cons, char* name, int32_t* pw) {
  SeqRec& s = registry_for(h).seqs[sid];
  if (cons) memcpy(cons, s.consensus.data(), s.consensus.size());
  if (name) memcpy(name, s.name.data(), s.name.size());
  if (pw && !s.own_pw.empty())
    memcpy(pw, s.own_pw.data(), s.own_pw.size() * sizeof(int32_t));
}

// Bulk pull, phase 1: per-seq meta rows (n, 11) in one call so Python
// can size the blob buffers (pull_from_native was 3 GIL-bound ctypes
// round trips per seq — dominated stitching at 26k contigs).
void t4s_pull_meta_all(void* h, int64_t* out11xn) {
  Engine2& R = registry_for(h);
  int n = (int)R.seqs.size();
  for (int i = 0; i < n; i++) {
    SeqRec& s = R.seqs[i];
    int64_t* o = out11xn + 11 * i;
    o[0] = s.active ? 1 : 0;
    o[1] = s.is_ref ? 1 : 0;
    o[2] = s.barcode;
    o[3] = s.num_read;
    o[4] = s.min_left_ext_anchor;
    o[5] = s.min_right_ext_anchor;
    o[6] = s.index_flag ? 1 : 0;
    o[7] = s.pw_compressed ? 1 : 0;
    o[8] = (int64_t)s.consensus.size();
    o[9] = (int64_t)s.own_pw.size();
    o[10] = (int64_t)s.name.size();
  }
}

// Bulk pull, phase 2: concatenated name/consensus bytes and posWeight
// ints, in seq order (caller sized the buffers from phase 1; the
// info_zero flag rides in meta slot 10's high bit-free... it moved to a
// separate array to keep layout simple).
void t4s_pull_data_all(void* h, char* names, char* cons, int32_t* pw,
                       uint8_t* info_zero) {
  Engine2& R = registry_for(h);
  int n = (int)R.seqs.size();
  size_t at_n = 0, at_c = 0, at_p = 0;
  for (int i = 0; i < n; i++) {
    SeqRec& s = R.seqs[i];
    memcpy(names + at_n, s.name.data(), s.name.size());
    at_n += s.name.size();
    memcpy(cons + at_c, s.consensus.data(), s.consensus.size());
    at_c += s.consensus.size();
    if (!s.own_pw.empty()) {
      memcpy(pw + at_p, s.own_pw.data(), s.own_pw.size() * sizeof(int32_t));
      at_p += s.own_pw.size();
    }
    info_zero[i] = s.info_zero ? 1 : 0;
  }
}

// BuildSeqSubstringRelation (SeqSet.hpp:2127-2250; Python oracle
// engine/scaffold.py:1019-1089): for every seq, count shared-k-mer hits
// against the index and verify a <2-mismatch full-length substring
// embedding into the best container.  out2 holds (container_sid, start)
// per seq, container_sid == -1 when the seq is not a substring.  Works in
// both registry and master mode (SeqRec.consensus is current either way).
// Candidate iteration follows the reference's ordered std::map.
void t4s_substring_relation(void* h, int32_t* out2) {
  Engine* E = (Engine*)h;
  Engine2& R = registry_for(h);
  int seq_cnt = (int)R.seqs.size();
  int kl = E->kmer_len;
  for (int k = 0; k < seq_cnt; k++) {
    out2[2 * k] = -1;
    out2[2 * k + 1] = 0;
  }
  std::vector<uint64_t> codes;
  std::vector<uint8_t> valid;
  std::map<int, int> seq_hit_cnt;
  std::map<int, std::pair<int, int>> first_seq_hit;
  for (int k = 0; k < seq_cnt; k++) {
    const SeqRec& sw = R.seqs[k];
    if (!sw.active || sw.consensus.empty()) continue;
    const std::string& cons = sw.consensus;
    int len = (int)cons.size();
    // Reference aborts the whole pass on a too-short consensus
    // (SeqSet.hpp:2145-2146), keeping earlier entries.
    if (len < kl) return;
    window_codes(cons.c_str(), len, kl, codes, valid);
    int n = (int)codes.size();
    int skip_limit = kl / 2;
    int skip_cnt = 0;
    int hit_cnt = 0;
    seq_hit_cnt.clear();
    first_seq_hit.clear();
    uint64_t prev_code = 0;
    static const PostVec kEmpty;
    for (int w = 0; w < n; w++) {
      uint64_t code = codes[w];
      if (w == 1 || code != prev_code) {
        const PostVec* postings = &kEmpty;
        if (valid[w]) {
          const PostVec *pv2 =
              E->index.find(make_key(*E, code, sw.barcode));
          if (pv2 != nullptr) postings = pv2;
        }
        int size = (int)postings->size();
        if (size >= 100 && skip_cnt < skip_limit) {
          skip_cnt++;
          continue;  // quirk: bypasses the prev_code update
        }
        skip_cnt = 0;
        for (const auto& p : *postings) {
          int idx = p.first;
          if (idx == k || R.seqs[idx].barcode != sw.barcode) continue;
          auto hit = seq_hit_cnt.find(idx);
          if (hit != seq_hit_cnt.end()) {
            if (hit_cnt >= 50 && hit->second < hit_cnt * 0.5)
              seq_hit_cnt.erase(hit);
            else
              hit->second++;
          } else if (hit_cnt < 50) {
            seq_hit_cnt[idx] = 1;
            first_seq_hit[idx] = {w, p.second};
          }
        }
        hit_cnt++;
      }
      prev_code = code;
    }
    for (const auto& it : seq_hit_cnt) {
      if (it.second < hit_cnt * 0.6) continue;
      int idx = it.first;
      const auto& fh = first_seq_hit[idx];
      if (fh.second - fh.first < 0) continue;
      int start = fh.second - fh.first;
      const std::string& other = R.seqs[idx].consensus;
      if (start + len - 1 >= (int)other.size()) continue;
      int mismatch = 0;
      bool ok = true;
      for (int j = 0; j < len; j++) {
        if (cons[j] != other[start + j]) mismatch++;
        if (mismatch >= 2) {
          ok = false;
          break;
        }
      }
      if (ok) {
        out2[2 * k] = idx;
        out2[2 * k + 1] = start;
        break;
      }
    }
  }
}

}  // extern "C"

// ===========================================================================
// Batched scored queries (annotator phase-1 precompute): one threaded call
// runs GetOverlapsFromRead for many (read, strand, barcode, read_type,
// skip_repeats) tuples against the read-only engine.
// ===========================================================================

extern "C" {

// Outputs: out_i32 rows (9 per overlap) + out_f64 sims, shared across all
// queries; out_range[2*i] = row offset, out_range[2*i+1] = count (or -1 for
// a short-read query).  Returns 0, or -2 when cap is exceeded (caller grows
// and retries).
int t4o_query_scored_batch(void* h, const char* blob, const int64_t* offs,
                           const int32_t* strands, const int32_t* barcodes,
                           const int32_t* read_types,
                           const int32_t* skip_repeats, int n_reads,
                           int n_threads, int radius, int hit_len_required,
                           int is_long_seq_set, int nomatch_gap_limit,
                           double novel_sim, double ref_sim,
                           double repeat_sim, int32_t* out_i32,
                           double* out_f64, int cap, int64_t* out_range) {
  Engine* E = (Engine*)h;
  engine_ensure_csr(E);  // frozen index for this batch
  Engine2& R = registry_for(h);
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  std::vector<std::vector<SOv>> results((size_t)n_reads);
  auto work = [&](int lo, int hi) {
    for (int i = lo; i < hi; i++) {
      const char* rd = blob + offs[i];
      int len = (int)(offs[i + 1] - offs[i]);
      query_scored_core(E, R, C, rd, len, strands[i], barcodes[i],
                        read_types[i], skip_repeats[i] != 0, nullptr,
                        results[i]);
      if (len < E->kmer_len) results[i].clear();
    }
  };
  if (n_threads <= 1 || n_reads < 8) {
    work(0, n_reads);
  } else {
    steal_for(n_reads, n_threads, 8,
              [&](int, int lo, int hi) { work(lo, hi); });
  }
  int64_t total = 0;
  for (auto& v : results) total += (int64_t)v.size();
  if (total > cap) return -2;
  int64_t at = 0;
  for (int i = 0; i < n_reads; i++) {
    int len = (int)(offs[i + 1] - offs[i]);
    out_range[2 * i] = at;
    out_range[2 * i + 1] = (len < E->kmer_len) ? -1 : (int64_t)results[i].size();
    for (const SOv& o : results[i]) {
      int32_t* row = out_i32 + 9 * at;
      row[0] = o.seq_idx;
      row[1] = o.read_start;
      row[2] = o.read_end;
      row[3] = o.strand;
      row[4] = o.seq_start;
      row[5] = o.seq_end;
      row[6] = (int32_t)o.match_cnt;
      row[7] = (int32_t)o.indel_cnt;
      row[8] = o.info_from_hits;
      out_f64[at] = o.similarity;
      at++;
    }
  }
  return 0;
}

}  // extern "C"

// ===========================================================================
// Two-phase device-assisted batch (annotator stage 2; see
// pipeline/annotator.py _precompute_contig_queries device path)
// ===========================================================================

extern "C" {

// Phase 1: run the batch in collect mode and emit the is_ref gap-fill job
// list.  out_jobs rows of 8 int32 {q, ov_idx, gap_ord, seq_idx, t_from,
// t_len, r_from, r_len}.  Returns the job count, or -2 when cap is too
// small.
int t4o_batch_collect_gaps(void* h, const char* blob, const int64_t* offs,
                           const int32_t* strands, const int32_t* barcodes,
                           const int32_t* read_types,
                           const int32_t* skip_repeats, int n_reads,
                           int n_threads, int radius, int hit_len_required,
                           int is_long_seq_set, int nomatch_gap_limit,
                           double novel_sim, double ref_sim,
                           double repeat_sim, int32_t* out_jobs, int cap) {
  Engine* E = (Engine*)h;
  engine_ensure_csr(E);  // frozen index for this batch
  Engine2& R = registry_for(h);
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  int nt = (n_threads <= 1 || n_reads < 8) ? 1 : n_threads;
  std::vector<std::vector<GapJob>> sinks((size_t)nt);
  auto work = [&](int t, int lo, int hi) {
    std::vector<SOv> res;
    GapCtx g;
    g.mode = 1;
    g.sink = &sinks[t];
    for (int i = lo; i < hi; i++) {
      g.q = i;
      query_scored_core(E, R, C, blob + offs[i],
                        (int)(offs[i + 1] - offs[i]), strands[i],
                        barcodes[i], read_types[i], skip_repeats[i] != 0,
                        nullptr, res, &g);
    }
  };
  if (nt == 1) {
    work(0, 0, n_reads);
  } else {
    steal_for(n_reads, nt, 8,
              [&](int tid, int lo, int hi) { work(tid, lo, hi); });
  }
  int64_t total = 0;
  for (auto& s : sinks) total += (int64_t)s.size();
  if (total > cap) return (int)(-total - 16);  // needed size, one exact retry
  int64_t at = 0;
  for (auto& s : sinks)
    for (const GapJob& j : s) {
      int32_t* row = out_jobs + 8 * at++;
      row[0] = j.q;
      row[1] = j.ov_idx;
      row[2] = j.gap_ord;
      row[3] = j.seq_idx;
      row[4] = j.t_from;
      row[5] = j.t_len;
      row[6] = j.r_from;
      row[7] = j.r_len;
    }
  return (int)total;
}

// Emit device-ready code rows for collected gap jobs: for each job row
// (from t4o_batch_collect_gaps), write the t segment's and the read ("p")
// segment's DP codes (A0 C1 G2 T3 N4, pad 5) into fixed-width rows of
// `width` (jobs longer than width are the caller's responsibility to
// exclude).  blob/offs identify the batch's query reads.
void t4o_emit_gap_codes(void* h, const char* blob, const int64_t* offs,
                        const int32_t* jobs, int n_jobs, int width,
                        int8_t* out_t, int8_t* out_p) {
  Engine2& R = registry_for(h);
  memset(out_t, 5, (size_t)n_jobs * width);
  memset(out_p, 5, (size_t)n_jobs * width);
  auto code_of = [](char c) -> int8_t {
    switch (c) {
      case 'A': return 0;
      case 'C': return 1;
      case 'G': return 2;
      case 'T': return 3;
      case 'N': return 4;
      default: return 5;
    }
  };
  for (int j = 0; j < n_jobs; j++) {
    const int32_t* row = jobs + 8 * j;
    int seq_idx = row[3] & ~((int32_t)1 << 30);
    bool rc = (row[3] & ((int32_t)1 << 30)) != 0;
    const std::string& cons = R.seqs[seq_idx].consensus;
    int t_len = row[5] < width ? row[5] : width;
    int8_t* ot = out_t + (size_t)j * width;
    for (int i = 0; i < t_len; i++) ot[i] = code_of(cons[row[4] + i]);
    const char* rd = blob + offs[row[0]];
    int r_len = row[7] < width ? row[7] : width;
    int8_t* op = out_p + (size_t)j * width;
    if (!rc) {
      for (int i = 0; i < r_len; i++) op[i] = code_of(rd[row[6] + i]);
    } else {
      // Strand -1 job (annotate0 batches): the DP query segment is the
      // reverse complement walking backward from the forward anchor.
      for (int i = 0; i < r_len; i++) {
        int8_t c = code_of(rd[row[6] - i]);
        op[i] = c < 4 ? (int8_t)(3 - c) : c;
      }
    }
  }
}

// Content-keyed dedup of collected gap jobs (the device-path twin of the
// CPU memo in align_kernels.cpp t4_chain_score): IMGT alleles are
// near-duplicates, so the same (target segment, read segment) pair recurs
// ~25x per batch.  Hashes the exact DP inputs — the code bytes the device
// would see (A0 C1 G2 T3 N4, other->5; rc-walked for bit-30 jobs) plus
// both lengths — and groups equal jobs.  Exact compare on hash collision
// (bit-identity contract: no probabilistic shortcuts).  Replaces the
// np.unique-on-void-rows dedup that cost 68s at the 10M-job scale
// (VERDICT r3: gap-prof dedup=12s+55.6s).
//   out_inverse (n_jobs): unique ordinal of each job
//   out_uniq    (n_jobs cap): job index of each unique's representative
// Returns the unique count.  Thread-parallel by hash shard; unique
// ordinals are shard-grouped, which is fine because per-job DP counts
// are order-independent.
int t4o_dedup_gap_jobs(void* h, const char* blob, const int64_t* offs,
                       const int32_t* jobs, int64_t n_jobs, int width,
                       int n_threads, int32_t* out_inverse,
                       int32_t* out_uniq) {
  Engine2& R = registry_for(h);
  auto code_of = [](char c) -> int8_t {
    switch (c) {
      case 'A': return 0;
      case 'C': return 1;
      case 'G': return 2;
      case 'T': return 3;
      case 'N': return 4;
      default: return 5;
    }
  };
  // Emit one job's key bytes (t codes + p codes + lens) into buf.
  auto emit_key = [&](int64_t j, std::string& buf) {
    const int32_t* row = jobs + 8 * j;
    int seq_idx = row[3] & ~((int32_t)1 << 30);
    bool rc = (row[3] & ((int32_t)1 << 30)) != 0;
    const std::string& cons = R.seqs[seq_idx].consensus;
    int t_len = row[5] < width ? row[5] : width;
    int r_len = row[7] < width ? row[7] : width;
    buf.clear();
    buf.reserve((size_t)t_len + r_len + 4);
    for (int i = 0; i < t_len; i++)
      buf.push_back((char)code_of(cons[row[4] + i]));
    buf.push_back((char)0x7f);
    if (!rc) {
      const char* rd = blob + offs[row[0]];
      for (int i = 0; i < r_len; i++)
        buf.push_back((char)code_of(rd[row[6] + i]));
    } else {
      const char* rd = blob + offs[row[0]];
      for (int i = 0; i < r_len; i++) {
        int8_t c = code_of(rd[row[6] - i]);
        buf.push_back((char)(c < 4 ? (int8_t)(3 - c) : c));
      }
    }
    // Lengths join the key: non-ACGTN bytes share the pad code, so code
    // rows alone can't distinguish trailing ambiguity from a shorter job
    // (same rule as the Python-side dedup this replaces).
    buf.push_back((char)(t_len & 0xff));
    buf.push_back((char)((t_len >> 8) & 0xff));
    buf.push_back((char)(r_len & 0xff));
    buf.push_back((char)((r_len >> 8) & 0xff));
  };

  int nt = n_threads < 1 ? 1 : n_threads;
  if (n_jobs < 4096) nt = 1;
  // Pass 1 (parallel): 64-bit content hash per job.
  std::vector<uint64_t> hashes((size_t)n_jobs);
  steal_for((int)((n_jobs + 4095) / 4096), nt, 1, [&](int, int lo, int hi) {
    std::string buf;
    for (int64_t blk = lo; blk < hi; blk++) {
      int64_t a = blk * 4096, b = std::min<int64_t>(a + 4096, n_jobs);
      for (int64_t j = a; j < b; j++) {
        emit_key(j, buf);
        uint64_t hv = 1469598103934665603ull;  // FNV-1a
        for (char c : buf) {
          hv ^= (uint8_t)c;
          hv *= 1099511628211ull;
        }
        hashes[(size_t)j] = hv;
      }
    }
  });
  // Pass 2 (parallel by hash shard): group within each shard; exact
  // compare via the representative's key bytes on hash hits.
  std::vector<std::vector<int32_t>> shard_uniq((size_t)nt);
  std::vector<std::thread> ths;
  std::vector<int64_t> shard_base((size_t)nt + 1, 0);
  auto shard_work = [&](int s) {
    std::unordered_map<uint64_t, std::vector<int32_t>> groups;
    groups.reserve((size_t)(n_jobs / (2 * nt) + 16));
    std::vector<int32_t>& uniq = shard_uniq[(size_t)s];
    std::string buf, rep;
    // local unique ordinal stored in out_inverse; rebased in pass 3
    for (int64_t j = 0; j < n_jobs; j++) {
      if ((int)(hashes[(size_t)j] % (uint64_t)nt) != s) continue;
      auto& cand = groups[hashes[(size_t)j]];
      emit_key(j, buf);
      int32_t hit = -1;
      for (int32_t u : cand) {
        emit_key(uniq[(size_t)u], rep);
        if (rep == buf) {
          hit = u;
          break;
        }
      }
      if (hit < 0) {
        hit = (int32_t)uniq.size();
        uniq.push_back((int32_t)j);
        cand.push_back(hit);
      }
      out_inverse[j] = hit;  // local; rebased in pass 3
    }
  };
  if (nt == 1) {
    shard_work(0);
  } else {
    for (int s = 0; s < nt; s++) ths.emplace_back(shard_work, s);
    for (auto& t : ths) t.join();
  }
  for (int s = 0; s < nt; s++)
    shard_base[(size_t)s + 1] =
        shard_base[(size_t)s] + (int64_t)shard_uniq[(size_t)s].size();
  int64_t n_uniq = shard_base[(size_t)nt];
  for (int s = 0; s < nt; s++) {
    const auto& uniq = shard_uniq[(size_t)s];
    int64_t base = shard_base[(size_t)s];
    for (size_t k = 0; k < uniq.size(); k++)
      out_uniq[base + (int64_t)k] = uniq[k];
  }
  // Pass 3 (parallel): rebase local ordinals to global ids.
  steal_for((int)((n_jobs + 65535) / 65536), nt, 1,
            [&](int, int lo, int hi) {
              for (int64_t blk = lo; blk < hi; blk++) {
                int64_t a = blk * 65536,
                        b = std::min<int64_t>(a + 65536, n_jobs);
                for (int64_t j = a; j < b; j++)
                  out_inverse[j] +=
                      (int32_t)shard_base[hashes[(size_t)j] % (uint64_t)nt];
              }
            });
  return (int)n_uniq;
}

// Batched CPU (match, mismatch, indel) counts for SELECTED gap jobs —
// the hybrid tier split's CPU half plus the top-tier-miss path: the
// device takes the tiers the measured gate says it wins, and worker
// threads fill the rest while the launches are in flight
// (ops/gap_oracle.py round 5).  Segment semantics replicate
// _job_segments / t4o_emit_gap_codes: bit 30 of seq_idx marks a
// reverse-complement query walked backward from the forward anchor;
// non-ACGT complements to 'N' (dna.revcomp).
void t4o_gap_counts_cpu(void* h, const char* blob, const int64_t* offs,
                        const int32_t* jobs, const int64_t* sel,
                        int64_t n_sel, int n_threads, int32_t* out) {
  Engine2& R = registry_for(h);
  int nt = n_threads < 1 ? 1 : n_threads;
  if (n_sel < 256) nt = 1;
  steal_for((int)n_sel, nt, 64, [&](int, int lo, int hi) {
    std::string t, p;
    for (int i = lo; i < hi; i++) {
      const int32_t* row = jobs + 8 * sel[i];
      int seq_idx = row[3] & ~((int32_t)1 << 30);
      bool rc = (row[3] & ((int32_t)1 << 30)) != 0;
      const std::string& cons = R.seqs[(size_t)seq_idx].consensus;
      t.assign(cons, (size_t)row[4], (size_t)row[5]);
      const char* rd = blob + offs[row[0]];
      int r_len = row[7];
      p.clear();
      if (!rc) {
        p.assign(rd + row[6], (size_t)r_len);
      } else {
        for (int k = 0; k < r_len; k++) {
          char c = rd[row[6] - k];
          switch (c) {
            case 'A': c = 'T'; break;
            case 'C': c = 'G'; break;
            case 'G': c = 'C'; break;
            case 'T': c = 'A'; break;
            default: c = 'N';
          }
          p.push_back(c);
        }
      }
      t4_global_alignment_counts(t.data(), (int)t.size(), p.data(),
                                 (int)p.size(), out + 3 * (int64_t)i);
    }
  });
}

// Phase 2: the scored batch with device gap counts.  jobs/counts from
// phase 1 + the device pass; otherwise identical to
// t4o_query_scored_batch.
int t4o_query_scored_batch_oracle(
    void* h, const char* blob, const int64_t* offs, const int32_t* strands,
    const int32_t* barcodes, const int32_t* read_types,
    const int32_t* skip_repeats, int n_reads, int n_threads, int radius,
    int hit_len_required, int is_long_seq_set, int nomatch_gap_limit,
    double novel_sim, double ref_sim, double repeat_sim,
    const int32_t* jobs, const int32_t* counts, int n_jobs,
    int32_t* out_i32, double* out_f64, int cap, int64_t* out_range) {
  Engine* E = (Engine*)h;
  engine_ensure_csr(E);  // frozen index for this batch
  Engine2& R = registry_for(h);
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  std::unordered_map<uint64_t, int32_t> oracle;
  oracle.reserve((size_t)n_jobs * 2);
  for (int j = 0; j < n_jobs; j++) {
    const int32_t* row = jobs + 8 * j;
    oracle[gap_key(row[0], row[1], row[2])] = j;
  }
  std::vector<std::vector<SOv>> results((size_t)n_reads);
  auto work = [&](int lo, int hi) {
    GapCtx g;
    g.mode = 2;
    g.oracle = &oracle;
    g.counts = counts;
    for (int i = lo; i < hi; i++) {
      g.q = i;
      query_scored_core(E, R, C, blob + offs[i],
                        (int)(offs[i + 1] - offs[i]), strands[i],
                        barcodes[i], read_types[i], skip_repeats[i] != 0,
                        nullptr, results[i], &g);
    }
  };
  if (n_threads <= 1 || n_reads < 8) {
    work(0, n_reads);
  } else {
    steal_for(n_reads, n_threads, 8,
              [&](int, int lo, int hi) { work(lo, hi); });
  }
  int64_t total = 0;
  for (auto& v : results) total += (int64_t)v.size();
  if (total > cap) return -2;
  int64_t at = 0;
  for (int i = 0; i < n_reads; i++) {
    int len = (int)(offs[i + 1] - offs[i]);
    out_range[2 * i] = at;
    out_range[2 * i + 1] =
        (len < E->kmer_len) ? -1 : (int64_t)results[i].size();
    for (const SOv& o : results[i]) {
      int32_t* row = out_i32 + 9 * at;
      row[0] = o.seq_idx;
      row[1] = o.read_start;
      row[2] = o.read_end;
      row[3] = o.strand;
      row[4] = o.seq_start;
      row[5] = o.seq_end;
      row[6] = (int32_t)o.match_cnt;
      row[7] = (int32_t)o.indel_cnt;
      row[8] = o.info_from_hits;
      out_f64[at] = o.similarity;
      at++;
    }
  }
  return 0;
}

// Phase 1 (quick annotation): t4o_annotate0_batch in collect mode.  Same
// consecutive-duplicate dedup and chunking (block 64) as the real batch so
// phase 2's oracle keys line up read-for-read; a dedup divergence only
// costs oracle misses (CPU DP fallback), never correctness.  Jobs anchor
// into the FULL forward read with a bit-30 rc flag on seq_idx (see
// t4o_emit_gap_codes).  Returns the job count, or -2 when cap is too
// small.
int t4o_annotate0_collect_gaps(void* h, const char* blob,
                               const int64_t* offs, int n_reads,
                               int n_threads, int radius,
                               int hit_len_required, int is_long_seq_set,
                               int nomatch_gap_limit, double novel_sim,
                               double ref_sim, double repeat_sim, int gap_n,
                               int32_t* out_jobs, int cap) {
  Engine* E = (Engine*)h;
  engine_ensure_csr(E);  // frozen index for this batch
  Engine2& R = registry_for(h);
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  int nt = (n_threads <= 1 || n_reads < 64) ? 1 : n_threads;
  std::vector<std::vector<GapJob>> sinks((size_t)nt);
  auto work = [&](int t, int lo, int hi) {
    SOv gene[4];
    GapCtx g;
    g.mode = 1;
    g.sink = &sinks[t];
    const char* prev = nullptr;
    int prev_len = -1;
    for (int i = lo; i < hi; i++) {
      const char* rd = blob + offs[i];
      int len = (int)(offs[i + 1] - offs[i]);
      if (prev == nullptr || len != prev_len ||
          memcmp(rd, prev, len) != 0) {
        g.q = i;
        annotate_detail0(E, R, C, gap_n, rd, len, gene, &g);
        prev = rd;
        prev_len = len;
      }
    }
  };
  if (nt == 1) {
    work(0, 0, n_reads);
  } else {
    steal_for(n_reads, nt, 64,
              [&](int tid, int lo, int hi) { work(tid, lo, hi); });
  }
  int64_t total = 0;
  for (auto& s : sinks) total += (int64_t)s.size();
  if (total > cap) return (int)(-total - 16);  // needed size, one exact retry
  int64_t at = 0;
  for (auto& s : sinks)
    for (const GapJob& j : s) {
      int32_t* row = out_jobs + 8 * at++;
      row[0] = j.q;
      row[1] = j.ov_idx;
      row[2] = j.gap_ord;
      row[3] = j.seq_idx;
      row[4] = j.t_from;
      row[5] = j.t_len;
      row[6] = j.r_from;
      row[7] = j.r_len;
    }
  return (int)total;
}

// Phase 2 (quick annotation): t4o_annotate0_batch consuming device gap
// counts; otherwise identical to the plain batch (same dedup/chunking).
void t4o_annotate0_batch_oracle(void* h, const char* blob,
                                const int64_t* offs, int n_reads,
                                int n_threads, int radius,
                                int hit_len_required, int is_long_seq_set,
                                int nomatch_gap_limit, double novel_sim,
                                double ref_sim, double repeat_sim,
                                int gap_n, const int32_t* jobs,
                                const int32_t* counts, int n_jobs,
                                int32_t* out_i32, double* out_f64) {
  Engine* E = (Engine*)h;
  engine_ensure_csr(E);  // frozen index for this batch
  Engine2& R = registry_for(h);
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  std::unordered_map<uint64_t, int32_t> oracle;
  oracle.reserve((size_t)n_jobs * 2);
  for (int j = 0; j < n_jobs; j++) {
    const int32_t* row = jobs + 8 * j;
    oracle[gap_key(row[0], row[1], row[2])] = j;
  }
  auto work = [&](int lo, int hi) {
    SOv gene[4];
    GapCtx g;
    g.mode = 2;
    g.oracle = &oracle;
    g.counts = counts;
    const char* prev = nullptr;
    int prev_len = -1;
    for (int i = lo; i < hi; i++) {
      const char* rd = blob + offs[i];
      int len = (int)(offs[i + 1] - offs[i]);
      if (prev == nullptr || len != prev_len ||
          memcmp(rd, prev, len) != 0) {
        g.q = i;
        annotate_detail0(E, R, C, gap_n, rd, len, gene, &g);
        prev = rd;
        prev_len = len;
      }
      for (int gi = 0; gi < 4; gi++)
        write_g8(gene[gi], out_i32 + 32 * (int64_t)i + 8 * gi,
                 out_f64 + 4 * (int64_t)i + gi);
    }
  };
  if (n_threads <= 1 || n_reads < 64) {
    work(0, n_reads);
  } else {
    steal_for(n_reads, n_threads, 64,
              [&](int, int lo, int hi) { work(lo, hi); });
  }
}

}  // extern "C"

// Detail-2 annotation (native port; see the file header for scope).
#include "annotate2.inc"

// ===========================================================================
// The greedy assembly loop, fully native (pipeline/assembler.py assemble();
// reference main.cpp:1583-1940): per-read Python iteration + ctypes
// marshalling cost ~35us/read at 68k reads.  The loop body calls the same
// primitives the Python loop called one FFI round-trip at a time
// (ms_add_read / t4s_repeat_add_read / t4s_input_novel_read / barcode
// release / consensus cadence / kmer-length growth), so outputs are
// byte-identical by construction.  The Python loop remains the
// debug-trace (TRUST4_TPU_DEBUG) and speculative-round path.
// ===========================================================================

namespace {

// has_motif (engine/annotate.py:84-107; SeqSet.hpp:5029-5074): YYC /
// [FW]GxG over 3 frames of the FORWARD read (the reference computes but
// never uses the rc for strand -1).
// compute_nomatch_gap_limit (engine/seqset.py:111; SeqSet.hpp:2476-2482).
int ms_nomatch_gap_limit(int kmer_length) {
  double kmer_hit_prob = std::pow(0.8, (double)kmer_length);
  return (int)((double)kmer_length *
               (std::log(0.01) / std::log(1.0 - kmer_hit_prob))) +
         1;
}

int ms_has_motif(const char* read, int len, int strand) {
  if (strand == 0) return 0;
  int ret = 0;
  for (int k = 0; k < 3; k++) {
    static thread_local std::vector<char> aa;
    aa.clear();
    for (int i = k; i + 2 < len; i += 3)
      aa.push_back(ann2::codon_aa(read[i], read[i + 1], read[i + 2]));
    int j = (int)aa.size();
    for (int i = 0; i + 2 < j; i++)
      if (aa[i] == 'Y' && aa[i + 1] == 'Y' && aa[i + 2] == 'C') {
        ret |= 2;
        break;
      }
    for (int i = 0; i + 3 < j; i++)
      if ((aa[i] == 'F' || aa[i] == 'W') && aa[i + 1] == 'G' &&
          aa[i + 3] == 'G') {
        ret |= 1;
        break;
      }
  }
  return ret;
}

}  // namespace

extern "C" {

// Runs the whole greedy loop + rescue pass.  Per-read inputs:
//   meta (n, 6) int32 rows {barcode, mate_idx, min_cnt, has_plan,
//                           plan_strand, plan_min_kmer_cnt}
//   plan_sim (n,) f64; plan_name4 (n,) int32 (<=4 raw name bytes, LE, 0-padded)
//   g8 (n, 4, 8) int32 quick-annotation rows {seq_idx, read_start,
//      read_end, strand, seq_start, seq_end, match_cnt, indel_cnt};
//   gsim (n, 4) f64 similarities (rows of repeat reads unused — the loop
//   keeps the last non-repeat read's rows live, the reference variable
//   semantics).
//   ref_lens (n_ref,) / ref_names blob+offs: the quick-annotation target
//   SeqSet (rescue reads its consensus_len + name).
// In/out: io_strand (n,) i32, io_info (n,) i32, io_good (n,) u8.
// Outputs: out_add_ret (n,) i32; out_assembled (cap n+rescues) i32 index
// list in emit order (loop order, then rescue order).  Returns the
// assembled count written to out_assembled (loop + rescue).
int t4s_assemble_loop(
    void* h, const char* blob, const int64_t* offs, int n,
    const int32_t* meta, const double* plan_sim, const int32_t* plan_name4,
    const int32_t* g8, const double* gsim, const int32_t* ref_lens,
    const char* ref_names, const int64_t* ref_name_offs, int n_ref,
    int radius, int hit_len_required, int is_long_seq_set,
    int nomatch_gap_limit, double novel_sim, double ref_sim,
    double repeat_sim, int has_barcode, int keep_missing_barcode,
    int contig_min_cov, int first_read_len, int repetitive,
    int64_t change_kmer_threshold, int index_kmer_length,
    int32_t* io_strand, int32_t* io_info, uint8_t* io_good,
    int32_t* out_add_ret, int32_t* out_assembled, int32_t* out_final_kl) {
  SConf C{radius, hit_len_required, is_long_seq_set != 0, nomatch_gap_limit,
          novel_sim, ref_sim, repeat_sim};
  (void)n_ref;

  std::unordered_map<int, int> barcode_total, barcode_done;
  if (has_barcode) {
    for (int i = 0; i < n; i++) {
      int bc = meta[6 * i];
      if (bc != -1) barcode_total[bc]++;
    }
  }

  std::vector<int> rescue_idx;
  int n_assembled = 0;
  int assembled_read_cnt = 0;
  int prev_add_ret = -1;
  int gsrc = 0;  // last non-repeat read: its g8/gsim rows are the live
                 // gene_overlap variable (reference main.cpp loop scope)
  auto G = [&](int i, int g, int f) -> int32_t {
    return g8[(int64_t)32 * i + 8 * g + f];
  };
  auto GS = [&](int i, int g) -> double { return gsim[(int64_t)4 * i + g]; };

  for (int i = 0; i < n; i++) {
    const char* rd = blob + offs[i];
    int len = (int)(offs[i + 1] - offs[i]);
    int bc = meta[6 * i];
    int mate_idx = meta[6 * i + 1];
    int add_ret = -1;
    bool is_repeat =
        i > 0 && len == (int)(offs[i] - offs[i - 1]) &&
        memcmp(rd, blob + offs[i - 1], len) == 0 && bc == meta[6 * (i - 1)];
    if (!is_repeat) {
      gsrc = i;
      if (meta[6 * i + 3]) {  // has_plan
        char name[4];
        int32_t n4 = plan_name4[i];
        int name_len = 0;
        for (int b = 0; b < 4; b++) {
          char c = (char)((n4 >> (8 * b)) & 0xff);
          if (c == 0) break;
          name[name_len++] = c;
        }
        int o2[2];
        ms_add_read(h, rd, len, name, name_len, meta[6 * i + 4], bc,
                    meta[6 * i + 5], repetitive != 0, plan_sim[i], C, o2);
        add_ret = o2[0];
        io_strand[i] = o2[1];
        if (add_ret < 0) {
          // Reference-anchor rescue (main.cpp:1703-1759).
          int64_t match_cnt = 0;
          for (int g = 0; g < 4; g++)
            if (G(gsrc, g, 0) != -1) match_cnt += G(gsrc, g, 6) / 2;
          bool filtered = true;
          if (match_cnt >= 31) {
            filtered = false;
          } else {
            if (G(gsrc, 0, 0) != -1 && G(gsrc, 2, 0) != -1 &&
                G(gsrc, 0, 2) < G(gsrc, 2, 1)) {
              filtered = false;
            } else if (G(gsrc, 0, 0) != -1) {
              if (G(gsrc, 0, 5) >= ref_lens[G(gsrc, 0, 0)] - 17)
                filtered = false;
            } else if (G(gsrc, 2, 0) != -1) {
              if (G(gsrc, 2, 4) <= 17) filtered = false;
            }
          }
          int first_gene = -1;
          for (int g = 0; g < 4; g++)
            if (G(gsrc, g, 0) != -1) {
              first_gene = g;
              break;
            }
          if (!filtered && first_gene != -1) {
            int sidx = G(gsrc, first_gene, 0);
            const char* nm = ref_names + ref_name_offs[sidx];
            int nm_len = (int)(ref_name_offs[sidx + 1] - ref_name_offs[sidx]);
            add_ret = t4s_input_novel_read(h, nm, nm_len, rd, len,
                                           G(gsrc, first_gene, 3), bc);
          } else if (io_good[i]) {
            int mate_strand = -io_strand[io_info[i]];
            if (ms_has_motif(rd, len, mate_strand))
              add_ret = t4s_input_novel_read(h, "Novel", 5, rd, len,
                                             mate_strand, bc);
          }
        }
      }
    } else {
      if (prev_add_ret != -1 && prev_add_ret != -3)
        add_ret = t4s_repeat_add_read(h, rd, len);
      else if (prev_add_ret == -3)
        add_ret = -3;
      io_strand[i] = io_strand[i - 1];
    }

    if (add_ret == -2) {
      rescue_idx.push_back(i);
    } else if (add_ret >= 0) {
      assembled_read_cnt++;
      out_assembled[n_assembled++] = i;
      if (mate_idx > i) {
        bool good = false, may_span = false;
        if (G(gsrc, 0, 0) != -1 && GS(gsrc, 0) >= 0.9 &&
            io_strand[i] == 1) {
          good = true;
          if (G(gsrc, 2, 0) != -1 && G(gsrc, 2, 1) > G(gsrc, 0, 2))
            may_span = true;
          if (G(gsrc, 3, 0) != -1 && G(gsrc, 3, 1) > G(gsrc, 0, 2))
            may_span = true;
        }
        for (int g = 2; g <= 3; g++) {
          if (G(gsrc, g, 0) != -1 && GS(gsrc, g) >= 0.9 &&
              io_strand[i] == -1) {
            good = true;
            if (G(gsrc, 0, 0) != -1 && G(gsrc, g, 1) > G(gsrc, 0, 2))
              may_span = true;
          }
        }
        if (may_span) good = false;
        if (good && !io_good[mate_idx]) {
          int tag = mate_idx;
          int64_t tlen = offs[tag + 1] - offs[tag];
          for (int j = tag - 1; j > 0; j--) {
            if (offs[j + 1] - offs[j] == tlen &&
                memcmp(blob + offs[j], blob + offs[tag], tlen) == 0) {
              io_good[j] = 1;
              io_info[j] = i;
            } else {
              break;
            }
          }
          for (int j = tag + 1; j < n; j++) {
            if (offs[j + 1] - offs[j] == tlen &&
                memcmp(blob + offs[j], blob + offs[tag], tlen) == 0) {
              io_good[j] = 1;
              io_info[j] = i;
            } else {
              break;
            }
          }
        }
        if (good) {
          io_good[mate_idx] = 1;
          io_info[mate_idx] = i;
        }
      }
      if (has_barcode && !keep_missing_barcode && bc != -1) {
        if (++barcode_done[bc] >= barcode_total[bc])
          t4s_release_finished_barcode(h, bc, 1, contig_min_cov, 1);
      }
    }

    // NOTE: fires on EVERY iteration while the count rests at a 10000
    // multiple (reference main.cpp behavior), not just on the read that
    // reached it — repeat calls are no-ops but the call pattern matches.
    if (assembled_read_cnt > 0 && assembled_read_cnt % 10000 == 0 &&
        !has_barcode)
      t4s_update_all_consensus(h);

    prev_add_ret = add_ret;
    out_add_ret[i] = add_ret;

    if ((int)registry_for(h).seqs.size() > change_kmer_threshold &&
        index_kmer_length < 16 && !has_barcode) {
      change_kmer_threshold *= 4;
      index_kmer_length += 2;
      t4s_change_kmer_length(h, index_kmer_length);
      // The Python loop re-reads _sconf() per AddRead, which tracks the
      // new k's nomatch limit (seqset.change_kmer_length) — mirror it.
      C.nomatch_gap_limit = ms_nomatch_gap_limit(index_kmer_length);
    }
  }

  t4s_update_all_consensus(h);

  // Rescue pass (main.cpp:1897-1940).
  int rescue_cnt = first_read_len <= 200 ? (int)rescue_idx.size() : 0;
  for (int k = 0; k < rescue_cnt; k++) {
    int i = rescue_idx[k];
    const char* rd = blob + offs[i];
    int len = (int)(offs[i + 1] - offs[i]);
    double simthr = 0.9;
    int min_cnt = meta[6 * i + 2];
    if (min_cnt >= 20)
      simthr = 0.97;
    else if (min_cnt >= 2)
      simthr = 0.95;
    int o2[2];
    ms_add_read(h, rd, len, "", 0, 0, meta[6 * i], 1, repetitive != 0,
                simthr, C, o2);
    io_strand[i] = o2[1];
    if (o2[0] >= 0) out_assembled[n_assembled++] = i;
  }
  t4s_update_all_consensus(h);
  *out_final_kl = index_kmer_length;
  return n_assembled;
}

}  // extern "C"
