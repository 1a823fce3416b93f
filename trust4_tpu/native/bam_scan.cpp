// Native BAM scanner: BGZF inflate + batched record decode.
//
// Replaces the pure-Python hot loop of io/bam.py (itself a re-implementation
// of the reference's vendored samtools-0.1.19 / alignments.hpp access
// patterns) with a zlib-based reader that emits records in struct-of-arrays
// batches: fixed fields, CIGAR reference segments (alignments.hpp:181-249
// semantics), names, original-strand sequence/quality
// (alignments.hpp:489-541), and up to two Z-type aux tags (GetFieldZ,
// alignments.hpp:452-460).
//
// C ABI only; loaded via ctypes (trust4_tpu/io/bam_native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

namespace {

constexpr int BAM_CMATCH = 0;
constexpr int BAM_CINS = 1;
constexpr int BAM_CDEL = 2;
constexpr int BAM_CREF_SKIP = 3;
constexpr int BAM_CSOFT_CLIP = 4;
constexpr int BAM_CHARD_CLIP = 5;
constexpr int BAM_CPAD = 6;

const char SEQ_CODE[17] = "=ACMGRSVTWYHKDBN";

inline char comp(char c) {
  switch (c) {
    case 'A': return 'T';
    case 'C': return 'G';
    case 'G': return 'C';
    case 'T': return 'A';
    default: return 'N';
  }
}

// Streaming multi-member gzip (BGZF) inflater over a stdio file.
struct Bgzf {
  FILE *fp = nullptr;
  z_stream zs{};
  std::vector<uint8_t> in;
  size_t in_len = 0, in_off = 0;
  bool stream_open = false;
  bool eof = false;

  bool open(const char *path) {
    fp = fopen(path, "rb");
    if (!fp) return false;
    in.resize(1 << 20);
    return true;
  }

  void close() {
    if (stream_open) inflateEnd(&zs);
    stream_open = false;
    if (fp) fclose(fp);
    fp = nullptr;
  }

  bool fill_input() {
    if (in_off < in_len) return true;
    in_len = fread(in.data(), 1, in.size(), fp);
    in_off = 0;
    return in_len > 0;
  }

  // Read exactly n decompressed bytes into dst; returns bytes read
  // (short only at true EOF).
  size_t read(uint8_t *dst, size_t n) {
    size_t got = 0;
    while (got < n) {
      if (!stream_open) {
        if (!fill_input()) {
          eof = true;
          break;
        }
        memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, 15 + 32) != Z_OK) break;  // gzip wrapper
        stream_open = true;
      }
      if (in_off >= in_len && !fill_input()) {
        eof = true;
        break;
      }
      zs.next_in = in.data() + in_off;
      zs.avail_in = (uInt)(in_len - in_off);
      zs.next_out = dst + got;
      zs.avail_out = (uInt)(n - got);
      int rc = inflate(&zs, Z_NO_FLUSH);
      size_t consumed = (in_len - in_off) - zs.avail_in;
      in_off += consumed;
      got = n - zs.avail_out;
      if (rc == Z_STREAM_END) {
        inflateEnd(&zs);
        stream_open = false;
      } else if (rc != Z_OK && rc != Z_BUF_ERROR) {
        break;
      }
    }
    return got;
  }
};

struct BamScan {
  Bgzf gz;
  std::string path;
  std::string header_text;
  std::vector<std::string> ref_names;
  std::vector<int32_t> ref_lens;
  std::vector<uint8_t> rec_buf;
  bool has_pending = false;  // rec_buf holds an undecoded record that did
                             // not fit the previous batch's buffers
  char tag1[2] = {0, 0};
  char tag2[2] = {0, 0};

  bool read_header() {
    uint8_t magic[4];
    if (gz.read(magic, 4) != 4 || memcmp(magic, "BAM\x01", 4) != 0)
      return false;
    int32_t l_text;
    if (gz.read((uint8_t *)&l_text, 4) != 4) return false;
    header_text.resize(l_text);
    if (l_text && gz.read((uint8_t *)&header_text[0], l_text) != (size_t)l_text)
      return false;
    int32_t n_ref;
    if (gz.read((uint8_t *)&n_ref, 4) != 4) return false;
    for (int i = 0; i < n_ref; i++) {
      int32_t l_name;
      if (gz.read((uint8_t *)&l_name, 4) != 4) return false;
      std::string nm(l_name, '\0');
      if (gz.read((uint8_t *)&nm[0], l_name) != (size_t)l_name) return false;
      nm.resize(l_name - 1);  // strip trailing NUL
      int32_t l_ref;
      if (gz.read((uint8_t *)&l_ref, 4) != 4) return false;
      ref_names.push_back(std::move(nm));
      ref_lens.push_back(l_ref);
    }
    return true;
  }
};

// Find a Z-type aux value; returns (ptr, len) or nullptr.
const uint8_t *find_z(const uint8_t *data, size_t n, const char tag[2],
                      size_t *out_len) {
  size_t i = 0;
  while (i + 3 <= n) {
    const uint8_t *t = data + i;
    char typ = (char)data[i + 2];
    i += 3;
    size_t val_len;
    switch (typ) {
      case 'A': case 'c': case 'C': val_len = 1; break;
      case 's': case 'S': val_len = 2; break;
      case 'i': case 'I': case 'f': val_len = 4; break;
      case 'Z': case 'H': {
        size_t end = i;
        while (end < n && data[end] != 0) end++;
        if (t[0] == (uint8_t)tag[0] && t[1] == (uint8_t)tag[1]) {
          *out_len = end - i;
          return data + i;
        }
        i = end + 1;
        continue;
      }
      case 'B': {
        if (i + 5 > n) return nullptr;
        char sub = (char)data[i];
        int32_t cnt;
        memcpy(&cnt, data + i + 1, 4);
        size_t sl =
            (sub == 'c' || sub == 'C') ? 1 : (sub == 's' || sub == 'S') ? 2 : 4;
        val_len = 5 + (size_t)cnt * sl;
        break;
      }
      default:
        return nullptr;
    }
    i += val_len;
  }
  return nullptr;
}

}  // namespace

extern "C" {

void *t4bam_open(const char *path, const char *tag1, const char *tag2) {
  BamScan *B = new BamScan;
  B->path = path;
  if (tag1 && tag1[0]) memcpy(B->tag1, tag1, 2);
  if (tag2 && tag2[0]) memcpy(B->tag2, tag2, 2);
  if (!B->gz.open(path) || !B->read_header()) {
    B->gz.close();
    delete B;
    return nullptr;
  }
  return B;
}

void t4bam_close(void *h) {
  BamScan *B = (BamScan *)h;
  B->gz.close();
  delete B;
}

int t4bam_n_refs(void *h) { return (int)((BamScan *)h)->ref_names.size(); }

int t4bam_ref_name(void *h, int i, char *buf, int cap) {
  const std::string &s = ((BamScan *)h)->ref_names[i];
  int n = (int)s.size();
  if (n >= cap) n = cap - 1;
  memcpy(buf, s.data(), n);
  buf[n] = 0;
  return (int)s.size();
}

int t4bam_ref_len(void *h, int i) { return ((BamScan *)h)->ref_lens[i]; }

int t4bam_header_text(void *h, char *buf, int cap) {
  const std::string &s = ((BamScan *)h)->header_text;
  int n = (int)s.size();
  if (n > cap) n = cap;
  memcpy(buf, s.data(), n);
  return (int)s.size();
}

// Decode up to max_rec records.  Fixed per-record row of 12 int32:
// [flag, tid, pos, mapq, mtid, mpos, tlen, l_seq, name_off, name_len,
//  seg_off, n_seg]; seq/qual live at text_off (per record: seq then qual,
//  each l_seq bytes, already oriented to the original strand); names in the
//  name blob; segs as (start,end) int32 pairs; per-record aux rows of 4
//  int32 [bc_off, bc_len, umi_off, umi_len] into the name blob (-1 if
//  absent).  Returns number of records (0 at EOF, -1 when a blob would
//  overflow — caller retries with bigger buffers).
int t4bam_next_batch(void *h, int max_rec, int32_t *fixed, int32_t *aux_out,
                     int32_t *segs, int seg_cap, uint8_t *text, int64_t text_cap,
                     uint8_t *names, int64_t name_cap) {
  BamScan *B = (BamScan *)h;
  int n_rec = 0;
  int64_t text_off = 0, name_off = 0;
  int seg_off = 0;

  while (n_rec < max_rec) {
    if (!B->has_pending) {
      int32_t block_size;
      size_t got = B->gz.read((uint8_t *)&block_size, 4);
      if (got < 4) break;  // EOF
      B->rec_buf.resize(block_size);
      if (B->gz.read(B->rec_buf.data(), block_size) != (size_t)block_size)
        break;
    }
    B->has_pending = false;
    int32_t block_size = (int32_t)B->rec_buf.size();
    const uint8_t *d = B->rec_buf.data();
    int32_t tid, pos, mtid, mpos, tlen, l_seq;
    memcpy(&tid, d, 4);
    memcpy(&pos, d + 4, 4);
    uint8_t l_read_name = d[8];
    uint8_t mapq = d[9];
    uint16_t n_cigar, flag;
    memcpy(&n_cigar, d + 12, 2);
    memcpy(&flag, d + 14, 2);
    memcpy(&l_seq, d + 16, 4);
    memcpy(&mtid, d + 20, 4);
    memcpy(&mpos, d + 24, 4);
    memcpy(&tlen, d + 28, 4);

    size_t name_len = (size_t)l_read_name - 1;
    size_t seq_bytes = ((size_t)l_seq + 1) / 2;
    // Capacity checks (undo nothing; caller retries whole batch region).
    if (name_off + (int64_t)name_len + 256 > name_cap ||
        text_off + 2 * (int64_t)l_seq > text_cap ||
        seg_off + n_cigar + 1 > seg_cap) {
      // Batch buffers full: keep this record pending for the next call.
      B->has_pending = true;
      return n_rec > 0 ? n_rec : -1;
    }

    const uint8_t *p = d + 32;
    memcpy(names + name_off, p, name_len);
    p += l_read_name;

    // CIGAR -> reference segments (io/bam.py ref_segments semantics).
    int32_t *seg_base = segs + 2 * seg_off;
    int n_seg = 0;
    {
      int64_t start = pos, length = 0;
      for (int c = 0; c < n_cigar; c++) {
        uint32_t v;
        memcpy(&v, p + 4 * c, 4);
        int op = v & 0xF;
        uint32_t num = v >> 4;
        if (op == BAM_CREF_SKIP) {
          seg_base[2 * n_seg] = (int32_t)start;
          seg_base[2 * n_seg + 1] = (int32_t)(start + length - 1);
          n_seg++;
          start = start + length + num;
          length = 0;
        } else if (op == BAM_CINS || op == BAM_CSOFT_CLIP ||
                   op == BAM_CHARD_CLIP || op == BAM_CPAD) {
          // no reference advance
        } else {
          length += num;  // M, D and any other op advance the reference
        }
      }
      seg_base[2 * n_seg] = (int32_t)start;
      seg_base[2 * n_seg + 1] = (int32_t)(start + length - 1);
      n_seg++;
    }
    p += 4 * (size_t)n_cigar;

    // Sequence + quality, oriented back to the original strand.
    uint8_t *seq_dst = text + text_off;
    uint8_t *qual_dst = seq_dst + l_seq;
    bool rev = (flag & 0x10) != 0;
    for (int i = 0; i < l_seq; i++) {
      uint8_t byte = p[i >> 1];
      int code = (i % 2 == 0) ? (byte >> 4) : (byte & 0xF);
      char c = SEQ_CODE[code];
      if (c != 'A' && c != 'C' && c != 'G' && c != 'T') c = 'N';
      if (rev)
        seq_dst[l_seq - 1 - i] = (uint8_t)comp(c);
      else
        seq_dst[i] = (uint8_t)c;
    }
    p += seq_bytes;
    for (int i = 0; i < l_seq; i++) {
      uint8_t q = p[i] + 33;
      if (rev)
        qual_dst[l_seq - 1 - i] = q;
      else
        qual_dst[i] = q;
    }
    p += l_seq;

    // Aux tags into the name blob.
    int32_t *arow = aux_out + 4 * n_rec;
    arow[0] = arow[1] = arow[2] = arow[3] = -1;
    size_t aux_len = (size_t)(d + block_size - p);
    for (int t = 0; t < 2; t++) {
      const char *tag = t == 0 ? B->tag1 : B->tag2;
      if (!tag[0]) continue;
      size_t vlen = 0;
      const uint8_t *v = find_z(p, aux_len, tag, &vlen);
      if (v != nullptr && name_off + (int64_t)name_len + (int64_t)vlen
              <= name_cap) {
        memcpy(names + name_off + name_len, v, vlen);
        arow[2 * t] = (int32_t)(name_off + name_len);
        arow[2 * t + 1] = (int32_t)vlen;
        name_len += vlen;
      }
    }

    int32_t *row = fixed + 12 * n_rec;
    row[0] = flag;
    row[1] = tid;
    row[2] = pos;
    row[3] = mapq;
    row[4] = mtid;
    row[5] = mpos;
    row[6] = tlen;
    row[7] = l_seq;
    row[8] = (int32_t)name_off;
    row[9] = (int32_t)((size_t)l_read_name - 1);
    row[10] = seg_off;
    row[11] = n_seg;

    // advance blob cursors
    name_off += name_len;
    text_off += 2 * (int64_t)l_seq;
    seg_off += n_seg;
    n_rec++;
  }
  return n_rec;
}


}  // extern "C"

// ---- Full two-pass BAM extraction in native code ------------------------
//
// Port of pipeline/bam_extract.py run_bam_extractor (itself the exact
// semantics of the reference BamExtractor.cpp single-thread path): pass 1
// classifies records (unmapped templates with adjacent-mate pairing,
// alternative-chromosome placements, receptor-interval overlaps via the
// monotone two-pointer gene sweep) and collects candidate names; pass 2
// re-reads the BAM and emits both mates of every candidate.  The candidate
// test reuses the native HasHitInSet filter (extract_filter.cpp, linked
// into this library).

extern "C" int t4x_has_hit(void *h, const char *read, int len);
extern "C" int t4x_is_low_complexity(const char *s, int n);

namespace {

struct PairEntry {
  std::string seq1, seq2, qual1, qual2;
  bool has1 = false, has2 = false;
};

struct Rec {
  int32_t flag, tid, pos, mtid, mpos, l_seq;
  std::string name, seq, qual, bc, umi;
  bool has_bc = false, has_umi = false;
  int64_t seg_start = 0, seg_end = 0;

  bool is_template_aligned() const {
    if ((flag & 0xD) == 0xD || (flag & 0x5) == 0x4 || tid < 0) return false;
    return true;
  }
  bool is_aligned() const { return !(flag & 0x4) && tid >= 0; }
  bool is_primary() const { return (flag & 0x900) == 0; }
  bool is_first_mate() const { return (flag & 0x40) != 0; }
};

// Decode one raw record (same layout handling as t4bam_next_batch).
bool decode_rec(BamScan *B, Rec &r) {
  if (!B->has_pending) {
    int32_t block_size;
    if (B->gz.read((uint8_t *)&block_size, 4) < 4) return false;
    B->rec_buf.resize(block_size);
    if (B->gz.read(B->rec_buf.data(), block_size) != (size_t)block_size)
      return false;
  }
  B->has_pending = false;
  const uint8_t *d = B->rec_buf.data();
  int32_t block_size = (int32_t)B->rec_buf.size();
  memcpy(&r.tid, d, 4);
  memcpy(&r.pos, d + 4, 4);
  uint8_t l_read_name = d[8];
  uint16_t n_cigar, flag;
  memcpy(&n_cigar, d + 12, 2);
  memcpy(&flag, d + 14, 2);
  r.flag = flag;
  memcpy(&r.l_seq, d + 16, 4);
  memcpy(&r.mtid, d + 20, 4);
  memcpy(&r.mpos, d + 24, 4);
  const uint8_t *p = d + 32;
  r.name.assign((const char *)p, (size_t)l_read_name - 1);
  p += l_read_name;

  // CIGAR -> first segment start / last segment end.
  {
    int64_t start = r.pos, length = 0;
    r.seg_start = r.pos;
    for (int c = 0; c < n_cigar; c++) {
      uint32_t v;
      memcpy(&v, p + 4 * c, 4);
      int op = v & 0xF;
      uint32_t num = v >> 4;
      if (op == BAM_CREF_SKIP) {
        start = start + length + num;
        length = 0;
      } else if (op == BAM_CINS || op == BAM_CSOFT_CLIP ||
                 op == BAM_CHARD_CLIP || op == BAM_CPAD) {
      } else {
        length += num;
      }
    }
    r.seg_end = start + length - 1;
  }
  p += 4 * (size_t)n_cigar;

  bool rev = (r.flag & 0x10) != 0;
  r.seq.resize(r.l_seq);
  for (int i = 0; i < r.l_seq; i++) {
    uint8_t byte = p[i >> 1];
    int code = (i % 2 == 0) ? (byte >> 4) : (byte & 0xF);
    char c = SEQ_CODE[code];
    if (c != 'A' && c != 'C' && c != 'G' && c != 'T') c = 'N';
    if (rev)
      r.seq[r.l_seq - 1 - i] = comp(c);
    else
      r.seq[i] = c;
  }
  p += ((size_t)r.l_seq + 1) / 2;
  r.qual.resize(r.l_seq);
  for (int i = 0; i < r.l_seq; i++) {
    char q = (char)(p[i] + 33);
    if (rev)
      r.qual[r.l_seq - 1 - i] = q;
    else
      r.qual[i] = q;
  }
  p += r.l_seq;

  size_t aux_len = (size_t)(d + block_size - p);
  r.has_bc = r.has_umi = false;
  if (B->tag1[0]) {
    size_t vlen = 0;
    const uint8_t *v = find_z(p, aux_len, B->tag1, &vlen);
    if (v) {
      r.bc.assign((const char *)v, vlen);
      r.has_bc = true;
    }
  }
  if (B->tag2[0]) {
    size_t vlen = 0;
    const uint8_t *v = find_z(p, aux_len, B->tag2, &vlen);
    if (v) {
      r.umi.assign((const char *)v, vlen);
      r.has_umi = true;
    }
  }
  return true;
}

std::string trim_name(const std::string &name, int trim_len) {
  if (trim_len == -1) {
    size_t n = name.size();
    if (n >= 2 && (name[n - 1] == '1' || name[n - 1] == '2') &&
        name[n - 2] == '/')
      return name.substr(0, n - 2);
    return name;
  }
  return name.substr(0, name.size() - trim_len);
}

void output_seq(FILE *fp, const std::string &name, const std::string &seq,
                const std::string &qual) {
  fprintf(fp, "@%s\n%s\n+\n%s\n", name.c_str(), seq.c_str(), qual.c_str());
}

void output_barcode(FILE *fp, const std::string &name, const std::string &bc,
                    bool has) {
  if (has && !bc.empty())
    fprintf(fp, ">%s\n%s\n", name.c_str(), bc.c_str());
  else
    fprintf(fp, ">%s\nmissing_barcode\n", name.c_str());
}

bool valid_alt_chrom(const std::string &s) {
  return s.find('_') != std::string::npos || s.find('.') != std::string::npos;
}

}  // namespace

extern "C" {

// genes: (chr_id, start, end) triplets sorted ascending.  Returns 0 on
// success, -1 on the unmapped-pair ordering error (caller raises).
int t4bam_extract(const char *bam_path, void *filter, const int64_t *genes,
                  int n_genes, int paired, int abnormal_unmapped,
                  int mate_id_len, const char *out1, const char *out2,
                  const char *out_bc, const char *out_umi, const char *bc_tag,
                  const char *umi_tag) {
  BamScan *B = (BamScan *)t4bam_open(bam_path, bc_tag, umi_tag);
  if (!B) return -2;

  FILE *fp1 = fopen(out1, "w");
  FILE *fp2 = (paired && out2 && out2[0]) ? fopen(out2, "w") : nullptr;
  FILE *fpb = (out_bc && out_bc[0]) ? fopen(out_bc, "w") : nullptr;
  FILE *fpu = (out_umi && out_umi[0]) ? fopen(out_umi, "w") : nullptr;

  std::unordered_map<std::string, PairEntry> candidates;
  std::unordered_map<std::string, int> used_name;

  auto good = [&](const std::string &s) {
    return !t4x_is_low_complexity(s.c_str(), (int)s.size()) &&
           t4x_has_hit(filter, s.c_str(), (int)s.size()) != 0;
  };

  int rc_status = 0;
  int tag = 0;
  Rec rec, rec2;
  while (decode_rec(B, rec)) {
    bool alt = rec.is_aligned() && rec.tid < (int)B->ref_names.size() &&
               valid_alt_chrom(B->ref_names[rec.tid]);
    if (!rec.is_template_aligned() || alt) {
      if (!rec.is_template_aligned() && paired && !abnormal_unmapped) {
        std::string name = trim_name(rec.name, mate_id_len);
        if (!decode_rec(B, rec2)) {
          rc_status = -1;
          break;
        }
        std::string mate_name = trim_name(rec2.name, mate_id_len);
        if (name != mate_name) {
          rc_status = -1;
          break;
        }
        bool lc1 = t4x_is_low_complexity(rec.seq.c_str(), (int)rec.seq.size());
        bool lc2 =
            t4x_is_low_complexity(rec2.seq.c_str(), (int)rec2.seq.size());
        if (!lc1 && !lc2 &&
            (t4x_has_hit(filter, rec2.seq.c_str(), (int)rec2.seq.size()) != 0 ||
             t4x_has_hit(filter, rec.seq.c_str(), (int)rec.seq.size()) != 0)) {
          if (!rec2.is_first_mate()) {
            output_seq(fp1, name, rec.seq, rec.qual);
            output_seq(fp2, name, rec2.seq, rec2.qual);
          } else {
            output_seq(fp1, name, rec2.seq, rec2.qual);
            output_seq(fp2, name, rec.seq, rec.qual);
          }
          if (fpb) output_barcode(fpb, name, rec2.bc, rec2.has_bc);
          if (fpu) output_barcode(fpu, name, rec2.umi, rec2.has_umi);
        }
        continue;
      }

      if (paired) {
        if (good(rec.seq)) {
          std::string name = trim_name(rec.name, mate_id_len);
          candidates.emplace(name, PairEntry{});
        }
      } else {
        if (rec.is_aligned() && used_name.count(rec.name)) continue;
        if (good(rec.seq)) {
          if (rec.is_aligned()) used_name[rec.name] = 1;
          output_seq(fp1, rec.name, rec.seq, rec.qual);
          if (fpb) output_barcode(fpb, rec.name, rec.bc, rec.has_bc);
          if (fpu) output_barcode(fpu, rec.name, rec.umi, rec.has_umi);
        }
      }
      continue;
    }

    if (!rec.is_aligned()) continue;

    int64_t chr_id = rec.tid;
    int64_t start = rec.seg_start;
    int64_t end = rec.seg_end;
    while (tag < n_genes &&
           (chr_id > genes[3 * tag] ||
            (chr_id == genes[3 * tag] && start > genes[3 * tag + 2])))
      tag++;
    if (tag >= n_genes) continue;
    if (chr_id < genes[3 * tag] ||
        (chr_id == genes[3 * tag] && end <= genes[3 * tag + 1]))
      continue;

    if (t4x_is_low_complexity(rec.seq.c_str(), (int)rec.seq.size())) continue;

    if (paired) {
      std::string name = trim_name(rec.name, mate_id_len);
      candidates.emplace(name, PairEntry{});
    } else {
      if (used_name.count(rec.name)) continue;
      used_name[rec.name] = 1;
      output_seq(fp1, rec.name, rec.seq, rec.qual);
      if (fpb) output_barcode(fpb, rec.name, rec.bc, rec.has_bc);
      if (fpu) output_barcode(fpu, rec.name, rec.umi, rec.has_umi);
    }
  }

  if (rc_status == 0 && paired) {
    // Pass 2: collect both mates of every candidate name.
    t4bam_close(B);
    B = (BamScan *)t4bam_open(bam_path, bc_tag, umi_tag);
    size_t candidate_cnt = candidates.size();
    size_t output_cnt = 0;
    while (decode_rec(B, rec)) {
      if (!rec.is_primary()) continue;
      if (!rec.is_template_aligned() && !abnormal_unmapped) continue;
      std::string name = trim_name(rec.name, mate_id_len);
      auto it = candidates.find(name);
      if (it == candidates.end()) continue;
      PairEntry &e = it->second;
      if (rec.is_first_mate()) {
        e.seq1 = rec.seq;
        e.qual1 = rec.qual;
        e.has1 = true;
      } else {
        e.seq2 = rec.seq;
        e.qual2 = rec.qual;
        e.has2 = true;
      }
      if (e.has1 && e.has2) {
        output_seq(fp1, name, e.seq1, e.qual1);
        output_seq(fp2, name, e.seq2, e.qual2);
        if (fpb) output_barcode(fpb, name, rec.bc, rec.has_bc);
        if (fpu) output_barcode(fpu, name, rec.umi, rec.has_umi);
        e.has1 = e.has2 = false;
        output_cnt++;
        if (output_cnt == candidate_cnt) break;
      }
    }
  }

  fclose(fp1);
  if (fp2) fclose(fp2);
  if (fpb) fclose(fpb);
  if (fpu) fclose(fpu);
  t4bam_close(B);
  return rc_status;
}

}  // extern "C"
