"""Minimal BAM writer for differential testing (tools/make_bam_corpus.py): synthesizes a bulk-style
BAM (mapped receptor fragments on one fake chromosome + unmapped pairs)
with proper BGZF framing, readable by both samtools-based tools and our
reader."""
import random, struct, sys, zlib
sys.path.insert(0, '/root/repo')

def bgzf_block(data):
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    bsize = len(comp) + 25 + 1
    hdr = struct.pack('<BBBBIBBHBBHH', 31, 139, 8, 4, 0, 0, 255, 6, 66, 67, 2, bsize - 1)
    return hdr + comp + struct.pack('<II', zlib.crc32(data) & 0xffffffff, len(data))

EOF_MARKER = bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000")
SEQ_ENC = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}

def bam_record(name, flag, refid, pos, mapq, cigar_ops, seq, qual, mrefid, mpos, tlen, tags=b""):
    nm = name.encode() + b"\x00"
    ncig = len(cigar_ops)
    cig = b"".join(struct.pack("<I", (ln << 4) | op) for ln, op in cigar_ops)
    ls = len(seq)
    sb = bytearray((ls + 1) // 2)
    for i, c in enumerate(seq):
        v = SEQ_ENC.get(c, 15)
        if i % 2 == 0: sb[i // 2] = v << 4
        else: sb[i // 2] |= v
    qb = bytes((min(93, ord(q) - 33)) for q in qual)
    body = struct.pack("<iiBBBHHHiiii", refid, pos, len(nm), mapq,
                       4680 % 65536 // 256, ncig, flag, 0, ls, mrefid, mpos, tlen)
    # bin field packed wrong above; rebuild properly:
    body = struct.pack("<ii", refid, pos)
    body += struct.pack("<BBBH", len(nm), mapq, 0, ncig)  # bin as 0 (readers ignore)
    # l_read_name(B) mapq(B) bin(H) n_cigar(H) flag(H) — actual layout:
    body = struct.pack("<iiBBHHHiiii", refid, pos, len(nm), mapq, 0, ncig,
                       flag, ls, mrefid, mpos, tlen)
    body += nm + cig + bytes(sb) + qb + tags
    return struct.pack("<i", len(body)) + body

def z_tag(tag, val):
    return tag.encode() + b"Z" + val.encode() + b"\x00"


def main():
    random.seed(31415)
    vs, js, cs = [], [], []
    cur_name, cur = None, []
    def flush():
        nonlocal cur_name, cur
        if cur_name is None: return
        s = ''.join(c if c in 'ACGT' else random.choice('ACGT') for c in ''.join(cur).upper())
        if len(cur_name) > 3 and cur_name[3] == 'V': vs.append(s)
        elif len(cur_name) > 3 and cur_name[3] == 'J': js.append(s)
        elif len(cur_name) <= 3 or cur_name[3] not in 'VDJ': cs.append(s)
    for line in open('/root/reference/hg38_bcrtcr.fa'):
        if line.startswith('>'): flush(); cur_name = line[1:].split()[0]; cur = []
        else: cur.append(line.strip())
    flush()
    clones = [random.choice(vs) + ''.join(random.choice('ACGT') for _ in range(random.randint(0,10))) + random.choice(js) + random.choice(cs)[:150] for _ in range(150)]
    comp = str.maketrans("ACGTN", "TGCAN")

    chroms = ["chr1", "chr10", "chr14", "chr15", "chr16", "chr18", "chr2", "chr21", "chr22", "chr7", "chr8", "chr9"]
    hdr_text = "@HD\tVN:1.6\n" + "".join(
        f"@SQ\tSN:{c}\tLN:100000000\n" for c in chroms)
    header = b"BAM\x01" + struct.pack("<i", len(hdr_text)) + hdr_text.encode()
    header += struct.pack("<i", len(chroms))
    for c in chroms:
        nm = c.encode() + b"\x00"
        header += struct.pack("<i", len(nm)) + nm + struct.pack("<i", 100000000)

    import sys as _s
    barcoded = "--barcoded" in _s.argv
    out = open('/tmp/bc20k.bam' if barcoded else '/tmp/bulk50k.bam', 'wb')
    out.write(bgzf_block(header))
    buf = b""
    n = 0
    L = 100
    cells = ["".join(random.choice("ACGT") for _ in range(16))
             for _ in range(200)]
    limit = 20000 if barcoded else 50000
    while n < limit:
        rid = f"bm{n}"
        is_receptor = random.random() < 0.25
        if is_receptor:
            full = random.choice(clones)
            frag_len = random.randint(L+20, min(300, len(full)))
            st = random.randint(0, len(full) - frag_len)
            frag = list(full[st:st+frag_len])
            for i in range(len(frag)):
                if random.random() < 0.005: frag[i] = random.choice('ACGT')
            frag = ''.join(frag)
        else:
            frag_len = random.randint(L+20, 300)
            frag = ''.join(random.choice('ACGT') for _ in range(frag_len))
        r1 = frag[:L]
        r2 = frag[-L:].translate(comp)[::-1]
        q = 'I' * L
        tags = b""
        if barcoded:
            cb = random.choice(cells)
            umi = "".join(random.choice("ACGT") for _ in range(10))
            tags = z_tag("CB", cb) + z_tag("UB", umi)
        if random.random() < 0.5 and not is_receptor:
            # proper mapped pair on the fake chromosome
            pos = random.randint(1000, 90000000)
            rec1 = bam_record(rid, 0x63, 0, pos, 60, [(L, 0)], r1, q, 0,
                              pos + frag_len - L, frag_len, tags)
            rec2 = bam_record(rid, 0x93, 0, pos + frag_len - L, 60, [(L, 0)],
                              r2.translate(comp)[::-1], q, 0, pos, -frag_len,
                              tags)
            # mate stored on forward strand per BAM convention with reverse flag:
            buf += rec1 + rec2
        else:
            # unmapped pair (adjacent)
            rec1 = bam_record(rid, 0x4D, -1, -1, 0, [], r1, q, -1, -1, 0,
                              tags)
            rec2 = bam_record(rid, 0x8D, -1, -1, 0, [], r2, q, -1, -1, 0,
                              tags)
            buf += rec1 + rec2
        n += 1
        if len(buf) > 50000:
            out.write(bgzf_block(buf)); buf = b""
    if buf: out.write(bgzf_block(buf))
    out.write(EOF_MARKER)
    out.close()
    print("wrote", limit, "pairs", "barcoded" if barcoded else "")

main()
