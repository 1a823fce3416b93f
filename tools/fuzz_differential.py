"""Randomized end-to-end differential harness vs the reference binaries.

Generates random corpora and runs both pipelines, comparing stage
artifacts byte-for-byte (reports sorted).  Usage:

    python tools/fuzz_differential.py <seed_lo> <seed_hi>

Requires reference binaries in /root/repo/.refbuild (build from
/root/reference with make).  This harness found 3 real divergences in
round 1 (see VALIDATION.md).
"""

import os, random, subprocess, sys
sys.path.insert(0, '/root/repo')
from trust4_tpu.io.fastx import read_fastx

REF = '/root/repo/.refbuild'
def gen_corpus(seed, outdir):
    random.seed(seed)
    vs, ds, js, cs = [], [], [], []
    for rec in read_fastx([f'{REF}/hg38_bcrtcr.fa']):
        s = ''.join(c if c in 'ACGT' else random.choice('ACGT') for c in rec.seq.upper())
        nm = rec.id
        if len(nm) > 3 and nm[3] == 'V': vs.append(s)
        elif len(nm) > 4 and nm[3] == 'D' and nm[4].isdigit(): ds.append(s)
        elif len(nm) > 3 and nm[3] == 'J': js.append(s)
        else: cs.append(s)
    mode = random.choices(['pe', 'se', 'repseq', 'long'], [0.35, 0.3, 0.2, 0.15])[0]
    paired = mode == 'pe'
    read_len = random.choice([400, 700, 1200]) if mode == 'long' else random.choice([50, 75, 100, 125, 150])
    err = random.choice([0.0, 0.005, 0.02, 0.05])
    # Long mode needs corpora big and diverse enough to push
    # possible_overlap_cnt past the novel_min_hit adaptation buckets
    # (>100) — that regime exposed the reference's pre-scan group-skip
    # quirk (SeqSet.hpp:811); small fixed-length corpora never reach it.
    n_clones = random.randint(40, 160) if mode == 'long' else random.randint(3, 40)
    frag_len = read_len if mode == 'long' else read_len * 2 + random.randint(0, 120)
    r1 = open(f'{outdir}/r1.fq', 'w')
    r2 = open(f'{outdir}/r2.fq', 'w') if paired else None
    n = 0
    for clone in range(n_clones):
        v, j, c = random.choice(vs), random.choice(js), random.choice(cs)
        d = random.choice(ds) if ds and random.random() < 0.5 else ''
        ins1 = ''.join(random.choice('ACGT') for _ in range(random.randint(0, 8)))
        ins2 = ''.join(random.choice('ACGT') for _ in range(random.randint(0, 8)))
        full = v[:len(v)-random.randint(0,8)] + ins1 + d[2:12] + ins2 + j[random.randint(0,4):] + c[:200]
        depth = random.randint(2, 60)
        for _ in range(depth):
            if len(full) < frag_len + 5: break
            this_frag = frag_len
            if mode == 'long':  # variable long-read lengths
                this_frag = random.randint(max(210, frag_len // 2), frag_len)
            fs = random.randint(0, len(full) - this_frag)
            frag = full[fs:fs+this_frag]
            def mut(s):
                s = list(s)
                for i in range(len(s)):
                    if random.random() < err:
                        s[i] = random.choice('ACGTN')
                return ''.join(s)
            this_len = this_frag if mode == 'long' else read_len
            fwd = mut(frag[:this_len])
            q = ''.join(random.choice('BFHI5') for _ in range(this_len))
            r1.write(f"@fz{n}\n{fwd}\n+\n{q}\n")
            if paired:
                import re
                comp = {'A':'T','C':'G','G':'C','T':'A','N':'N'}
                mate = mut(frag[-read_len:])
                mate_rc = ''.join(comp[c] for c in reversed(mate))
                q2 = ''.join(random.choice('BFHI5') for _ in range(read_len))
                r2.write(f"@fz{n}\n{mate_rc}\n+\n{q2}\n")
            n += 1
    r1.close()
    if r2: r2.close()
    return paired, n, mode

def run_pair(seed):
    d = f'/tmp/fuzz/{seed}'
    os.makedirs(d, exist_ok=True)
    paired, n, mode = gen_corpus(seed, d)
    if n == 0:
        return seed, mode, 0, []  # empty corpus: both sides would just die
    args_common = ['-f', f'{REF}/hg38_bcrtcr.fa', '--ref', f'{REF}/human_IMGT+C.fa', '-t', '1']
    if mode == 'repseq':
        args_common.append('--repseq')
    if paired:
        io_ref = ['-1', f'{d}/r1.fq', '-2', f'{d}/r2.fq']
    else:
        io_ref = ['-u', f'{d}/r1.fq']
    rc1 = subprocess.run(['perl', f'{REF}/run-trust4'] + args_common + io_ref + ['-o', f'{d}/ref'],
                         capture_output=True, cwd=d)
    rc2 = subprocess.run([sys.executable, '-m', 'trust4_tpu', 'run'] + args_common + io_ref + ['-o', f'{d}/my'],
                         capture_output=True, cwd=d, env={**os.environ, 'PYTHONPATH': '/root/repo'})
    status = []
    if rc1.returncode != 0: return seed, paired, n, ['REF_FAIL']
    if rc2.returncode != 0: return seed, paired, n, ['MY_FAIL:' + rc2.stderr.decode()[-200:]]
    for f in ['_raw.out', '_final.out', '_cdr3.out', '_annot.fa']:
        a, b = f'{d}/my{f}', f'{d}/ref{f}'
        if not os.path.exists(a) or not os.path.exists(b):
            if os.path.exists(a) != os.path.exists(b): status.append(f + ':MISSING')
            continue
        if open(a,'rb').read() != open(b,'rb').read():
            status.append(f + ':DIFF')
    # sorted reports
    for f in ['_report.tsv']:
        a, b = f'{d}/my{f}', f'{d}/ref{f}'
        if os.path.exists(a) and os.path.exists(b):
            if sorted(open(a).read().splitlines()) != sorted(open(b).read().splitlines()):
                status.append(f + ':DIFF')
    return seed, mode, n, status

import sys
lo, hi = int(sys.argv[1]), int(sys.argv[2])
bad = 0
for seed in range(lo, hi):
    s, tag, n, st = run_pair(seed)
    if st:
        bad += 1
        print(f"seed {s} {tag} n={n}: {st}", flush=True)
    else:
        print(f"seed {s} {tag} n={n}: OK", flush=True)
print("MISMATCHED CORPORA:", bad)
