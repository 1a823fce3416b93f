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
def gen(seed, outdir):
    random.seed(seed)
    vs, js, cs = [], [], []
    for rec in read_fastx([f'{REF}/hg38_bcrtcr.fa']):
        s = ''.join(c if c in 'ACGT' else random.choice('ACGT') for c in rec.seq.upper())
        nm = rec.id
        if len(nm) > 3 and nm[3] == 'V': vs.append(s)
        elif len(nm) > 3 and nm[3] == 'J': js.append(s)
        elif len(nm) <= 3 or not nm[3] in 'VDJ': cs.append(s)
    n_cells = random.randint(3, 25)
    read_len = random.choice([90, 100, 120])
    err = random.choice([0.0, 0.01])
    use_umi = random.random() < 0.5
    clones = []
    for _ in range(random.randint(2, 12)):
        v, j, c = random.choice(vs), random.choice(js), random.choice(cs)
        ins = ''.join(random.choice('ACGT') for _ in range(random.randint(0, 10)))
        clones.append(v + ins + j + c[:150])
    r1 = open(f'{outdir}/r1.fq', 'w'); bc = open(f'{outdir}/bc.fq', 'w')
    n = 0
    for cell in range(n_cells):
        cb = ''.join(random.choice('ACGT') for _ in range(16))
        my_clones = random.sample(clones, random.randint(1, min(3, len(clones))))
        for full in my_clones:
            for _ in range(random.randint(2, 25)):
                if len(full) <= read_len: continue
                st = random.randint(0, len(full)-read_len)
                rd = list(full[st:st+read_len])
                for i in range(len(rd)):
                    if random.random() < err: rd[i] = random.choice('ACGTN')
                # Include low-quality chars so the 3' trim + the
                # stale-sort-buffer stats quirk get exercised.
                q = ''.join(random.choice('FGHI#5B') for _ in range(read_len))
                r1.write(f"@bz{n}\n{''.join(rd)}\n+\n{q}\n")
                umi = ''.join(random.choice('ACGT') for _ in range(10))
                bc.write(f"@bz{n}\n{cb}{umi}\n+\n{'I'*26}\n")
                n += 1
    r1.close(); bc.close()
    return use_umi, n

bad = 0
for seed in range(int(sys.argv[1]), int(sys.argv[2])):
    d = f'/tmp/fuzzbc/{seed}'
    os.makedirs(d, exist_ok=True)
    use_umi, n = gen(seed, d)
    fmt = 'bc:0:15,um:16:25' if use_umi else 'bc:0:15'
    args = ['-f', f'{REF}/hg38_bcrtcr.fa', '--ref', f'{REF}/human_IMGT+C.fa', '-t', '1',
            '-u', f'{d}/r1.fq', '--barcode', f'{d}/bc.fq', '--readFormat', fmt]
    if use_umi:
        args += ['--UMI', f'{d}/bc.fq']
    if seed % 3 == 0:  # exercise the shallow-contig release + dropout
        args += ['--contigMinCov', str(random.choice([2, 4, 6]))]
    rc1 = subprocess.run(['perl', f'{REF}/run-trust4'] + args + ['-o', f'{d}/ref'], capture_output=True, cwd=d)
    rc2 = subprocess.run([sys.executable, '-m', 'trust4_tpu', 'run'] + args + ['-o', f'{d}/my'],
                         capture_output=True, cwd=d, env={**os.environ, 'PYTHONPATH': '/root/repo'})
    st = []
    if rc1.returncode != 0: st.append('REF_FAIL')
    elif rc2.returncode != 0: st.append('MY_FAIL:' + rc2.stderr.decode()[-200:])
    else:
        for f in ['_final.out', '_cdr3.out', '_annot.fa']:
            if open(f'{d}/my{f}','rb').read() != open(f'{d}/ref{f}','rb').read():
                st.append(f + ':DIFF')
        import re
        def _norm(path):
            # The reference's trust-barcoderep.pl picks the cross-cell
            # imputation SOURCE cell by Perl hash iteration order when
            # several tie (verified nondeterministic run-to-run on
            # identical inputs), and the copied abundance follows the
            # choice — blank both for the comparison.
            txt = open(path).read()
            txt = re.sub(r'[0-9.]+,impute_from_\S+?,', 'IMPUTED,', txt)
            return sorted(txt.splitlines())
        for f in ['_barcode_report.tsv', '_report.tsv']:
            if _norm(f'{d}/my{f}') != _norm(f'{d}/ref{f}'):
                st.append(f + ':DIFF')
    tag = 'UMI' if use_umi else 'BC'
    print(f"seed {seed} {tag} n={n}: {st if st else 'OK'}", flush=True)
    bad += bool(st)
print("MISMATCHED:", bad)
