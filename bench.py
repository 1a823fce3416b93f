#!/usr/bin/env python
"""Benchmark: TPU candidate-read prefilter throughput (extraction hot path).

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference fastq-extractor (single thread, same germline DB,
100k x 100bp reads) measures ~29,000 reads/s on this host (fastq-extractor
-f hg38_bcrtcr.fa -u reads.fq -t 1; FastqExtractor.cpp candidate scan).
"""

import json
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 29_000.0
K = 9
READ_LEN = 100
N_READS = 200_000
BATCH = 16_384


def main() -> None:
    import jax
    import jax.numpy as jnp

    from trust4_tpu.io.fastx import read_fastx
    from trust4_tpu.ops.encode import window_codes_batch
    from trust4_tpu.ops.prefilter import build_membership_tables, prefilter_kernel

    rng = np.random.default_rng(12345)

    refs = []
    for rec in read_fastx("/root/reference/hg38_bcrtcr.fa"):
        s = "".join(
            c if c in "ACGTN" else "N" for c in rec.seq.upper().replace(".", "")
        )
        refs.append(s)
    fwd, rc = build_membership_tables(refs, K)
    fwd_d = jnp.asarray(fwd)
    rc_d = jnp.asarray(rc)

    # Synthetic read set: 95% random background, 5% receptor-derived.
    base_mat = rng.integers(0, 4, size=(N_READS, READ_LEN), dtype=np.int64)
    cat = "".join(refs)
    cat_codes = np.frombuffer(cat.encode(), dtype=np.uint8)
    from trust4_tpu.dna import NUC2NUM_256

    cat_base = np.where(NUC2NUM_256[cat_codes] < 0, 0, NUC2NUM_256[cat_codes])
    n_rec = N_READS // 20
    starts = rng.integers(0, len(cat) - READ_LEN, size=n_rec)
    for j, st in enumerate(starts):
        base_mat[j] = cat_base[st : st + READ_LEN]

    ascii_mat = np.frombuffer(
        np.array([ord(c) for c in "ACGT"], dtype=np.uint8)[base_mat].tobytes(),
        dtype=np.uint8,
    ).reshape(N_READS, READ_LEN)

    t_enc0 = time.perf_counter()
    codes, valid = window_codes_batch(ascii_mat, K)
    t_enc = time.perf_counter() - t_enc0

    codes_d = jnp.asarray(codes)
    valid_d = jnp.asarray(valid)

    # Warm up (compile).
    batches = [
        (codes_d[i : i + BATCH], valid_d[i : i + BATCH])
        for i in range(0, N_READS, BATCH)
        if i + BATCH <= N_READS
    ]
    out = prefilter_kernel(batches[0][0], batches[0][1], fwd_d, rc_d, K, 27)
    out.block_until_ready()

    t0 = time.perf_counter()
    outs = []
    for cb, vb in batches:
        outs.append(prefilter_kernel(cb, vb, fwd_d, rc_d, K, 27))
    for o in outs:
        o.block_until_ready()
    t_dev = time.perf_counter() - t0

    n_done = len(batches) * BATCH
    # End-to-end rate including host encoding (amortized over full set).
    total_time = t_dev + t_enc * (n_done / N_READS)
    rate = n_done / total_time
    print(
        json.dumps(
            {
                "metric": "candidate_filter_reads_per_sec",
                "value": round(rate, 1),
                "unit": "reads/s",
                "vs_baseline": round(rate / BASELINE_READS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
