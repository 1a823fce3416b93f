"""Device gap-fill oracle: the Pallas DP + traceback decode in stage 2.

The dirs kernel emits per-cell traceback-decision bits
(ops/dp_pallas.banded_affine_dirs_pallas) and the on-device DFA walker
(decode_dirs_counts) turns them into (match, mismatch, indel) counts that
must be bit-identical to the CPU DP's edit scripts
(reference: AlignAlgo.hpp:174-203 traceback order).  The e2e check runs
the shipping annotator with the device path forced on and check mode
asserting every gap count against the CPU DP.

On CPU the Pallas kernel runs in the (slow) interpreter, so the random
parity test shrinks and the pipeline e2e only runs on a real backend.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from trust4_tpu.align import native as align_native
from trust4_tpu.ops.dp_batch import encode_for_dp
from trust4_tpu.ops.dp_pallas import (
    banded_affine_dirs_pallas,
    decode_dirs_counts,
)

_ON_DEVICE = jax.default_backend() in ("tpu", "axon")

DATA = os.path.join(os.path.dirname(__file__), "data")


def _rand_pairs(rng, n, lo=0, hi=60):
    """Random pairs incl. zero-length sides, N's, and indel-heavy cases."""
    pairs = []
    for _ in range(n):
        lt = int(rng.integers(lo, hi))
        lp = int(np.clip(lt + rng.integers(-8, 9), 0, hi))
        t = "".join(rng.choice(list("ACGTN"), lt, p=[0.24] * 4 + [0.04]))
        p = "".join(rng.choice(list("ACGTN"), lp, p=[0.24] * 4 + [0.04]))
        if lt and lp and rng.random() < 0.6:  # mostly-similar case
            p_list = list(t[:lp].ljust(lp, "A"))
            for _ in range(int(rng.integers(0, 6))):
                p_list[int(rng.integers(0, lp))] = rng.choice(list("ACGTN"))
            p = "".join(p_list)
        pairs.append((t, p))
    pairs += [("", ""), ("ACGT", ""), ("", "ACGT"), ("A", "A")]
    return pairs


def test_dirs_decode_matches_cpu_counts():
    rng = np.random.default_rng(11)
    pairs = _rand_pairs(rng, 256 if _ON_DEVICE else 12,
                        hi=100 if _ON_DEVICE else 24)
    W = 32
    tmax = max(max(len(t) for t, _ in pairs), 2)
    pmax = max(max(len(p) for _, p in pairs), 2)
    cap = max(tmax, pmax)
    tc, tl = encode_for_dp([t for t, _ in pairs], cap)
    pc, pl_ = encode_for_dp([p for _, p in pairs], cap)
    # band must cover every pair (tier logic guarantees this in shipping)
    keep = np.abs(tl - pl_) + 11 <= W
    tc, tl, pc, pl_ = tc[keep], tl[keep], pc[keep], pl_[keep]
    kept_pairs = [pr for pr, k in zip(pairs, keep) if k]
    _scores, dirs = banded_affine_dirs_pallas(tc, tl, pc, pl_, W)
    counts = np.asarray(
        decode_dirs_counts(dirs, tc, tl, pc, pl_, w=W, p_max=cap)
    )
    for i, (t, p) in enumerate(kept_pairs):
        want = align_native.global_alignment_counts(t, p)
        got = tuple(int(v) for v in counts[i])
        assert got == want, (i, t, p, got, want)


@pytest.mark.skipif(not _ON_DEVICE, reason="interpret mode too slow at "
                    "tier chunk shapes")
def test_gap_oracle_in_pipeline_example(tmp_path):
    """Full driver on the bundled example with the device path forced on
    and check mode verifying every device gap count against the CPU DP;
    outputs must equal the committed goldens."""
    prefix = str(tmp_path / "ex")
    env = dict(os.environ)
    env["TRUST4_TPU_DEVICE"] = "1"
    env["TRUST4_TPU_DEVICE_CHECK"] = "1"
    # The tunnel handshake is weather (24-200s healthy, unbounded when
    # wedged); bound the forced-mode wait so a wedged-tunnel day degrades
    # this test to the CPU path (outputs still golden) instead of
    # timing out the suite.
    env["TRUST4_TPU_DEVICE_READY_TIMEOUT_S"] = "240"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    example = "/root/reference/example"
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from trust4_tpu.pipeline.run import run_trust4\n"
        "run_trust4(%r, %r, read1_files=[%r], read2_files=[%r],\n"
        "           output_prefix=%r)\n"
        % (
            repo,
            "/root/reference/hg38_bcrtcr.fa",
            "/root/reference/human_IMGT+C.fa",
            os.path.join(example, "example_1.fq"),
            os.path.join(example, "example_2.fq"),
            prefix,
        )
    )
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=900)
    for suffix, golden in (
        ("_annot.fa", "gold_annot.fa"),
        ("_cdr3.out", "gold_cdr3.out"),
    ):
        with open(prefix + suffix) as f_got, open(
            os.path.join(DATA, golden)
        ) as f_want:
            assert f_got.read() == f_want.read(), suffix


def test_gap_counts_dedup_scatter(monkeypatch):
    """The pre-transfer content dedup (gap_oracle.gap_counts_on_device)
    must scatter unique-row results back bit-exactly.  Device mocked: the
    tier function computes counts on CPU from the code rows, so the test
    validates the dedup/scatter plumbing itself."""
    from trust4_tpu.ops import gap_oracle

    rng = np.random.default_rng(7)
    # Read/seq universe with heavy duplication (same segments repeat).
    seqs_str = ["".join(rng.choice(list("ACGT"), 60)) for _ in range(3)]
    reads = ["".join(rng.choice(list("ACGT"), 50)) for _ in range(4)]

    class _SW:  # minimal SeqWrapper stand-in
        def __init__(self, s):
            self.consensus = s

    seqs = [_SW(s) for s in seqs_str]
    jobs = []
    for _ in range(300):  # many duplicates by construction
        q = int(rng.integers(0, len(reads)))
        sidx = int(rng.integers(0, len(seqs)))
        t_from = int(rng.integers(0, 10)) * 5
        t_len = int(rng.integers(1, 13))
        r_from = int(rng.integers(0, 8)) * 5
        r_len = int(rng.integers(1, 11))
        jobs.append((q, 0, 0, sidx, t_from, min(t_len, 60 - t_from),
                     r_from, min(r_len, 50 - r_from)))
    gap_jobs = np.array(jobs, dtype=np.int32)

    code_of = {c: i for i, c in enumerate("ACGT")}

    class _FakeNat:
        def emit_gap_codes(self, query_jobs, sub_jobs, width):
            n = len(sub_jobs)
            out_t = np.full((n, width), 5, dtype=np.int8)
            out_p = np.full((n, width), 5, dtype=np.int8)
            for j, row in enumerate(sub_jobs):
                q, _ov, _go, sidx, t_from, t_len, r_from, r_len = (
                    int(v) for v in row
                )
                t = seqs_str[sidx][t_from : t_from + t_len][:width]
                p = reads[q][r_from : r_from + r_len][:width]
                for i, c in enumerate(t):
                    out_t[j, i] = code_of[c]
                for i, c in enumerate(p):
                    out_p[j, i] = code_of[c]
            return out_t, out_p

        def dedup_gap_jobs(self, query_jobs, sub_jobs, width, n_threads):
            # Reference dedup: group by exact (t codes, p codes, lens) —
            # the same key the native t4o_dedup_gap_jobs hashes.
            t, p = self.emit_gap_codes(query_jobs, sub_jobs, width)
            seen = {}
            uniq = []
            inverse = np.empty(len(sub_jobs), dtype=np.int32)
            for j, row in enumerate(sub_jobs):
                tl = min(int(row[5]), width)
                pl = min(int(row[7]), width)
                key = (t[j].tobytes(), p[j].tobytes(), tl, pl)
                if key not in seen:
                    seen[key] = len(uniq)
                    uniq.append(j)
                inverse[j] = seen[key]
            return np.asarray(uniq, dtype=np.int32), inverse

    def _cpu_tier_counts(tc, tcl, pc, pcl, w, p_max):
        m = len(tc)
        out = np.zeros((m, 3), dtype=np.int32)
        for j in range(m):
            t = "".join("ACGT"[v] for v in tc[j][: int(tcl[j])])
            p = "".join("ACGT"[v] for v in pc[j][: int(pcl[j])])
            out[j] = align_native.global_alignment_counts(t, p)
        return out

    def _cpu_launch_inproc(launches):
        out = []
        for tier, tc, pc, tl, pl in launches:
            s_cap, w_cap, _chunk = gap_oracle._TIERS[tier]
            out.append(_cpu_tier_counts(tc, tl, pc, pl, w_cap, s_cap))
        return out

    # In-process debug path: exercises the dedup/scatter plumbing
    # without the subprocess protocol (tests/test_gap_server.py covers
    # that layer).
    monkeypatch.setenv("TRUST4_TPU_GAP_INPROC", "1")
    monkeypatch.setattr(gap_oracle, "_launch_inproc", _cpu_launch_inproc)

    counts = gap_oracle.gap_counts_on_device(
        _FakeNat(), reads, gap_jobs, seqs
    )
    assert counts is not None
    for i, row in enumerate(gap_jobs):
        q, _ov, _go, sidx, t_from, t_len, r_from, r_len = (
            int(v) for v in row
        )
        want = align_native.global_alignment_counts(
            seqs_str[sidx][t_from : t_from + t_len],
            reads[q][r_from : r_from + r_len],
        )
        assert tuple(int(v) for v in counts[i]) == tuple(want), i


def _rand_job_universe(seed=11, n_jobs=2000):
    rng = np.random.default_rng(seed)
    alpha = list("ACGTN")
    seqs_str = ["".join(rng.choice(alpha, 80)) for _ in range(4)]
    reads = ["".join(rng.choice(alpha, 70)) for _ in range(5)]
    jobs = []
    for _ in range(n_jobs):
        q = int(rng.integers(0, len(reads)))
        sidx = int(rng.integers(0, len(seqs_str)))
        t_from = int(rng.integers(0, 8)) * 5
        t_len = min(int(rng.integers(1, 14)), 80 - t_from)
        rc = bool(rng.integers(0, 2))
        r_len = int(rng.integers(1, 12))
        if rc:
            r_from = int(rng.integers(r_len - 1, 70))
        else:
            r_from = int(rng.integers(0, 70 - r_len + 1))
        jobs.append((q, 0, 0, sidx | ((1 << 30) if rc else 0),
                     t_from, t_len, r_from, r_len))
    return seqs_str, reads, np.array(jobs, dtype=np.int32)


def test_native_gap_counts_cpu_matches_oracle():
    """t4o_gap_counts_cpu (the hybrid tier split's CPU half) must equal
    the Python _job_segments + global_alignment_counts oracle on a
    random universe including N's and rc (bit-30) jobs."""
    from trust4_tpu.engine import overlap_native as on
    from trust4_tpu.ops.gap_oracle import _job_segments

    if not on.available():
        pytest.skip("native engine unavailable")
    seqs_str, reads, gap_jobs = _rand_job_universe(seed=13, n_jobs=800)

    eng = on.NativeOverlapEngine(9)
    for i, s in enumerate(seqs_str):
        eng.reg_seq(i, True, -1, f"ref{i}", s, None, -1)

    class _SW:
        def __init__(self, s):
            self.consensus = s

    seqs = [_SW(s) for s in seqs_str]
    sel = np.arange(0, len(gap_jobs), 3, dtype=np.int64)  # strided subset
    got = eng.gap_counts_cpu(reads, gap_jobs, sel, n_threads=4)
    for k, j in enumerate(sel):
        t, p = _job_segments(reads, seqs, gap_jobs[j])
        want = align_native.global_alignment_counts(t, p)
        assert tuple(int(v) for v in got[k]) == tuple(want), int(j)


def test_hybrid_tier_split(monkeypatch):
    """Per-tier hybrid: with the gate engaging only tier >= 1, parked
    tier-0 jobs must be filled by the native CPU while the engaged
    tiers go through the (mocked) device client — full counts array
    bit-equal to the all-CPU oracle."""
    from trust4_tpu.engine import overlap_native as on
    from trust4_tpu.ops import gap_oracle
    from trust4_tpu.ops.gap_oracle import _job_segments

    if not on.available():
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(29)
    alpha = list("ACGTN")
    seqs_str = ["".join(rng.choice(alpha, 120)) for _ in range(4)]
    reads = ["".join(rng.choice(alpha, 100)) for _ in range(5)]
    jobs = []
    for _ in range(600):
        q = int(rng.integers(0, len(reads)))
        sidx = int(rng.integers(0, len(seqs_str)))
        t_from = int(rng.integers(0, 8)) * 5
        # Mix of tier-0 (<=16), tier-1 (<=48), and beyond-top-tier jobs.
        t_len = min(int(rng.choice([6, 12, 30, 44, 160])), 120 - t_from)
        r_len = max(1, t_len + int(rng.integers(-3, 4)))
        r_from = int(rng.integers(0, max(1, 100 - r_len + 1)))
        r_len = min(r_len, 100 - r_from)
        jobs.append((q, 0, 0, sidx, t_from, t_len, r_from, r_len))
    gap_jobs = np.array(jobs, dtype=np.int32)

    eng = on.NativeOverlapEngine(9)
    for i, s in enumerate(seqs_str):
        eng.reg_seq(i, True, -1, f"ref{i}", s, None, -1)

    class _SW:
        def __init__(self, s):
            self.consensus = s

    seqs = [_SW(s) for s in seqs_str]

    class _MockClient:
        ready = True
        warm_s = [0.001, 0.001, 0.001]
        launches_seen = []

        def submit_all(self, launches, timeout_s):
            self._pending = list(launches)
            _MockClient.launches_seen.extend(t for t, *_ in launches)
            return True

        def collect(self, n, timeout_s):
            out = []
            for tier, tc, pc, tl, pl in self._pending:
                m = len(tc)
                rows = np.zeros((m, 3), dtype=np.int32)
                num = "ACGTN?"
                for j in range(m):
                    t = "".join(num[v] for v in tc[j][: int(tl[j])])
                    p = "".join(num[v] for v in pc[j][: int(pl[j])])
                    rows[j] = align_native.global_alignment_counts(t, p)
                out.append(rows)
            return out

    def _fake_gate(nat, query_jobs, gj, tier_of, size, band, n_threads,
                   warm_s, prof):
        top_cap = gap_oracle._TIERS[-1][0]
        elig = np.nonzero(tier_of >= 0)[0]
        uniq, inv = nat.dedup_gap_jobs(
            query_jobs, np.ascontiguousarray(gj[elig]), top_cap, n_threads
        )
        sel = None if len(elig) == len(gj) else elig
        return [False, True, True], uniq, inv, sel

    monkeypatch.setattr(gap_oracle, "_client", _MockClient())
    monkeypatch.setattr(gap_oracle, "_gate_decision", _fake_gate)
    monkeypatch.setenv("TRUST4_TPU_DEVICE", "auto")

    counts = gap_oracle.gap_counts_on_device(
        eng, reads, gap_jobs, seqs, n_threads=2
    )
    assert counts is not None
    # Tier 0 was parked: no tier-0 launches may reach the client.
    assert 0 not in _MockClient.launches_seen
    assert len(_MockClient.launches_seen) > 0
    for i, row in enumerate(gap_jobs):
        t, p = _job_segments(reads, seqs, row)
        want = align_native.global_alignment_counts(t, p)
        assert tuple(int(v) for v in counts[i]) == tuple(want), i


def test_native_dedup_matches_python_oracle():
    """t4o_dedup_gap_jobs must group exactly the jobs whose device DP
    inputs (code rows + truncated lengths, rc-walked for bit-30 jobs)
    are identical — validated against a dict-based Python oracle on a
    duplicate-heavy random universe including N's and rc jobs."""
    from trust4_tpu.engine import overlap_native as on
    from trust4_tpu.dna import revcomp

    if not on.available():
        pytest.skip("native engine unavailable")

    rng = np.random.default_rng(11)
    alpha = list("ACGTN")
    seqs_str = ["".join(rng.choice(alpha, 80)) for _ in range(4)]
    reads = ["".join(rng.choice(alpha, 70)) for _ in range(5)]

    eng = on.NativeOverlapEngine(9)
    for i, s in enumerate(seqs_str):
        eng.reg_seq(i, True, -1, f"ref{i}", s, None, -1)

    jobs = []
    for _ in range(2000):
        q = int(rng.integers(0, len(reads)))
        sidx = int(rng.integers(0, len(seqs_str)))
        t_from = int(rng.integers(0, 8)) * 5
        t_len = min(int(rng.integers(1, 14)), 80 - t_from)
        rc = bool(rng.integers(0, 2))
        r_len = int(rng.integers(1, 12))
        if rc:
            r_from = int(rng.integers(r_len - 1, 70))
        else:
            r_from = int(rng.integers(0, 70 - r_len + 1))
        jobs.append((q, 0, 0, sidx | ((1 << 30) if rc else 0),
                     t_from, t_len, r_from, r_len))
    gap_jobs = np.array(jobs, dtype=np.int32)

    width = 16

    def key_of(row):
        q, _ov, _go, sidx, t_from, t_len, r_from, r_len = (
            int(v) for v in row
        )
        rc = bool(sidx & (1 << 30))
        sidx &= ~(1 << 30)
        tl, pl = min(t_len, width), min(r_len, width)
        t = seqs_str[sidx][t_from:t_from + tl]
        if rc:
            p = revcomp(reads[q][r_from - pl + 1:r_from + 1])
        else:
            p = reads[q][r_from:r_from + pl]
        # non-ACGTN and N NOT identified: codes N->4, other->5; here the
        # alphabet is ACGTN so the string itself is the code row.
        return (t, p, tl, pl)

    uniq, inverse = eng.dedup_gap_jobs(reads, gap_jobs, width, 4)

    # 1. Each job's representative has the same key.
    for j, row in enumerate(gap_jobs):
        rep = gap_jobs[uniq[inverse[j]]]
        assert key_of(row) == key_of(rep), j
    # 2. Unique count matches the oracle's distinct-key count.
    assert len(uniq) == len({key_of(r) for r in gap_jobs})


def test_collect_profitable_modes(monkeypatch):
    """Auto mode must decline the collect-oracle restructuring (the
    round-5 measured verdict: collect costs ~a full query pass to
    offload ~5% of one); forced/check/in-process modes keep it as the
    parity harness."""
    from trust4_tpu.ops import gap_oracle

    monkeypatch.delenv("TRUST4_TPU_DEVICE", raising=False)
    monkeypatch.delenv("TRUST4_TPU_DEVICE_CHECK", raising=False)
    monkeypatch.delenv("TRUST4_TPU_GAP_INPROC", raising=False)
    assert not gap_oracle.collect_profitable()
    monkeypatch.setenv("TRUST4_TPU_DEVICE", "1")
    assert gap_oracle.collect_profitable()
    monkeypatch.setenv("TRUST4_TPU_DEVICE", "auto")
    assert not gap_oracle.collect_profitable()
    monkeypatch.setenv("TRUST4_TPU_DEVICE_CHECK", "1")
    assert gap_oracle.collect_profitable()
    monkeypatch.delenv("TRUST4_TPU_DEVICE_CHECK")
    monkeypatch.setenv("TRUST4_TPU_GAP_INPROC", "1")
    assert gap_oracle.collect_profitable()
