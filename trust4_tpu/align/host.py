"""Exact host-side oracle for the banded-DP alignment family.

Every function here reproduces the corresponding reference kernel bit for bit
(reference: AlignAlgo.hpp:57-1177), including its tie-breaking order, band
sentinel handling, and two intentional quirks that affect numeric results:

* the affine initializers reuse the loop variable ``i`` after the row-0 loop,
  so ``e[0][j]`` is seeded with ``GAPOPEN + (lenp+1)*GAPOPEN`` for every j
  (reference: AlignAlgo.hpp:271, 473, 656);
* traceback preference is "last writer wins": DELETE is considered first,
  then INSERT, then the diagonal, so diagonal > insert > delete
  (reference: AlignAlgo.hpp:174-190).

Sequences are Python strings of uppercase A/C/G/T/N.  Position-weight
profiles are numpy ``(L, 4)`` int arrays (reference: struct _posWeight,
AlignAlgo.hpp:21-44).

Edit scripts are returned as Python lists of EDIT_* codes (no -1 sentinel;
the list length is the alignment length).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from trust4_tpu.dna import NUC_TO_NUM

EDIT_MATCH = 0
EDIT_MISMATCH = 1
EDIT_INSERT = 2
EDIT_DELETE = 3

SCORE_MATCH = 2
SCORE_MISMATCH = -2
SCORE_GAPOPEN = -4
SCORE_GAPEXTEND = -1
SCORE_INDEL = -4

SCORE_MATCH_LOCAL = 1
SCORE_MISMATCH_LOCAL = -2


def _is_base_equal(w_row, c: str) -> bool:
    """Profile-vs-base "equal" test (reference: AlignAlgo.hpp:49-55).

    True when the column is uncovered, the base is N, or the base holds a
    strict >1/3 majority of the column counts.  Note N indexes slot 0 via
    nucToNum, but the c=='N' check short-circuits first.
    """
    s = int(w_row[0]) + int(w_row[1]) + int(w_row[2]) + int(w_row[3])
    if s == 0 or c == "N":
        return True
    return s < 3 * int(w_row[NUC_TO_NUM[ord(c) - 65]])


def _chars_equal(a: str, b: str) -> bool:
    """String match rule: equal, or either side N (reference: AlignAlgo.hpp:227)."""
    return a == b or a == "N" or b == "N"


def global_alignment_posweight(
    t_weights: np.ndarray, p: str
) -> Tuple[int, List[int]]:
    """Banded global alignment with linear gaps, profile text vs string query.

    Reference: AlignAlgo.hpp:57-216 (GlobalAlignment_PosWeight).
    Returns (score, edit script).  The text is a (lent, 4) count profile.
    """
    lent = len(t_weights)
    lenp = len(p)
    if lent == 0 or lenp == 0:
        return 0, []
    if lent == 1 and lenp == 1:
        if _is_base_equal(t_weights[0], p[0]):
            return SCORE_MATCH, [EDIT_MATCH]
        return SCORE_MISMATCH, [EDIT_MISMATCH]

    base_eq = _posweight_eq_matrix(t_weights, p)

    if lent == lenp:
        # No-indel fast path (reference: AlignAlgo.hpp:81-103).
        diag = np.diagonal(base_eq)
        score = int(np.sum(np.where(diag, SCORE_MATCH, SCORE_MISMATCH)))
        if score >= lent * SCORE_MATCH + 2 * SCORE_INDEL:
            align = [EDIT_MATCH if diag[i] else EDIT_MISMATCH for i in range(lent)]
            return score, align

    left_band = 5
    right_band = 5
    if lent > lenp:
        right_band += lent - lenp
    elif lent < lenp:
        left_band += lenp - lent

    neg_inf = (lent + 1) * (lenp + 1) * SCORE_INDEL
    m = np.full((lenp + 1, lent + 1), neg_inf, dtype=np.int64)
    m[0, 0] = 0
    for i in range(1, lenp + 1):
        m[i, 0] = SCORE_INDEL + i * SCORE_INDEL
    for j in range(1, lent + 1):
        m[0, j] = SCORE_INDEL + j * SCORE_INDEL

    for i in range(1, lenp + 1):
        start = max(i - left_band, 1)
        end = min(i + right_band, lent)
        # Band sentinels (reference: AlignAlgo.hpp:136-145); rows outside the
        # band stay at neg_inf which matches the sentinel values exactly.
        row_eq = base_eq[i - 1]
        prev = m[i - 1]
        cur = m[i]
        for j in range(start, end + 1):
            score = prev[j - 1] + (SCORE_MATCH if row_eq[j - 1] else SCORE_MISMATCH)
            v = cur[j - 1] + SCORE_INDEL
            if v > score:
                score = v
            v = prev[j] + SCORE_INDEL
            if v > score:
                score = v
            cur[j] = score

    ret = int(m[lenp, lent])

    # Traceback (reference: AlignAlgo.hpp:168-211); last-writer-wins order.
    align: List[int] = []
    ti, tj = lenp, lent
    while ti > 0 or tj > 0:
        mx = m[ti, tj]
        a = 0
        if tj > 0 and m[ti, tj - 1] + SCORE_INDEL == mx:
            a = EDIT_DELETE
        if ti > 0 and m[ti - 1, tj] + SCORE_INDEL == mx:
            a = EDIT_INSERT
        if tj > 0 and ti > 0:
            diff = SCORE_MATCH if base_eq[ti - 1, tj - 1] else SCORE_MISMATCH
            if m[ti - 1, tj - 1] + diff == mx:
                a = EDIT_MATCH if diff == SCORE_MATCH else EDIT_MISMATCH
        align.append(a)
        if a == EDIT_DELETE:
            tj -= 1
        elif a == EDIT_INSERT:
            ti -= 1
        else:
            ti -= 1
            tj -= 1
    align.reverse()
    return ret, align


def _posweight_eq_matrix(t_weights: np.ndarray, p: str) -> np.ndarray:
    """(lenp, lent) bool matrix of IsBaseEqual(tWeights[j], p[i])."""
    w = np.asarray(t_weights, dtype=np.int64)
    sums = w.sum(axis=1)  # (lent,)
    pb = np.frombuffer(p.encode("ascii"), dtype=np.uint8)
    pidx = NUC_TO_NUM[pb - 65].astype(np.int64)  # N -> 0
    counts = w[:, pidx].T  # (lenp, lent)
    eq = sums[None, :] < 3 * counts
    eq |= sums[None, :] == 0
    eq |= (pb == ord("N"))[:, None]
    return eq


def _string_eq_matrix(t: str, p: str) -> np.ndarray:
    """(lenp, lent) bool matrix of the string match rule (N matches all)."""
    tb = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
    pb = np.frombuffer(p.encode("ascii"), dtype=np.uint8)
    eq = pb[:, None] == tb[None, :]
    eq |= (tb == ord("N"))[None, :]
    eq |= (pb == ord("N"))[:, None]
    return eq


def _affine_fill(
    eq: np.ndarray, lent: int, lenp: int, left_band, right_band
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared affine-gap DP fill (reference: AlignAlgo.hpp:254-314).

    ``left_band``/``right_band`` of None mean unbanded (GlobalAlignment_OneEnd).
    Returns (m, e, f) matrices of shape (lenp+1, lent+1).
    """
    neg_inf = (lent + 1) * (lenp + 1) * SCORE_GAPOPEN
    m = np.full((lenp + 1, lent + 1), neg_inf, dtype=np.int64)
    e = np.full((lenp + 1, lent + 1), neg_inf, dtype=np.int64)
    f = np.full((lenp + 1, lent + 1), neg_inf, dtype=np.int64)
    m[0, 0] = e[0, 0] = f[0, 0] = 0
    for i in range(1, lenp + 1):
        e[i, 0] = SCORE_GAPOPEN + i * SCORE_GAPEXTEND
        f[i, 0] = SCORE_GAPOPEN + i * SCORE_GAPOPEN
        m[i, 0] = SCORE_GAPOPEN + i * SCORE_GAPOPEN
    # Reference quirk: after the row loop the C++ loop variable i == lenp+1 and
    # is reused to seed e[0][j] for every column (AlignAlgo.hpp:271).
    stale_i = lenp + 1
    for j in range(1, lent + 1):
        f[0, j] = SCORE_GAPOPEN + j * SCORE_GAPEXTEND
        e[0, j] = SCORE_GAPOPEN + stale_i * SCORE_GAPOPEN
        m[0, j] = SCORE_GAPOPEN + j * SCORE_GAPOPEN

    go_ge = SCORE_GAPOPEN + SCORE_GAPEXTEND
    for i in range(1, lenp + 1):
        if left_band is None:
            start, end = 1, lent
        else:
            start = max(i - left_band, 1)
            end = min(i + right_band, lent)
        row_eq = eq[i - 1]
        mp, ep, fp = m[i - 1], e[i - 1], f[i - 1]
        mc, ec, fc = m[i], e[i], f[i]
        for j in range(start, end + 1):
            s = ep[j] + SCORE_GAPEXTEND
            v = mp[j] + go_ge
            ec[j] = v if v > s else s
            s = fc[j - 1] + SCORE_GAPEXTEND
            v = mc[j - 1] + go_ge
            fc[j] = v if v > s else s
            s = mp[j - 1] + (SCORE_MATCH if row_eq[j - 1] else SCORE_MISMATCH)
            if ec[j] > s:
                s = ec[j]
            if fc[j] > s:
                s = fc[j]
            mc[j] = s
    return m, e, f


def _affine_traceback(
    m: np.ndarray, e: np.ndarray, f: np.ndarray, eq: np.ndarray, ti: int, tj: int
) -> List[int]:
    """Three-matrix traceback (reference: AlignAlgo.hpp:325-418)."""
    align: List[int] = []
    mat = 0
    go_ge = SCORE_GAPOPEN + SCORE_GAPEXTEND
    while ti > 0 or tj > 0:
        if mat == 0:
            a = EDIT_INSERT
            if f[ti, tj] >= e[ti, tj]:
                a = EDIT_DELETE
            if ti > 0 and tj > 0:
                diff = SCORE_MATCH if eq[ti - 1, tj - 1] else SCORE_MISMATCH
                if m[ti - 1, tj - 1] + diff == m[ti, tj]:
                    a = EDIT_MATCH if diff == SCORE_MATCH else EDIT_MISMATCH
            if a in (EDIT_MATCH, EDIT_MISMATCH):
                align.append(a)
                ti -= 1
                tj -= 1
            elif a == EDIT_INSERT:
                mat = 1
            else:
                mat = 2
        elif mat == 1:
            align.append(EDIT_INSERT)
            if ti > 0:
                if m[ti - 1, tj] + go_ge == e[ti, tj]:
                    ti -= 1
                    mat = 0
                else:
                    ti -= 1
            else:
                mat = 2
        else:
            align.append(EDIT_DELETE)
            if tj > 0:
                if m[ti, tj - 1] + go_ge == f[ti, tj]:
                    tj -= 1
                    mat = 0
                else:
                    tj -= 1
            else:
                mat = 1
    align.reverse()
    return align


def global_alignment(t: str, p: str) -> Tuple[int, List[int]]:
    """Banded global alignment with affine gaps, string vs string.

    Reference: AlignAlgo.hpp:218-424 (GlobalAlignment).
    """
    lent, lenp = len(t), len(p)
    if lent == 0 or lenp == 0:
        return 0, []
    if lent == 1 and lenp == 1:
        if _chars_equal(t[0], p[0]):
            return SCORE_MATCH, [EDIT_MATCH]
        return SCORE_MISMATCH, [EDIT_MISMATCH]

    left_band = 5
    right_band = 5
    if lent > lenp:
        right_band += lent - lenp
    elif lent < lenp:
        left_band += lenp - lent

    eq = _string_eq_matrix(t, p)
    m, e, f = _affine_fill(eq, lent, lenp, left_band, right_band)
    ret = int(m[lenp, lent])
    align = _affine_traceback(m, e, f, eq, lenp, lent)
    return ret, align


def global_alignment_posweight_affine(
    t_weights: np.ndarray, p: str
) -> Tuple[int, List[int]]:
    """Affine-gap profile-vs-string alignment with fixed band 5.

    Reference: AlignAlgo.hpp:426-622 (GlobalAlignment_PosWeight_Affine).
    Note its traceback compares f against m (not e) when choosing DELETE.
    """
    lent = len(t_weights)
    lenp = len(p)
    if lent == 0 or lenp == 0:
        return 0, []
    if lent == 1 and lenp == 1:
        if _is_base_equal(t_weights[0], p[0]):
            return SCORE_MATCH, [EDIT_MATCH]
        return SCORE_MISMATCH, [EDIT_MISMATCH]

    eq = _posweight_eq_matrix(t_weights, p)
    m, e, f = _affine_fill(eq, lent, lenp, 5, 5)
    ret = int(m[lenp, lent])

    # Traceback with the f>=m quirk (reference: AlignAlgo.hpp:529-609).
    align: List[int] = []
    ti, tj = lenp, lent
    mat = 0
    go_ge = SCORE_GAPOPEN + SCORE_GAPEXTEND
    while ti > 0 or tj > 0:
        if mat == 0:
            a = EDIT_INSERT
            if f[ti, tj] >= m[ti, tj]:
                a = EDIT_DELETE
            if ti > 0 and tj > 0:
                diff = SCORE_MATCH if eq[ti - 1, tj - 1] else SCORE_MISMATCH
                if m[ti - 1, tj - 1] + diff == m[ti, tj]:
                    a = EDIT_MATCH if diff == SCORE_MATCH else EDIT_MISMATCH
            if a in (EDIT_MATCH, EDIT_MISMATCH):
                align.append(a)
                ti -= 1
                tj -= 1
            elif a == EDIT_INSERT:
                mat = 1
            else:
                mat = 2
        elif mat == 1:
            align.append(EDIT_INSERT)
            if ti > 0:
                if m[ti - 1, tj] + go_ge == e[ti, tj]:
                    ti -= 1
                    mat = 0
                else:
                    ti -= 1
            else:
                mat = 2
        else:
            align.append(EDIT_DELETE)
            if tj > 0:
                if m[ti, tj - 1] + go_ge == f[ti, tj]:
                    tj -= 1
                    mat = 0
                else:
                    tj -= 1
            else:
                mat = 1
    align.reverse()
    return ret, align


def global_alignment_one_end(
    t: str, p: str, threshold: int, score_threshold_factor: float
) -> Tuple[int, List[int]]:
    """Semi-global alignment anchored at (0,0) with a free far end.

    Reference: AlignAlgo.hpp:627-811 (GlobalAlignment_OneEnd).  The end point
    is the max cell whose score clears both ``threshold`` and the density
    bound ``(i+j)*0.5*(0.8*MATCH+0.2*MISMATCH)*factor``; the edit script spans
    t[0:tj], p[0:ti] for that end point.
    """
    lent, lenp = len(t), len(p)
    if lent == 0 or lenp == 0:
        return 0, []

    eq = _string_eq_matrix(t, p)
    m, e, f = _affine_fill(eq, lent, lenp, None, None)

    # Reference computes an *int* threshold via truncation, with the exact
    # multiplication order (i+j)*0.5 * (0.8*MATCH + 0.2*MISMATCH) * factor
    # (AlignAlgo.hpp:701).
    mix = 0.8 * SCORE_MATCH + 0.2 * SCORE_MISMATCH
    best = threshold
    ti = tj = 0
    for i in range(lenp + 1):
        row = m[i]
        for j in range(lent + 1):
            v = row[j]
            score_threshold = int(((i + j) * 0.5) * mix * score_threshold_factor)
            if v < score_threshold:
                continue
            if v > best:
                best = v
                ti, tj = i, j
    ret = int(m[ti, tj])
    align = _affine_traceback(m, e, f, eq, ti, tj)
    return ret, align


def local_alignment(t: str, p: str) -> Tuple[int, int, int, List[int]]:
    """Smith-Waterman with local scores 1/-2 and indel -4.

    Reference: AlignAlgo.hpp:889-980 (LocalAlignment).  Returns
    (score, tstart, pstart, align); score -1 means no positive-scoring cell.
    The max scan uses >= so the bottom-right-most maximum wins.
    """
    lent, lenp = len(t), len(p)
    m = np.zeros((lenp + 1, lent + 1), dtype=np.int64)
    tb = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
    pb = np.frombuffer(p.encode("ascii"), dtype=np.uint8)
    eq = pb[:, None] == tb[None, :]
    for i in range(1, lenp + 1):
        prev = m[i - 1]
        cur = m[i]
        row_eq = eq[i - 1]
        for j in range(1, lent + 1):
            s = prev[j - 1] + (
                SCORE_MATCH_LOCAL if row_eq[j - 1] else SCORE_MISMATCH_LOCAL
            )
            v = cur[j - 1] + SCORE_INDEL
            if v > s:
                s = v
            v = prev[j] + SCORE_INDEL
            if v > s:
                s = v
            cur[j] = s if s > 0 else 0

    max_score = 0
    ti, tj = lenp, lent
    for i in range(lenp + 1):
        row = m[i]
        for j in range(lent + 1):
            if row[j] >= max_score:
                max_score = int(row[j])
                ti, tj = i, j
    if max_score == 0:
        return -1, 0, 0, []

    tstart = 0
    pstart = 0
    align: List[int] = []
    while ti > 0 or tj > 0:
        mx = m[ti, tj]
        a = 0
        if mx == 0:
            tstart = tj
            pstart = ti
            break
        if tj > 0 and m[ti, tj - 1] + SCORE_INDEL == mx:
            a = EDIT_DELETE
        if ti > 0 and m[ti - 1, tj] + SCORE_INDEL == mx:
            a = EDIT_INSERT
        if tj > 0 and ti > 0:
            diff = (
                SCORE_MATCH_LOCAL if eq[ti - 1, tj - 1] else SCORE_MISMATCH_LOCAL
            )
            if m[ti - 1, tj - 1] + diff == mx:
                a = EDIT_MATCH if diff == SCORE_MATCH_LOCAL else EDIT_MISMATCH
        align.append(a)
        if a == EDIT_DELETE:
            tj -= 1
        elif a == EDIT_INSERT:
            ti -= 1
        else:
            ti -= 1
            tj -= 1
    align.reverse()
    return max_score, tstart, pstart, align


def is_mate_overlap(
    fr: str, sr: str, min_overlap: int, check_tandem: bool = True
) -> Tuple[int, int, int]:
    """Detect a unique suffix(fr)-prefix(sr) overlap between mates.

    Reference: AlignAlgo.hpp:1027-1096 (IsMateOverlap).  Returns
    (overlap_size, offset, best_match_cnt); overlap_size -1 on failure
    (ambiguous, none, or tandem-repeat risk).  best_match_cnt reflects the
    last accepted offset even on failure, as in the reference.
    """
    flen, slen = len(fr), len(sr)
    best_match_cnt = -1
    offset_cnt = 0
    offset = -1
    overlap_size = -1
    for j in range(0, flen - min_overlap):
        match_cnt = 0
        flag = True
        if flen - j >= 100:
            sim = 0.85
        elif flen - j >= 50:
            sim = 0.85 + (flen - j - 50) / 50.0 * 0.1
        else:
            sim = 0.95
        k = 0
        while j + k < flen and k < slen:
            if fr[j + k] == sr[k]:
                match_cnt += 1
            if match_cnt + (flen - (j + k) - 1) < int((flen - j) * sim):
                flag = False
                break
            k += 1
        if flag:
            offset = j
            offset_cnt += 1
            overlap_size = k
            best_match_cnt = match_cnt

    if offset_cnt != 1:
        return -1, -1, best_match_cnt

    if check_tandem and overlap_size <= min_overlap * 2:
        for i in range(1, overlap_size // 2 + 1):
            tandem = True
            j = i
            while j + i - 1 < overlap_size:
                ok = True
                for k in range(j, j + i):
                    if sr[k - j] != sr[k]:
                        ok = False
                        break
                if not ok:
                    tandem = False
                    break
                j += i
            if tandem:
                return -1, offset, best_match_cnt
    return overlap_size, offset, best_match_cnt


def locate_partial_suf_pref_exact_match(
    a: str, b: str, min_len: int
) -> Tuple[int, int]:
    """Unique best exact match of a suffix-start in ``a`` vs prefix of ``b``.

    Reference: AlignAlgo.hpp:1102-1138.  Returns (start_in_a, match_len) or
    (-1, 0).  Requires best strictly > second-best + 1.
    """
    len_a, len_b = len(a), len(b)
    best = 0
    best_tag = 0
    sec = 0
    for k in range(0, len_a - min_len + 1):
        j = 0
        i = k
        while i < len_a and j < len_b:
            if a[i] != b[j]:
                break
            i += 1
            j += 1
        if j > best:
            sec = best
            best = j
            best_tag = k
        elif j >= sec:
            sec = j
    if best >= min_len and best > sec + 1:
        return best_tag, best
    return -1, 0


def locate_partial_suf_suf_exact_match(
    a: str, b: str, min_len: int
) -> Tuple[int, int]:
    """Unique best exact match of a partial suffix of ``a`` vs suffix of ``b``.

    Reference: AlignAlgo.hpp:1142-1177.  Returns (start_in_a, match_len) or
    (-1, 0).
    """
    len_a, len_b = len(a), len(b)
    best = 0
    best_tag = 0
    sec = 0
    for k in range(len_a - 1, min_len - 1, -1):
        i = k
        j = len_b - 1
        while i >= 0 and j >= 0:
            if a[i] != b[j]:
                break
            i -= 1
            j -= 1
        if k - i > best:
            sec = best
            best = k - i
            best_tag = i + 1
        elif k - i >= sec:
            sec = k - i
    if best >= min_len and best > sec + 1:
        return best_tag, best
    return -1, 0


# ----------------------------------------------------------------------
# Native dispatch: the C++ kernel library (trust4_tpu/native) implements
# the exact same semantics; tests cross-check both.  TRUST4_TPU_NATIVE=0
# forces the pure-Python oracle.
# ----------------------------------------------------------------------

global_alignment_py = global_alignment
global_alignment_posweight_py = global_alignment_posweight
global_alignment_posweight_affine_py = global_alignment_posweight_affine
global_alignment_one_end_py = global_alignment_one_end
local_alignment_py = local_alignment
is_mate_overlap_py = is_mate_overlap

from trust4_tpu.align import native as _native  # noqa: E402

if _native.available():
    global_alignment = _native.global_alignment
    global_alignment_posweight = _native.global_alignment_posweight
    global_alignment_posweight_affine = _native.global_alignment_posweight_affine
    global_alignment_one_end = _native.global_alignment_one_end
    local_alignment = _native.local_alignment
    is_mate_overlap = _native.is_mate_overlap
