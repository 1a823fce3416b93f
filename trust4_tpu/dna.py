"""Nucleotide tables and small sequence utilities.

Semantics follow the reference tables (reference: defs.h:8-9, main.cpp:39-44):
``nucToNum`` maps A->0, C->1, G->2, T->3 and, notably, N->0 (same slot as A);
every other letter maps to -1.  The N->0 quirk matters for position-weight
comparisons and k-mer encoding and is reproduced exactly.
"""

from __future__ import annotations

import numpy as np

# nucToNum[ord(c) - ord('A')] for 'A'..'Z' (reference: main.cpp:39-44)
NUC_TO_NUM = np.full(26, -1, dtype=np.int8)
NUC_TO_NUM[ord("A") - 65] = 0
NUC_TO_NUM[ord("C") - 65] = 1
NUC_TO_NUM[ord("G") - 65] = 2
NUC_TO_NUM[ord("N") - 65] = 0  # quirk: N encodes as 0
NUC_TO_NUM[ord("T") - 65] = 3

NUM_TO_NUC = "ACGT"

# 256-entry tables for fast byte-level work.
NUC2NUM_256 = np.full(256, -1, dtype=np.int8)
for _c, _v in (("A", 0), ("C", 1), ("G", 2), ("T", 3), ("N", 0)):
    NUC2NUM_256[ord(_c)] = _v

_COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
COMP_256 = np.arange(256, dtype=np.uint8)
for _a, _b in _COMP.items():
    COMP_256[ord(_a)] = ord(_b)


def nuc_num(c: str) -> int:
    """nucToNum equivalent for a single uppercase character."""
    return int(NUC_TO_NUM[ord(c) - 65])


# Complement translation table: A<->T, C<->G, N and everything else -> N
# (the reference's helpers map any non-ACGT to N).
_RC_TABLE = bytes(
    {"A": "T", "C": "G", "G": "C", "T": "A"}.get(chr(c), "N").encode()[0]
    for c in range(256)
)


def revcomp(seq: str) -> str:
    """Reverse complement; non-ACGT characters map to N.

    Mirrors the reference's ReverseComplement helpers (e.g. main.cpp uses
    numToNuc[3 - nucToNum[c]] with N kept as N).
    """
    return seq.encode("ascii").translate(_RC_TABLE)[::-1].decode("ascii")


def seq_to_codes(seq: str) -> np.ndarray:
    """ASCII sequence -> int8 codes (A0 C1 G2 T3, N->0, other -1)."""
    b = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    return NUC2NUM_256[b]


def seq_to_bytes(seq: str) -> np.ndarray:
    return np.frombuffer(seq.encode("ascii"), dtype=np.uint8).copy()


# Codon translation matching the reference's DnaToAa (SeqSet.hpp:638-749):
# any codon containing N or M -> '?'; stop codons -> '_'; any base other than
# A/C/G (including unexpected letters) falls through to the T branch, exactly
# as the reference's nested if/else does.
_CODON = {}


def _fill_codons() -> None:
    bases = "TCAG"
    aas = (
        "FFLLSSSSYY__CC_W"
        "LLLLPPPPHHQQRRRR"
        "IIIMTTTTNNKKSSRR"
        "VVVVAAAADDEEGGGG"
    )
    i = 0
    for b1 in bases:
        for b2 in bases:
            for b3 in bases:
                _CODON[b1 + b2 + b3] = aas[i]
                i += 1


_fill_codons()


def dna_to_aa(a: str, b: str, c: str) -> str:
    """Translate one codon with the reference's exact fall-through rules."""
    if a in "NM" or b in "NM" or c in "NM":
        return "?"
    a = a if a in "ACG" else "T"
    b = b if b in "ACG" else "T"
    c = c if c in "ACG" else "T"
    return _CODON[a + b + c]


def translate(nt: str) -> str:
    """Translate a nucleotide string in frame 0."""
    return "".join(
        dna_to_aa(nt[i], nt[i + 1], nt[i + 2]) for i in range(0, len(nt) - 2, 3)
    )
