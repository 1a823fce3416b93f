"""Alignment kernel family.

``host``   — exact scalar oracle matching the reference DP semantics bit for
             bit (reference: AlignAlgo.hpp).  Used for correctness and for the
             low-volume edit-script decodes on the host.
``tpu``    — batched fixed-shape banded DP in JAX (scores + packed traceback)
             for the high-volume sweeps (assembly overlap verification,
             annotator realignment).
"""

from trust4_tpu.align.host import (
    EDIT_MATCH,
    EDIT_MISMATCH,
    EDIT_INSERT,
    EDIT_DELETE,
    SCORE_MATCH,
    SCORE_MISMATCH,
    SCORE_GAPOPEN,
    SCORE_GAPEXTEND,
    SCORE_INDEL,
    global_alignment,
    global_alignment_posweight,
    global_alignment_one_end,
    local_alignment,
    is_mate_overlap,
    locate_partial_suf_pref_exact_match,
    locate_partial_suf_suf_exact_match,
)

__all__ = [
    "EDIT_MATCH",
    "EDIT_MISMATCH",
    "EDIT_INSERT",
    "EDIT_DELETE",
    "SCORE_MATCH",
    "SCORE_MISMATCH",
    "SCORE_GAPOPEN",
    "SCORE_GAPEXTEND",
    "SCORE_INDEL",
    "global_alignment",
    "global_alignment_posweight",
    "global_alignment_one_end",
    "local_alignment",
    "is_mate_overlap",
    "locate_partial_suf_pref_exact_match",
    "locate_partial_suf_suf_exact_match",
]
