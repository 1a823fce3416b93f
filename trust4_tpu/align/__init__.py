"""Alignment kernel family.

``host``   — exact scalar oracle matching the reference DP semantics bit for
             bit (reference: AlignAlgo.hpp).  Used for correctness and for the
             low-volume edit-script decodes on the host.
``native`` — ctypes bindings to the C++ DP suite (native/align_kernels.cpp),
             the shipping CPU path.

The device DP lives in ``trust4_tpu.ops``: ``dp_batch``/``dp_pallas``
(batched fixed-shape banded DP — scores plus per-cell direction bits with an
on-device decode to edit counts) serve the high-volume annotation gap fills
through ``ops.gap_oracle``.
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
