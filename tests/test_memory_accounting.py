"""SeqSet.get_space (reference SeqSet.hpp:11115-11128 GetSpace): the
single-cell ReleaseFinishedBarcodeSeq path exists to bound memory; this
verifies the accounting sees the release reclaim it."""

from trust4_tpu.engine.seqset import SeqSet


def test_release_reclaims_space():
    ss = SeqSet(9)
    base = ss.get_space()
    for b in range(40):
        ss.input_novel_read(f"IGHV0-{b}*01", "ACGTAGCTAGGATCGATTACGGATCAGTTCAGGAT" * 4, 1, b)
    grown = ss.get_space()
    assert grown > base + 40 * 100  # consensus + posWeight + index grew
    ss.release_finished_barcode_seq(
        {b: 1 for b in range(40)}, True, 0, False
    )
    released = ss.get_space()
    # posWeight arenas and index postings of released barcodes are gone.
    assert released < grown - (grown - base) // 2
