"""Sequence-set engine: reference DB, contig assembly, annotation."""
