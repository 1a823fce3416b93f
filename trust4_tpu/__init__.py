"""trust4_tpu — TPU-native immune-repertoire reconstruction engine.

A from-scratch reimplementation of the capabilities of TRUST4
(liulab-dfci/TRUST4): candidate TCR/BCR read extraction, de-novo contig
assembly with per-base consensus weights, IMGT realignment with V/D/J/C gene
calling and CDR1/2/3 annotation, and clonotype report generation — designed
JAX/XLA-first with batched fixed-shape kernels for the alignment DP and k-mer
probing, and data-parallel read sharding over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md §1 of the reference analysis):
  dna, io         — host-side sequence utilities and FASTQ/FASTA ingest
  align           — the banded-DP kernel family (host oracle + TPU batch)
  ops             — k-mer codes/index/count tensor programs
  engine          — SeqSet assembly/annotation engine
  pipeline        — extractor / assembler / annotator / report stages
  parallel        — mesh construction and sharded batch execution
"""

__version__ = "0.1.0"
