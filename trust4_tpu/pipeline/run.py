"""End-to-end pipeline driver: extract -> assemble -> annotate -> report.

Python equivalent of the reference's Perl driver (reference: run-trust4).
Stage gating matches --stage 0..3; inter-stage state lives in the same
prefix-named files, so a run can resume from any stage boundary.
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

from trust4_tpu.pipeline.annotator import Annotator
from trust4_tpu.pipeline.assembler import Assembler
from trust4_tpu.pipeline.extract import run_barcoded_extractor, run_extractor
from trust4_tpu.pipeline.report import airr_report, barcode_rep, simple_rep


def log(msg: str) -> None:
    print(msg, file=sys.stderr)


def run_trust4(
    coord_fasta: str,
    imgt_fasta: str,
    read1_files: Optional[List[str]] = None,
    read2_files: Optional[List[str]] = None,
    single_files: Optional[List[str]] = None,
    bam_file: Optional[str] = None,
    output_prefix: str = "TRUST",
    stage: int = 0,
    threads: int = 1,
    skip_mate_extension: bool = False,
    abnormal_unmap_flag: bool = False,
    barcode_files: Optional[List[str]] = None,
    umi_files: Optional[List[str]] = None,
    read_format: str = "",
    barcode_whitelist: Optional[str] = None,
    barcode_translate: Optional[str] = None,
    use_tpu_prefilter: bool = False,
) -> None:
    prefix = output_prefix
    paired = bool(read1_files)
    has_barcode = barcode_files is not None
    has_umi = umi_files is not None

    # Stage 0: extraction (reference: run-trust4:404-446).
    if stage <= 0:
        if bam_file is not None:
            from trust4_tpu.pipeline.bam_extract import run_bam_extractor

            run_bam_extractor(
                coord_fasta,
                bam_file,
                prefix + "_toassemble",
                abnormal_unaligned_flag=abnormal_unmap_flag,
            )
        elif has_barcode or has_umi or read_format:
            run_barcoded_extractor(
                coord_fasta,
                read1_files if paired else single_files,
                read2_files if paired else None,
                prefix + "_toassemble",
                barcode_files=barcode_files,
                umi_files=umi_files,
                read_format=read_format,
                barcode_whitelist=barcode_whitelist,
                barcode_translate=barcode_translate,
                use_tpu_prefilter=use_tpu_prefilter,
            )
        elif paired:
            run_extractor(
                coord_fasta,
                read1_files,
                read2_files,
                prefix + "_toassemble",
                use_tpu_prefilter=use_tpu_prefilter,
                threads=threads,
            )
        else:
            run_extractor(
                coord_fasta,
                single_files,
                None,
                prefix + "_toassemble",
                use_tpu_prefilter=use_tpu_prefilter,
                threads=threads,
            )

    if bam_file is not None:
        # The BAM extractor decides SE vs PE from the library stats
        # (run-trust4:452-466 checks which files exist).
        paired = os.path.exists(prefix + "_toassemble_1.fq")

    if paired:
        asm_reads = [prefix + "_toassemble_1.fq"]
        asm_mates = [prefix + "_toassemble_2.fq"]
    else:
        asm_reads = [prefix + "_toassemble.fq"]
        asm_mates = None

    # Stage 1: assembly (run-trust4:506-508).
    if stage <= 1:
        asm = Assembler(
            coord_fasta,
            output_prefix=prefix,
            skip_mate_extension=skip_mate_extension,
            threads=threads,
        )
        asm.run(
            asm_reads,
            asm_mates,
            barcode_files=[prefix + "_toassemble_bc.fa"] if has_barcode else None,
            umi_files=[prefix + "_toassemble_umi.fa"] if has_umi else None,
        )

    # Stage 2: annotation (run-trust4:512-550).
    if stage <= 2:
        ann = Annotator(
            imgt_fasta,
            output_prefix=prefix,
            has_barcode=has_barcode,
            has_umi=has_umi,
            threads=threads,
        )
        ann.load_assembly(prefix + "_final.out")
        ann.annotate_all()
        with open(prefix + "_annot.fa", "w") as fp:
            ann.write_annotation_fasta(fp)
        ann.write_airr_align(prefix + "_airr_align.tsv")
        ann.realign_and_write_cdr3(
            prefix + "_assembled_reads.fa", prefix + "_cdr3.out"
        )

    # Stage 3: reports (run-trust4:553-566).
    if stage <= 3:
        if not has_barcode:
            with open(prefix + "_report.tsv", "w") as fp:
                simple_rep(prefix + "_cdr3.out", fp)
            with open(prefix + "_airr.tsv", "w") as fp:
                airr_report(
                    prefix + "_report.tsv",
                    prefix + "_annot.fa",
                    fp,
                    "simplerep",
                    prefix + "_airr_align.tsv",
                )
        else:
            with open(prefix + "_barcode_report.tsv", "w") as fp:
                barcode_rep(
                    prefix + "_cdr3.out", fp, prefix + "_annot.fa"
                )
            with open(prefix + "_report.tsv", "w") as fp:
                simple_rep(
                    prefix + "_cdr3.out",
                    fp,
                    use_barcode_cnt=True,
                    filter_barcoderep=prefix + "_barcode_report.tsv",
                )
            with open(prefix + "_airr.tsv", "w") as fp:
                airr_report(
                    prefix + "_report.tsv",
                    prefix + "_annot.fa",
                    fp,
                    "simplerep",
                    prefix + "_airr_align.tsv",
                )
            with open(prefix + "_barcode_airr.tsv", "w") as fp:
                airr_report(
                    prefix + "_barcode_report.tsv",
                    prefix + "_annot.fa",
                    fp,
                    "barcoderep",
                    prefix + "_airr_align.tsv",
                )
    log("TRUST4 finishes.")
