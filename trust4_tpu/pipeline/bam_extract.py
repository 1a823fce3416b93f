"""BAM candidate-read extractor (reference: BamExtractor.cpp).

Two-pass extraction from a coordinate-sorted BAM: pass 1 classifies reads
(unmapped templates, alternative-chromosome placements, receptor-locus
overlaps) and records candidate names; pass 2 collects both mates of each
candidate.  Library layout (SE vs PE, read/fragment stats) is sampled from
the first 100k reads.
"""

from __future__ import annotations

import math
import sys
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from trust4_tpu.engine.seqset import SeqSet
from trust4_tpu.io.bam import BamReader
from trust4_tpu.pipeline.assembler import is_low_complexity


def log(msg: str) -> None:
    print(msg, file=sys.stderr)


def valid_alternative_chrom(chrom: str) -> bool:
    """BamExtractor.cpp:114-125."""
    return "_" in chrom or "." in chrom


def trim_name(name: str, trim_len: int) -> str:
    """BamExtractor.cpp:164-179."""
    if trim_len == -1:
        if len(name) >= 2 and name[-1] in "12" and name[-2] == "/":
            return name[:-2]
        return name
    return name[: len(name) - trim_len]


@dataclass
class LibraryInfo:
    read_len: int = 0
    frag_len: int = 0
    frag_stdev: int = 0
    mate_paired: bool = False


def get_general_info(bam: BamReader) -> LibraryInfo:
    """Sample up to 100k primary reads (alignments.hpp:559-648)."""
    sample_max = 100000
    lens: List[int] = []
    mate_diff: List[int] = []
    has_mate_cnt = 0
    total = 0
    for rec in bam:
        if not rec.is_primary:
            continue
        if len(lens) < sample_max:
            lens.append(rec.l_seq)
        if (
            len(mate_diff) < sample_max
            and rec.tid == rec.mtid
            and rec.pos < rec.mpos
            and rec.is_reverse != rec.is_mate_reverse
        ):
            mate_diff.append(rec.mpos - rec.pos)
        if rec.flag & 0x1:
            has_mate_cnt += 1
        total += 1
        if total >= sample_max:
            break

    info = LibraryInfo()
    lens.sort()
    info.read_len = lens[-1]
    if has_mate_cnt > total / 2:
        info.mate_paired = True
        mate_diff.sort()
        s = 0
        sq = 0
        k = 0
        while k < len(mate_diff) * 0.7:
            v = mate_diff[k] + info.read_len
            s += v
            sq += v * v
            k += 1
        info.frag_len = s // k
        info.frag_stdev = int(math.sqrt(sq // k - info.frag_len * info.frag_len))
        if info.frag_stdev == 0:
            info.frag_stdev = 1
    else:
        info.frag_len = info.read_len
        info.frag_stdev = 0
    return info


def run_bam_extractor(
    ref_fa: str,
    bam_path: str,
    out_prefix: str = "toassemble",
    abnormal_unaligned_flag: bool = False,
    barcode_field: str = "",
    umi_field: str = "",
    mate_id_len: int = -1,
) -> None:
    """BamExtractor.cpp main(), single-thread deterministic path."""
    ref_set = SeqSet(9)
    ref_set.input_ref_fa(ref_fa)

    bam = BamReader(bam_path)

    # Parse V/D/J/C genomic intervals from the -f headers
    # (BamExtractor.cpp:542-564).
    genes: List[Tuple[int, int, int]] = []
    with open(ref_fa) as fp:
        for line in fp:
            if not line.startswith(">"):
                continue
            toks = line.split()
            chrom, start, end = toks[1], int(toks[2]), int(toks[3])
            genes.append((bam.get_chrom_id_from_name(chrom), start, end))
    genes.sort()
    gene_cnt = len(genes)

    log("Start to extract candidate reads from bam file.")
    info = get_general_info(bam)
    bam.rewind()

    hit_len_required = 21
    if info.frag_stdev == 0:
        hit_len_required = 17
    if info.read_len // 5 > hit_len_required:
        hit_len_required = info.read_len // 5
    if hit_len_required > 101:
        hit_len_required = 101
    ref_set.set_hit_len_required(hit_len_required)

    paired = info.frag_stdev != 0

    from trust4_tpu.io import bam_native

    if bam_native.available():
        # Full two-pass extraction in native code (bit-identical).
        bam_native.native_bam_extract(
            bam_path,
            [sw.consensus for sw in ref_set.seqs],
            9,
            ref_set.radius,
            hit_len_required,
            genes,
            paired,
            abnormal_unaligned_flag,
            mate_id_len,
            f"{out_prefix}_1.fq" if paired else f"{out_prefix}.fq",
            f"{out_prefix}_2.fq" if paired else "",
            f"{out_prefix}_bc.fa" if barcode_field else "",
            f"{out_prefix}_umi.fa" if umi_field else "",
            barcode_field,
            umi_field,
        )
        log("Finish extracting reads.")
        return

    if paired:
        fp1 = open(f"{out_prefix}_1.fq", "w")
        fp2 = open(f"{out_prefix}_2.fq", "w")
    else:
        fp1 = open(f"{out_prefix}.fq", "w")
        fp2 = None
    fp_bc = open(f"{out_prefix}_bc.fa", "w") if barcode_field else None
    fp_umi = open(f"{out_prefix}_umi.fa", "w") if umi_field else None

    def output_seq(fp, name, seq, qual):
        if qual is not None:
            fp.write(f"@{name}\n{seq}\n+\n{qual}\n")
        else:
            fp.write(f">{name}\n{seq}\n")

    def output_barcode(fp, name, barcode):
        if barcode:
            fp.write(f">{name}\n{barcode}\n")
        else:
            fp.write(f">{name}\nmissing_barcode\n")

    candidates: Dict[str, List] = {}
    used_name: Dict[str, int] = {}

    tag = 0
    it = iter(bam)
    for rec in it:
        if not rec.is_template_aligned() or (
            rec.is_aligned()
            and valid_alternative_chrom(bam.chrom_names[rec.tid])
        ):
            if (
                not rec.is_template_aligned()
                and paired
                and not abnormal_unaligned_flag
            ):
                # Unmapped pairs expected adjacent (BamExtractor.cpp:639-725).
                seq1 = rec.read_seq()
                qual1 = rec.qual()
                name = trim_name(rec.name, mate_id_len)
                rec2 = next(it, None)
                if rec2 is None:
                    raise RuntimeError(
                        "Two reads from the unaligned fragment are not "
                        "showing up together. Please use -u option."
                    )
                mate_name = trim_name(rec2.name, mate_id_len)
                if name != mate_name:
                    raise RuntimeError(
                        "Two reads from the unaligned fragment are not "
                        "showing up together. Please use -u option."
                    )
                seq2 = rec2.read_seq()
                qual2 = rec2.qual()
                if (
                    not is_low_complexity(seq2)
                    and not is_low_complexity(seq1)
                ) and (
                    ref_set.has_hit_in_set(seq2, 0) != 0
                    or ref_set.has_hit_in_set(seq1, 0) != 0
                ):
                    if not rec2.is_first_mate:
                        output_seq(fp1, name, seq1, qual1)
                        output_seq(fp2, name, seq2, qual2)
                    else:
                        output_seq(fp1, name, seq2, qual2)
                        output_seq(fp2, name, seq1, qual1)
                    if fp_bc is not None:
                        output_barcode(fp_bc, name, rec2.get_field_z(barcode_field))
                    if fp_umi is not None:
                        output_barcode(fp_umi, name, rec2.get_field_z(umi_field))
                continue

            if paired:
                seq = rec.read_seq()
                if not is_low_complexity(seq) and ref_set.has_hit_in_set(seq, 0) != 0:
                    name = trim_name(rec.name, mate_id_len)
                    if name not in candidates:
                        candidates[name] = [None, None, None, None]
            else:
                seq = rec.read_seq()
                name = rec.name
                if rec.is_aligned() and name in used_name:
                    continue
                if not is_low_complexity(seq) and ref_set.has_hit_in_set(seq, 0) != 0:
                    if rec.is_aligned():
                        used_name[name] = 1
                    output_seq(fp1, rec.name, seq, rec.qual())
                    if fp_bc is not None:
                        output_barcode(fp_bc, rec.name, rec.get_field_z(barcode_field))
                    if fp_umi is not None:
                        output_barcode(fp_umi, rec.name, rec.get_field_z(umi_field))
            continue

        if not rec.is_aligned():
            continue

        chr_id = rec.tid
        segments = rec.ref_segments()
        start = segments[0][0]
        end = segments[-1][1]
        while tag < gene_cnt and (
            chr_id > genes[tag][0]
            or (chr_id == genes[tag][0] and start > genes[tag][2])
        ):
            tag += 1
        if tag >= gene_cnt:
            continue
        if chr_id < genes[tag][0] or (
            chr_id == genes[tag][0] and end <= genes[tag][1]
        ):
            continue

        seq = rec.read_seq()
        if is_low_complexity(seq):
            continue

        if paired:
            name = trim_name(rec.name, mate_id_len)
            if name not in candidates:
                candidates[name] = [None, None, None, None]
        else:
            name = rec.name
            if name in used_name:
                continue
            used_name[name] = 1
            output_seq(fp1, rec.name, seq, rec.qual())
            if fp_bc is not None:
                output_barcode(fp_bc, rec.name, rec.get_field_z(barcode_field))
            if fp_umi is not None:
                output_barcode(fp_umi, rec.name, rec.get_field_z(umi_field))

    bam.rewind()
    if not paired:
        fp1.close()
        if fp_bc:
            fp_bc.close()
        if fp_umi:
            fp_umi.close()
        log("Finish extracting reads.")
        return

    # Pass 2: collect both mates of every candidate name
    # (BamExtractor.cpp:874-942).
    log("Finish obtaining the candidate read ids.")
    candidate_cnt = len(candidates)
    output_cnt = 0
    for rec in bam:
        if not rec.is_primary:
            continue
        if not rec.is_template_aligned() and not abnormal_unaligned_flag:
            continue
        name = trim_name(rec.name, mate_id_len)
        entry = candidates.get(name)
        if entry is None:
            continue
        seq = rec.read_seq()
        qual = rec.qual()
        if rec.is_first_mate:
            entry[0] = seq
            entry[2] = qual
        else:
            entry[1] = seq
            entry[3] = qual
        if entry[0] is not None and entry[1] is not None:
            output_seq(fp1, name, entry[0], entry[2])
            output_seq(fp2, name, entry[1], entry[3])
            if fp_bc is not None:
                output_barcode(fp_bc, name, rec.get_field_z(barcode_field))
            if fp_umi is not None:
                output_barcode(fp_umi, name, rec.get_field_z(umi_field))
            entry[0] = entry[1] = None
            output_cnt += 1
            if output_cnt == candidate_cnt:
                break
    fp1.close()
    fp2.close()
    if fp_bc:
        fp_bc.close()
    if fp_umi:
        fp_umi.close()
    log("Finish extracting reads.")
