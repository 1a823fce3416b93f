"""Reference database builders (reference: BuildDatabaseFa.pl,
BuildImgtAnnot.pl, BuildImgtVquestAnnot.pl).

The IMGT builders take a local copy of the IMGT download (this environment
has no egress); pass the downloaded
IMGTGENEDB-ReferenceSequences.fasta-nt-WithGaps-F+ORF+inframeP file.
"""

from __future__ import annotations

import sys
from typing import Dict, List

_COMP = str.maketrans("ACGT", "TGCA")


def build_database_fa(genome_fa, gtf_path, gene_list_path, out=sys.stdout):
    """Genome + GTF + gene list -> '-f' coordinate fasta
    (BuildDatabaseFa.pl): exon-spliced V/D/J/C sequences with genomic
    coordinates in the header."""
    genome: Dict[str, str] = {}
    chrom = ""
    seq_parts: List[str] = []
    has_chr_prefix = False
    with open(genome_fa) as fp:
        for line in fp:
            if line.startswith(">"):
                if chrom:
                    genome[chrom] = "".join(seq_parts)
                seq_parts = []
                chrom = line[1:].split()[0]
                if chrom.startswith("c"):
                    has_chr_prefix = True
            else:
                seq_parts.append(line.strip())
    if chrom:
        genome[chrom] = "".join(seq_parts)

    interested = set()
    with open(gene_list_path) as fp:
        for line in fp:
            interested.add(line.strip().upper())

    import re

    tname_re = re.compile(r'transcript_name "(.*?)"')
    gname_re = re.compile(r'gene_name "(.*?)"')

    prev_tname = ""
    gname = ""
    strand = "."
    ranges: List = []

    def output_gene():
        chrom = ranges[0]
        start = ranges[1]
        end = ranges[-1]
        if strand == "-":
            start = ranges[-2]
            end = ranges[2]
        if chrom not in genome:
            raise ValueError(f"Unknown chrom id {chrom}")
        out.write(f">{gname} {chrom} {start} {end} {strand}\n")
        pieces = []
        for i in range(0, len(ranges), 3):
            tmp = genome[ranges[i]][ranges[i + 1] - 1 : ranges[i + 2]].upper()
            if strand == "-":
                tmp = tmp[::-1].translate(_COMP)
            pieces.append(tmp)
        out.write("".join(pieces) + "\n")

    with open(gtf_path) as fp:
        for line in fp:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            if cols[2] != "exon":
                continue
            m = tname_re.search(cols[8])
            if not m:
                raise ValueError(f"No transcript_name {line}")
            tname = m.group(1)
            if tname != prev_tname:
                if gname in interested and ranges:
                    output_gene()
                prev_tname = tname
                m = gname_re.search(cols[8])
                if not m:
                    raise ValueError(f"No gene_name: {line}")
                gname = m.group(1).upper()
                strand = cols[6]
                ranges = []
            c = cols[0]
            if has_chr_prefix and not c.startswith("c"):
                c = "chr" + c
            elif not has_chr_prefix and c.startswith("c"):
                c = c[3:]
            ranges.extend([c, int(cols[3]), int(cols[4])])
    if gname in interested and ranges:
        output_gene()


def build_imgt_annot(imgt_download_path, species, out=sys.stdout):
    """IMGT GENE-DB gapped download -> bare-allele-name reference fasta
    (BuildImgtAnnot.pl reformat step; the download itself must be supplied)."""
    prev_id = ""
    prev_gene = ""
    output = False
    skip_header = False
    with open(imgt_download_path) as fp:
        for line in fp:
            if line.startswith(">"):
                cols = line[1:].split("|")
                s = cols[2].replace(" ", "_")
                if species not in s:
                    output = False
                elif not (cols[1].startswith("IG") or cols[1].startswith("TR")):
                    output = False
                else:
                    output = True
                    if cols[1] == prev_gene:
                        if cols[0] != prev_id:
                            output = False
                        skip_header = True
                    else:
                        skip_header = False
                prev_id = cols[0]
                prev_gene = cols[1]
            if not output:
                continue
            if not line.startswith(">"):
                out.write(
                    line.translate(str.maketrans("acgtn", "ACGTN"))
                )
            elif not skip_header:
                out.write(">" + line.split("|")[1] + "\n")


def build_imgt_vquest_annot(
    vquest_fa, bcrtcr_fa, cgene_list, out=sys.stdout
):
    """V-QUEST download + C genes from the coordinate fasta -> IMGT+C.fa
    (BuildImgtVquestAnnot.pl)."""
    with open(vquest_fa) as fp:
        for line in fp:
            if not line.startswith(">"):
                out.write(line.translate(str.maketrans("acgtn", "ACGTN")))
            else:
                out.write(">" + line.split("|")[1] + "\n")
    cgenes = [l.strip() for l in open(cgene_list) if l.strip()]
    with open(bcrtcr_fa) as fp:
        lines = fp.read().splitlines()
    for i, line in enumerate(lines):
        if line.startswith(">") and any(g in line for g in cgenes):
            out.write(line + "\n")
            if i + 1 < len(lines):
                out.write(lines[i + 1] + "\n")
