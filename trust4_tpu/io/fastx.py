"""Streaming FASTA/FASTQ reader matching the reference ingest semantics.

Reference: ReadFiles.hpp + kseq.h.  The record id is the header token up to
the first whitespace; a trailing ``/1`` or ``/2`` is stripped
(ReadFiles.hpp:179-185).  Multiple files chain transparently; ``.gz`` inputs
are decompressed on the fly.
"""

from __future__ import annotations

import gzip
import os
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence


@dataclass(slots=True)
class FastxRecord:
    id: str
    seq: str
    qual: Optional[str] = None
    comment: Optional[str] = None


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


def _strip_mate_suffix(name: str) -> str:
    if len(name) >= 2 and name[-2] == "/" and name[-1] in "12":
        return name[:-2]
    return name


def _parse_header(line: str) -> tuple[str, Optional[str]]:
    body = line[1:].rstrip("\n").rstrip("\r")
    sp = body.find(" ")
    tb = body.find("\t")
    if sp == -1:
        i = tb
    elif tb == -1:
        i = sp
    else:
        i = sp if sp < tb else tb
    if i == -1:
        return _strip_mate_suffix(body), None
    return _strip_mate_suffix(body[:i]), body[i + 1 :]


def _read_fastq_bulk(path: str) -> Optional[list]:
    """Whole-file FASTQ fast path: one read + split instead of a
    per-line generator (the streaming parser costs ~11us/record, which
    dominated ingest at 100k+ reads).  Returns None when the file isn't
    a clean 4-line-record FASTQ (caller falls back to streaming)."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return None
    if path.endswith(".gz") or size > (1 << 29):
        return None
    with open(path, "rt") as f:
        head = f.read(1)
        if head != "@":
            return None
        data = head + f.read()
    if "\r" in data:  # CRLF anywhere: keep the rstrip'ing streaming path
        return None
    lines = data.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    n = len(lines)
    if n % 4 != 0:
        return None
    out = []
    for i in range(0, n, 4):
        h = lines[i]
        if not h.startswith("@") or not lines[i + 2].startswith("+"):
            return None
        rid, comment = _parse_header(h)
        seq = lines[i + 1]
        # The streaming parser strips sequence-line whitespace; mirror it
        # only when an edge byte is whitespace (one char test per line).
        if seq and (seq[0] in " \t" or seq[-1] in " \t"):
            seq = seq.strip()
        out.append(FastxRecord(rid, seq, lines[i + 3], comment))
    return out


def _read_one_file(path: str) -> Iterator[FastxRecord]:
    bulk = _read_fastq_bulk(path)
    if bulk is not None:
        yield from bulk
        return
    with _open(path) as f:
        it = iter(f)
        line = next(it, "")
        while line:
            if line[0] == "@":
                # FASTQ fast path: fixed 4-line records.
                rid, comment = _parse_header(line)
                seq = next(it, "").strip()
                next(it, "")  # '+'
                qual = next(it, "").rstrip("\n").rstrip("\r")
                yield FastxRecord(rid, seq, qual, comment)
                line = next(it, "")
            elif line[0] == ">":
                rid, comment = _parse_header(line)
                seq_parts = []
                line = next(it, "")
                while line and line[0] not in ">@":
                    seq_parts.append(line.strip())
                    line = next(it, "")
                yield FastxRecord(rid, "".join(seq_parts), None, comment)
            else:
                line = next(it, "")


def read_fastx(paths) -> Iterator[FastxRecord]:
    """Iterate records over one path or a sequence of paths."""
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    for p in paths:
        yield from _read_one_file(p)
