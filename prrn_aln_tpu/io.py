"""Sequence / alignment file I/O.

Readers for the formats the reference suite consumes on its main paths
(multi-FASTA incl. the ``;C`` extended gene-structure comments, and the
native interleaved MSA format with a ``count length name`` header line;
reference: src/seq.cc fgetseq and format readers, seq.h:453-591), and
writers for native block, FASTA and CLUSTAL outputs (reference:
src/sqpr.cc).
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path

import numpy as np

from . import alphabet as ab
from .msa.msa import Msa


@dataclasses.dataclass
class SeqRecord:
    name: str
    seq: str                      # residue characters, may contain gaps
    comments: list[str] = dataclasses.field(default_factory=list)
    exons: list[tuple[int, int]] | None = None   # from ;C annotations


_COORD_RE = re.compile(r"(\d+)\.\.(\d+)")


def _parse_exons(comments: list[str]) -> list[tuple[int, int]] | None:
    """Parse ``;C`` extended-FASTA exon coordinates (reference seq.h:594,
    README.md:30-79): join(...) / complement(join(...)) ranges."""
    text = " ".join(c[2:].strip() for c in comments if c.startswith(";C"))
    if not text:
        return None
    return [(int(a), int(b)) for a, b in _COORD_RE.findall(text)]


def read_fasta(path: str | Path) -> list[SeqRecord]:
    recs: list[SeqRecord] = []
    name, lines, comments = None, [], []
    for raw in Path(path).read_text().splitlines():
        if raw.startswith(">"):
            if name is not None:
                recs.append(SeqRecord(name, "".join(lines), comments,
                                      _parse_exons(comments)))
            name = raw[1:].split()[0] if len(raw) > 1 else "seq"
            lines, comments = [], []
        elif raw.startswith(";"):
            comments.append(raw)
        elif raw.strip() and name is not None:
            lines.append(re.sub(r"[\s\d]", "", raw))
    if name is not None:
        recs.append(SeqRecord(name, "".join(lines), comments,
                              _parse_exons(comments)))
    return recs


def read_native(path: str | Path) -> list[SeqRecord]:
    """Native interleaved/serial MSA: header ``many len name`` then
    ``>name`` entries terminated by ``/`` lines."""
    lines = Path(path).read_text().splitlines()
    recs: list[SeqRecord] = []
    name, buf = None, []
    for raw in lines[1:]:
        if raw.startswith(">"):
            if name is not None:
                recs.append(SeqRecord(name, "".join(buf)))
            name = raw[1:].split()[0] if len(raw) > 1 else "seq"
            buf = []
        elif raw.strip() == "/":
            continue
        elif raw.startswith((";", "#")) or not raw.strip():
            continue
        elif name is not None:
            buf.append(re.sub(r"[\s\d]", "", raw))
    if name is not None:
        recs.append(SeqRecord(name, "".join(buf)))
    return recs


def sniff_and_read(path: str | Path) -> list[SeqRecord]:
    first = ""
    with open(path) as f:
        for line in f:
            if line.strip():
                first = line
                break
    if first.startswith(">"):
        return read_fasta(path)
    if first.startswith("LOCUS"):
        return read_genbank(path)
    if first.startswith("ID"):
        return read_embl(path)
    toks = first.split()
    if len(toks) >= 2 and toks[0].isdigit() and toks[1].isdigit():
        return read_native(path)
    return read_fasta(path)


def records_to_msa(recs: list[SeqRecord], molc: int | None = None) -> Msa:
    if molc is None:
        molc = ab.infer_molc(recs[0].seq)
    rows = [r.seq for r in recs]
    L = max(len(r) for r in rows)
    rows = [r.ljust(L, "-") for r in rows]
    codes = np.stack([ab.encode(r, molc) for r in rows])
    return Msa(codes=codes, molc=molc, names=[r.name for r in recs])


# ---------------------------------------------------------------------------
# writers

def decode_row(msa: Msa, i: int) -> str:
    return ab.decode(msa.codes[i], msa.molc)


def write_fasta(msa: Msa, path=None) -> str:
    out = []
    for i, name in enumerate(msa.names):
        out.append(f">{name}")
        row = decode_row(msa, i)
        out += [row[j:j + 60] for j in range(0, len(row), 60)]
    text = "\n".join(out) + "\n"
    if path:
        Path(path).write_text(text)
    return text


def write_clustal(msa: Msa, path=None) -> str:
    out = ["CLUSTAL W (prrn_aln_tpu)", ""]
    rows = [decode_row(msa, i) for i in range(msa.many)]
    width = max(len(n) for n in msa.names) + 2
    for start in range(0, msa.length, 60):
        for name, row in zip(msa.names, rows):
            out.append(name.ljust(width) + row[start:start + 60])
        out.append("")
    text = "\n".join(out) + "\n"
    if path:
        Path(path).write_text(text)
    return text


def write_native_block(msa: Msa, path=None, width: int = 60) -> str:
    """Reference-style block output: header, then 60-column blocks with
    1-based residue start positions and '| name' trailers
    (sqpr.cc native print mode)."""
    rows = [decode_row(msa, i) for i in range(msa.many)]
    pos = [1] * msa.many
    first = msa.names[0] if msa.names else "msa"
    out = [f">{first} [{msa.many}:{msa.length}]  ( 1 - {msa.length} )", ""]
    for start in range(0, msa.length, width):
        for i, row in enumerate(rows):
            seg = row[start:start + width]
            out.append(f"{pos[i]:8d} {seg.ljust(width)}| {msa.names[i]}")
            pos[i] += sum(1 for c in seg if c not in "- ")
        out.append("")
    text = "\n".join(out) + "\n"
    if path:
        Path(path).write_text(text)
    return text


def read_genbank(path: str | Path) -> list[SeqRecord]:
    """Minimal GenBank flat-file reader (LOCUS/ORIGIN records)."""
    recs = []
    name, seq, in_seq = None, [], False
    for line in Path(path).read_text().splitlines():
        if line.startswith("LOCUS"):
            if name:
                recs.append(SeqRecord(name, "".join(seq)))
            name = line.split()[1]
            seq, in_seq = [], False
        elif line.startswith("ORIGIN"):
            in_seq = True
        elif line.startswith("//"):
            in_seq = False
        elif in_seq:
            seq.append(re.sub(r"[\s\d]", "", line))
    if name:
        recs.append(SeqRecord(name, "".join(seq)))
    return recs


def read_embl(path: str | Path) -> list[SeqRecord]:
    """Minimal EMBL/SwissProt reader (ID/SQ records)."""
    recs = []
    name, seq, in_seq = None, [], False
    for line in Path(path).read_text().splitlines():
        if line.startswith("ID"):
            if name:
                recs.append(SeqRecord(name, "".join(seq)))
            name = line.split()[1].rstrip(";")
            seq, in_seq = [], False
        elif line.startswith("SQ"):
            in_seq = True
        elif line.startswith("//"):
            in_seq = False
        elif in_seq:
            seq.append(re.sub(r"[\s\d]", "", line))
    if name:
        recs.append(SeqRecord(name, "".join(seq)))
    return recs


def write_phylip(msa: Msa, path=None) -> str:
    rows = [decode_row(msa, i) for i in range(msa.many)]
    out = [f" {msa.many} {msa.length}"]
    for name, row in zip(msa.names, rows):
        out.append(f"{name[:10]:<10}{row[:50]}")
    pos = 50
    while pos < msa.length:
        out.append("")
        for row in rows:
            out.append(" " * 10 + row[pos:pos + 50])
        pos += 50
    text = "\n".join(out) + "\n"
    if path:
        Path(path).write_text(text)
    return text


def write_msf(msa: Msa, path=None) -> str:
    """GCG MSF interleaved output."""
    rows = [decode_row(msa, i).replace("-", ".") for i in range(msa.many)]
    width = max(len(n) for n in msa.names) + 2
    out = [f"  MSA  MSF: {msa.length}  Type: "
           f"{'P' if msa.molc == 1 else 'N'}  Check: 0  ..", ""]
    for name in msa.names:
        out.append(f" Name: {name:<{width}} Len: {msa.length}  Check: 0  "
                   f"Weight: 1.00")
    out += ["", "//", ""]
    for start in range(0, msa.length, 50):
        for name, row in zip(msa.names, rows):
            seg = row[start:start + 50]
            blocks = " ".join(seg[i:i + 10] for i in range(0, len(seg), 10))
            out.append(f"{name:<{width}} {blocks}")
        out.append("")
    text = "\n".join(out) + "\n"
    if path:
        Path(path).write_text(text)
    return text


def write_gde(msa: Msa, path=None) -> str:
    out = []
    for i, name in enumerate(msa.names):
        out.append(f"{'%' if msa.molc == 1 else '#'}{name}")
        row = decode_row(msa, i)
        out += [row[j:j + 60] for j in range(0, len(row), 60)]
    text = "\n".join(out) + "\n"
    if path:
        Path(path).write_text(text)
    return text
