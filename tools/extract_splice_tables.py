#!/usr/bin/env python3
"""Extract splice-signal parameter tables from the reference table
directory into a compact .npz data asset.

Inputs (reference data files, ALN_TAB directory):
  Intron53 — four stacked PatMat blocks: 16-entry 5' dinucleotide
             signal, 16-entry 3' dinucleotide signal, 256-entry 5'x3'
             pair table, 256-entry 3'x5' pair table
             (reference: src/codepot.cc Sig53::Sig53).
  Splice5  — context PWM for donor (5') sites: header
             `rows cols offset transpose skip tonic`, `skip` lines to
             ignore, then rows x cols values; rows=11 positions, 84
             features each = 4 zeroth-order + 16 first-order + 64
             second-order Markov terms (reference: src/utilseq.cc
             PatMat::readPatMat, calcPatMat Mrkv==2).
  Splice3  — context PWM for acceptor (3') sites, same layout with
             rows=17, offset=14.

These are numeric model parameters (like the PAM matrix series), not
code; they are stored raw and scaled at runtime.
"""

import sys
from pathlib import Path

import numpy as np

TABDIR = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/reftable")
OUT = Path(__file__).resolve().parent.parent / "prrn_aln_tpu" / "data" / "splice_tables.npz"


def read_patmat(tokens, pos):
    """Parse one PatMat block from a token stream; returns (dict, newpos)."""
    # header line was split into tokens too; consume up to 9 numbers but
    # the reference sscanf takes whatever the header line holds.
    header = tokens[pos]
    pos += 1
    vals = header.split()
    rows, cols, offset = int(vals[0]), int(vals[1]), int(vals[2])
    trans = int(vals[3]) if len(vals) > 3 else 0
    skip = int(vals[4]) if len(vals) > 4 else 0
    tonic = float(vals[5]) if len(vals) > 5 else 0.0
    pos += skip                      # skip lines
    flat = []
    while len(flat) < rows * cols:
        flat.extend(float(x) for x in tokens[pos].split())
        pos += 1
    mtx = np.array(flat[: rows * cols], np.float64).reshape(rows, cols)
    if trans:
        rows, cols = cols, rows      # logical swap; storage stays row-major
    return {"mtx": mtx, "rows": rows, "cols": cols, "offset": offset,
            "tonic": tonic}, pos


def main():
    out = {}

    # Intron53: 4 PatMat blocks read from one file
    toks = [l for l in (TABDIR / "Intron53").read_text().splitlines()
            if l.strip()]
    pos = 0
    blocks = []
    for _ in range(4):
        blk, pos = read_patmat(toks, pos)
        blocks.append(blk["mtx"].ravel())
    out["i5tab"] = blocks[0][:16]
    out["i3tab"] = blocks[1][:16]
    out["i53tab"] = blocks[2][:256]
    out["i35tab"] = blocks[3][:256]

    for name, fn in (("splice5", "Splice5"), ("splice3", "Splice3")):
        toks = [l for l in (TABDIR / fn).read_text().splitlines()
                if l.strip()]
        blk, _ = read_patmat(toks, 0)
        out[name + "_mtx"] = blk["mtx"]          # (positions, 84)
        out[name + "_offset"] = np.int32(blk["offset"])
        out[name + "_tonic"] = np.float64(blk["tonic"])

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}")
    for k, v in out.items():
        print(" ", k, getattr(v, "shape", v))


if __name__ == "__main__":
    main()
