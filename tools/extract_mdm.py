#!/usr/bin/env python3
"""Extract the PAM mutation-data-matrix series into a NumPy asset.

The reference suite ships Dayhoff/JTT mutation data and generates a binary
``mdm_mtx`` table at install time (reference: src/makmdm.cc, installed via
Makefile.in:61).  That file is a flat array of float64:

    [PAMLEVELS+1 = 31][AASCMB = 300]   lower-triangular log-odds matrices,
                                       level ii == PAM 10*ii (level 0 unused)
    [30]                               normalization factors (nrmlf series)
    [30]                               average-trace series (avtrc)

with AAS = 24 codes (gap, X, the 20 amino acids, B, U/Z) and the triangle
enumerated as k = 0.. for i in 0..23 for j in 0..i, mapping to matrix codes
(i+1, j+1) (reference: src/simmtx.cc:282-334 Pmtx).

This script reads an existing mdm_mtx (pass its path, e.g. from an installed
reference table directory) and stores the numerical tables — public
scientific data (Dayhoff 1978 / JTT 1992 PAM log-odds) — as
``prrn_aln_tpu/data/mdm_series.npz``.

Usage:  python tools/extract_mdm.py /path/to/mdm_mtx
"""

import sys
from pathlib import Path

import numpy as np

PAMLEVELS = 30
AAS = 24
AASCMB = AAS * (AAS + 1) // 2  # 300


def main(src: str) -> None:
    raw = np.fromfile(src, dtype=np.float64)
    need = (PAMLEVELS + 1) * AASCMB + 2 * PAMLEVELS
    if raw.size < need:
        raise SystemExit(f"{src}: too small ({raw.size} < {need} doubles)")
    tri = raw[: (PAMLEVELS + 1) * AASCMB].reshape(PAMLEVELS + 1, AASCMB)
    nrmlf = raw[(PAMLEVELS + 1) * AASCMB:][:PAMLEVELS]
    avtrc = raw[(PAMLEVELS + 1) * AASCMB + PAMLEVELS:][:PAMLEVELS]
    out = Path(__file__).resolve().parent.parent / "prrn_aln_tpu" / "data"
    out.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out / "mdm_series.npz",
                        tri=tri, nrmlf=nrmlf, avtrc=avtrc)
    print(f"wrote {out/'mdm_series.npz'}: tri{tri.shape} "
          f"nrmlf{nrmlf.shape} avtrc{avtrc.shape}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/reftable/mdm_mtx")
