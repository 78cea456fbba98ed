"""Splice-site signal model for a genomic sequence.

Builds, from encoded genome codes, the per-boundary donor/acceptor
signal arrays used by the spliced DP:

* dinc5[n] — dinucleotide (4*first+second, ACGT=0123) of bases
  (n, n+1); dinc3[n] — of bases (n-2, n-1).  A boundary n means "n
  residues consumed": an intron spanning [d, a) has its GT at
  (d, d+1) = dinc5[d] and its AG at (a-2, a-1) = dinc3[a].
  (reference: src/codepot.cc Intron53N)
* cano5/cano3 — canonicity levels (GT=3, GC=3, AT=2 donors; AG=3,
  AC=2 acceptors with default algmode.any=0); nonzero = usable site.
* sig5/sig3 — mixed signal scores: (1-sss) * dinucleotide table +
  sss * context-PWM score, both scaled by fS = y * f
  (reference: src/codepot.cc Exinon::sig53, Intron53).

The context PWMs are 2nd-order Markov models evaluated per
PatMat::calcPatMat (src/utilseq.cc:882, Mrkv==2 branch), including its
boundary conventions: windows overhanging the right end score the
floor value `cols * min(mtx)`, left overhangs score partially with the
feature rows shifted past the overhang.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import alphabet as ab
from .tables import load_tables

# alprm2 defaults for DNA/DNA spliced alignment (reference simmtx.cc:48
# with crs=1 slot defaults: y=4 via defprm2, sss=defSss[1]=0.5)
DEF_Y = 4.0
DEF_SSS = 0.5

_BAD = 4


def _reduced_table() -> np.ndarray:
    red = np.full(ab.NSIMD + 1, _BAD, np.int8)
    red[ab.encode("A", ab.DNA)[0]] = 0
    red[ab.encode("C", ab.DNA)[0]] = 1
    red[ab.encode("G", ab.DNA)[0]] = 2
    red[ab.encode("T", ab.DNA)[0]] = 3
    return red


_RED = _reduced_table()


def pwm_fit(red: np.ndarray, mtx: np.ndarray, offset: int) -> np.ndarray:
    """calcPatMat (Mrkv=2, single sequence): fit[p] scores the window
    starting at sequence position p - offset; p in 0..len-1."""
    L = len(red)
    cols = mtx.shape[0]
    minval = cols * float(mtx.min())

    bad = red >= _BAD
    r0 = np.where(bad, 0, red).astype(np.int64)
    out = np.empty(L, np.float64)
    for p in range(L):
        n = p - offset
        q = 1 if n + cols >= L else 0       # right-end overrun
        fit = 0.0
        row = -n if n < 0 else 0            # feature rows skip overhang
        s = max(n, 0)
        stop = min(n + cols, L - 2)         # triples must lie inside
        first = True
        while s < stop and row < cols:
            b0 = int(r0[s])
            if first:
                if bad[s]:
                    q += 1
                else:
                    fit += mtx[row, b0]
                    if bad[s + 1]:
                        q += 1
                    else:
                        fit += mtx[row, 4 * b0 + int(r0[s + 1]) + 4]
                first = False
                if bad[s] or bad[s + 1] or bad[s + 2]:
                    pass
                else:
                    fit += mtx[row, 16 * b0 + 4 * int(r0[s + 1])
                               + int(r0[s + 2]) + 20]
                if bad[s + 2]:
                    q += 1
            else:
                if bad[s] or bad[s + 1] or bad[s + 2]:
                    q += 1
                else:
                    fit += mtx[row, 16 * b0 + 4 * int(r0[s + 1])
                               + int(r0[s + 2]) + 20]
            s += 1
            row += 1
        if q:
            fit = minval
        out[p] = fit
    return out


# canonicity levels per dinucleotide, algmode.any == 0, forward strand
# (reference codepot.cc Intron53N switch; jlevelac[0] = jlevelgt[0] = 0)
_CANO5 = np.zeros(16, np.int8)
_CANO3 = np.zeros(16, np.int8)
_DIN = {a + b: 4 * i + j for i, a in enumerate("ACGT")
        for j, b in enumerate("ACGT")}
_CANO5[_DIN["GT"]] = 3
_CANO5[_DIN["GC"]] = 3
_CANO5[_DIN["AT"]] = 2
_CANO3[_DIN["AG"]] = 3
_CANO3[_DIN["AC"]] = 2


@dataclasses.dataclass
class SpliceSignals:
    """Per-boundary splice signals for one genomic sequence."""
    length: int
    dinc5: np.ndarray        # (L+1,) dinucleotide at (n, n+1)
    dinc3: np.ndarray        # (L+1,) dinucleotide at (n-2, n-1)
    cano5: np.ndarray        # (L+1,) donor canonicity level
    cano3: np.ndarray        # (L+1,) acceptor canonicity level
    sig5: np.ndarray         # (L+1,) mixed donor signal at boundary n
    sig3: np.ndarray         # (L+1,) mixed acceptor signal at boundary n
    pair53: np.ndarray       # (16,16) scaled (1-sss)*fS*pair table
    sss3: np.ndarray         # (L+1,) sss-weighted PWM part of sig3
    sss: float
    fS: float

    @classmethod
    def build(cls, codes: np.ndarray, f: float = 1.0, y: float = DEF_Y,
              sss: float = DEF_SSS,
              tabs: dict | None = None) -> "SpliceSignals":
        t = dict(load_tables())
        if tabs:
            t.update(tabs)          # species -T PWM overrides
        L = len(codes)
        red = _RED[np.asarray(codes, np.int64)]
        fS = y * f

        # dinucleotides with ambiguity folded to 'C' and a virtual
        # leading 'C' (reference: nc = 1 initial state)
        dred = np.where(red >= _BAD, 1, red).astype(np.int64)
        prev = np.concatenate([[1], dred[:-1]])
        nc = 4 * prev + dred              # nc[i] = dinuc of (i-1, i)

        dinc5 = np.zeros(L + 1, np.int64)
        dinc3 = np.zeros(L + 1, np.int64)
        dinc5[: L - 1] = nc[1:]           # dinc5[p] = dinuc(p, p+1)
        dinc3[1: L + 1] = nc              # dinc3[p] = dinuc(p-2, p-1)
        cano5 = np.zeros(L + 1, np.int8)
        cano3 = np.zeros(L + 1, np.int8)
        cano5[: L - 1] = _CANO5[dinc5[: L - 1]]
        cano3[2: L + 1] = _CANO3[dinc3[2: L + 1]]

        pwm5 = pwm_fit(red, t["splice5_mtx"], int(t["splice5_offset"]))
        pwm3 = pwm_fit(red, t["splice3_mtx"], int(t["splice3_offset"]))

        sig5 = np.zeros(L + 1)
        sig3 = np.zeros(L + 1)
        sss3 = np.zeros(L + 1)
        sss3[:L] = sss * fS * pwm3
        sig5[:L] = (1.0 - sss) * fS * t["i5tab"][dinc5[:L]] \
            + sss * fS * pwm5
        sig3[:L] = (1.0 - sss) * fS * t["i3tab"][dinc3[:L]] + sss3[:L]
        # boundary L: EXIN data cleared to zero (reference Exinon::clear)
        sig5[L] = (1.0 - sss) * fS * t["i5tab"][dinc5[L]]
        sig3[L] = (1.0 - sss) * fS * t["i3tab"][dinc3[L]]

        pair53 = (1.0 - sss) * fS * t["i53tab"].reshape(16, 16)
        return cls(L, dinc5, dinc3, cano5, cano3, sig5, sig3, pair53,
                   sss3, sss, fS)

    def sig53_pair(self, m: int, n: int) -> float:
        """sig53(m, n, IE53): donor at m, acceptor at n."""
        return float(self.pair53[self.dinc5[m], self.dinc3[n]]
                     + self.sss3[n])

    def is_donor(self, n: int) -> bool:
        return bool(self.cano5[n])

    def is_accpt(self, n: int) -> bool:
        return bool(self.cano3[n])


def pwm_fit_mrkv1(red: np.ndarray, mtx: np.ndarray,
                  offset: int) -> np.ndarray:
    """calcPatMat (Mrkv=1, single sequence; utilseq.cc:899-925): first-
    order nucleotide Markov PWM (rows = 4 + 16 features per position);
    fit[p] scores the window starting at p - offset."""
    L = len(red)
    cols = mtx.shape[0]
    bad = red >= _BAD
    r0 = np.where(bad, 0, red).astype(np.int64)
    out = np.empty(L, np.float64)
    for p in range(L):
        n = p - offset
        q = 1 if n + cols >= L else 0
        fit = 0.0
        m = -n if n < 0 else 0
        s = max(n, 0)
        stop = min(n + cols, L - 1)
        while s < stop and m < cols:
            k = int(r0[s])
            if bad[s]:
                q += 1
            if not q:
                if m == 0:
                    fit += mtx[m, k]
                if bad[s + 1]:
                    q += 1
                k = 4 * k + int(r0[s + 1]) + 4
            if not q:
                fit += mtx[m, k]
            m += 1
            s += 1
        out[p] = fit
    return out
