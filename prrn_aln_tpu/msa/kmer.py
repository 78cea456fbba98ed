"""k-mer composition machinery: reduced alphabets, spaced seeds, and the
qdiv composition divergence.

Reference semantics: src/bitpat.{h,cc} (ReducWord / Bitpat word streams,
SEB reduced-alphabet series), src/qdiv.cc (Kcomp counts and the qdiv
similarity with its calibrated log transform).  Used as the selectivity
filter for the sparse distance graph of the sl-forest scale-out path —
exactness requirements are soft (SURVEY A.8): it decides which edges get
DP-scored, not the scores themselves.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from .. import alphabet as ab

# SEB reduced-alphabet series (bitpat.cc DefConvPat); '|' separates classes
SEB_PATTERNS = {
    6: "ASJT|CP|DEHKNQR|FWY|G|ILMV|X|U",
    18: "A|C|DE|Q|F|Y|G|H|IV|K|R|L|M|N|P|SJ|T|W|X|U",
    20: "A|R|N|D|C|Q|E|G|H|I|L|K|M|F|P|SJ|T|W|Y|V|X|U",
}
FOURN_PATTERN = "A|C|G|TU|BDHKMNRSJVWXY"

# sltree defaults (sltree.cc:272-281)
PROT_K = 4
PROT_ALPHA = 18
PROT_SEEDS = ("11101", "11011")
DNA_K = 8
DNA_SEEDS = ("110011101", "11101011")


def reduced_table(molc: int, nalpha: int = 0) -> tuple[np.ndarray, int]:
    """Residue-code -> reduced-class table; unmapped entries = -1."""
    if molc == ab.PROTEIN:
        pat = SEB_PATTERNS[nalpha or PROT_ALPHA]
    else:
        pat = FOURN_PATTERN
    cls_of_letter = {}
    cls = 0
    for chunk in pat.split("|"):
        for ch in chunk:
            cls_of_letter[ch] = cls
        cls += 1
    tab = np.full(32, -1, np.int32)
    if molc == ab.PROTEIN:
        decode = ab.AMINO_DECODE
        for code in range(ab.ALA, ab.ASIMD):
            ch = decode[code] if code < len(decode) else "?"
            if ch in cls_of_letter:
                tab[code] = cls_of_letter[ch]
        # X and U merge into one trailing class (ReducWord, bitpat.cc:88)
        tab[tab == cls - 1] = cls - 2
        n_classes = cls - 1
    else:
        decode = ab.NUCL_DECODE
        for code in range(2, ab.NSIMD):
            ch = decode[code]
            if ch in cls_of_letter:
                tab[code] = cls_of_letter[ch]
        # the catch-all (ambiguity) class breaks words
        tab[tab == cls - 1] = -1
        n_classes = cls - 1
    return tab, n_classes


@dataclasses.dataclass
class KmerCounts:
    counts: list      # per-seed dense count arrays (int32)
    total: int        # total counted words
    many: int = 1


def count_kmers(codes: np.ndarray, molc: int, k: int | None = None,
                seeds: tuple[str, ...] | None = None,
                nalpha: int = 0) -> KmerCounts:
    """Spaced-seed word counts of one sequence (gaps break windows).
    Counting runs in the native host library when available."""
    from .. import native
    if k is None:
        k = PROT_K if molc == ab.PROTEIN else DNA_K
    if seeds is None:
        seeds = PROT_SEEDS if molc == ab.PROTEIN else DNA_SEEDS
        if not seeds:
            seeds = ("1" * k,)
    tab, nalpha_eff = reduced_table(molc, nalpha)
    red = tab[np.clip(codes, 0, 31)].astype(np.int8)
    counts = []
    total = 0
    for seed in seeds:
        c, t = native.kmer_count(red, seed, nalpha_eff)
        counts.append(c)
        total += t
    return KmerCounts(counts=counts, total=total)


# calibrated log-transform parameters (qdiv.cc:185-191)
_QDIV_PARAM = {0: (0.92042, 0.18677), 1: (0.34576, 0.07108),
               2: (0.22333, 0.03164), 3: (0.18704, 0.00501)}


def qdiv(a: KmerCounts, b: KmerCounts, molc: int,
         pam_corrected: bool = True) -> float:
    """Composition divergence (qdiv.cc:179-230), in [0, ~1]."""
    from .. import native
    s = 0
    for ca, cb in zip(a.counts, b.counts):
        s += native.kmer_min_overlap(ca, cb, a.many, b.many)
    if a.total and b.total:
        denom = min(a.total / a.many, b.total / b.many) * a.many * b.many
        f = s / denom
    else:
        f = 0.0
    d = 1.0 - f
    if not pam_corrected:
        return d
    p0, p1 = _QDIV_PARAM[3]
    f2 = p0 * math.log((p1 + f) / (p1 + 1.0)) + 1.0
    d2 = 1.0 - f2
    if molc == ab.PROTEIN:
        # Qpamd with default corr_mhits=0: pamcorrect is linear (100*x)
        return max(d2, 0.0)
    return _jukes_cantor(d2)


def _jukes_cantor(nid: float) -> float:
    if nid <= 0.0:
        return 0.0
    x = 1.0 - 20.0 / 19.0 * nid
    if x <= 0.0:
        return 1024.0
    return -19.0 / 20.0 * math.log(x)


def _pamcorrect(x: float) -> float:
    """divseq.cc pamcorrect via dvp2pam interpolation (simmtx.cc:68-78)."""
    if x >= 1.0:
        return 300.0
    if x <= 0.7:
        y = 1.0 - (0.987151 + 0.220560 * x) * x
    else:
        y = -1.260444 + (8.603930 - (13.869219 - 6.521836 * x) * x) * x
    if y <= 0.0:
        return 300.0
    pam = -100.0 * math.log(y)
    return min(pam, 300.0)


def kmer_distance_matrix(seq_codes: list[np.ndarray], molc: int,
                         **kw) -> np.ndarray:
    """Condensed all-pairs qdiv distances (x100 like the DP distances)."""
    kcs = [count_kmers(s, molc, **kw) for s in seq_codes]
    n = len(kcs)
    out = np.zeros(n * (n - 1) // 2)
    k = 0
    for j in range(1, n):
        for i in range(j):
            out[j * (j - 1) // 2 + i] = 100.0 * qdiv(kcs[i], kcs[j], molc)
    return out
