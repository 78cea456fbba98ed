"""Seeded piecewise alignment: k-mer HSP chaining + inter-anchor DP.

The reference splits long, similar pairs at Wilbur-Lipman HSP chains
and runs full DP only between them (seededB_ng, src/fwd2b1.cc:1160;
Wlp/JUXT machinery, src/wln.cc:904).  TPU re-design: the k-mer hits
and diagonal-run merging are vectorized host numpy; the chain is a
sparse LIS-style DP over a few hundred HSPs; the inter-anchor gaps run
as SMALL banded launches of the group kernel (batched in one
group_align_batch call when shapes bucket together), and the anchor
interiors contribute exact-match diagonal runs directly.

Work scales with sum(inter-anchor areas) instead of the full band —
superlinear savings as similarity grows.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import alphabet as ab
from ..msa.msa import Msa
from .window import stripe
from . import group as gops


@dataclasses.dataclass
class Hsp:
    ai: int      # start in a (0-based)
    bi: int      # start in b
    length: int  # exact-match run length

    @property
    def diag(self) -> int:
        return self.bi - self.ai


def find_hsps(a: np.ndarray, b: np.ndarray, k: int = 12,
              max_occ: int = 4) -> list[Hsp]:
    """Maximal exact-match runs >= k via k-mer hashing (the role of
    Wlp lookup tables, wln.h:55-100).  Vectorized: pack k-mers as
    integers, join via sorting, merge same-diagonal overlapping hits.
    ``max_occ`` drops repetitive words (reference MaxOcc-style
    filtering)."""
    def words(x):
        x = np.asarray(x, np.int64)
        L = len(x)
        if L < k:
            return np.empty(0, np.int64)
        w = np.zeros(L - k + 1, np.int64)
        for j in range(k):
            w = w * 32 + x[j:j + L - k + 1]
        return w

    wa, wb = words(a), words(b)
    if not len(wa) or not len(wb):
        return []
    sa = np.argsort(wa, kind="stable")
    was = wa[sa]
    # positions of each b-word in the sorted a-words
    lo = np.searchsorted(was, wb, side="left")
    hi = np.searchsorted(was, wb, side="right")
    cnt = hi - lo
    keep = (cnt > 0) & (cnt <= max_occ)
    hits_ai = []
    hits_bi = []
    for j in np.nonzero(keep)[0]:
        hits_ai.append(sa[lo[j]:hi[j]])
        hits_bi.append(np.full(hi[j] - lo[j], j))
    if not hits_ai:
        return []
    ai = np.concatenate(hits_ai)
    bi = np.concatenate(hits_bi)
    diag = bi - ai
    order = np.lexsort((ai, diag))
    ai, bi, diag = ai[order], bi[order], diag[order]
    # merge overlapping/adjacent same-diagonal hits into maximal runs
    new = np.ones(len(ai), bool)
    new[1:] = (diag[1:] != diag[:-1]) | (ai[1:] > ai[:-1] + k)
    run_id = np.cumsum(new) - 1
    out = []
    for r in range(run_id[-1] + 1):
        m = run_id == r
        a0 = int(ai[m][0])
        a1 = int(ai[m][-1]) + k
        out.append(Hsp(a0, a0 + int(diag[m][0]), a1 - a0))
    return out


def chain_hsps(hsps: list[Hsp], gap_cost: float = 0.2) -> list[Hsp]:
    """Best colinear chain (sparse DP, the role of JUXT chaining in
    wln.cc): maximize sum of lengths - gap_cost * diagonal drift."""
    if not hsps:
        return []
    hs = sorted(hsps, key=lambda h: (h.ai, h.bi))
    n = len(hs)
    best = np.array([float(h.length) for h in hs])
    prev = np.full(n, -1)
    for j in range(n):
        hj = hs[j]
        for i in range(j):
            hi_ = hs[i]
            if hi_.ai + hi_.length <= hj.ai and \
                    hi_.bi + hi_.length <= hj.bi:
                cand = best[i] + hj.length \
                    - gap_cost * abs(hj.diag - hi_.diag)
                if cand > best[j]:
                    best[j] = cand
                    prev[j] = i
    j = int(np.argmax(best))
    chain = []
    while j >= 0:
        chain.append(hs[j])
        j = prev[j]
    chain.reverse()
    return chain


def _sub_msa(m: Msa, lo: int, hi: int, dim: int) -> Msa:
    sub = Msa(codes=m.codes[:, lo:hi], molc=m.molc, names=list(m.names))
    sub.prepare(dim)
    return sub


def seeded_align(A: Msa, B: Msa, mtx, u: float, v: float,
                 k: int = 12, trim: int | None = None,
                 min_anchor: int = 32, sh: int = -50,
                 ls: int = 1, u1: float = 0.6, k1: int = 7):
    """Global alignment of a long similar pair via anchors.

    Returns (score, skl) where score is the exact re-scored piecewise
    sum (anchor matches + sub-DP scores + inter-piece gap stitches are
    all inside the pieces, so the sum equals a full DP score whenever
    the optimal path passes through the anchors).
    """
    a = A.codes[0].astype(np.int64)
    b = B.codes[0].astype(np.int64)
    if trim is None:
        trim = k
    anchors = [h for h in chain_hsps(find_hsps(a, b, k=k))
               if h.length >= min_anchor + 2 * trim]
    anchors = [Hsp(h.ai + trim, h.bi + trim, h.length - 2 * trim)
               for h in anchors]
    if not anchors:
        wdw = stripe(A.length, B.length, sh)
        return gops.group_align(A, B, mtx, u=u, v=v, wdw=wdw,
                                ls=ls, u1=u1, k1=k1)

    dim = mtx.shape[0]
    # first pass: collect all two-sided pieces so the sub-DPs run as
    # ONE batched launch (per-piece launches pay a compile+dispatch
    # round-trip each on a tunneled device)
    spans = []
    pieces = []
    pa = pb = 0
    for h in anchors + [None]:
        ea, eb = (A.length, B.length) if h is None else (h.ai, h.bi)
        spans.append((pa, ea, pb, eb, h))
        if ea > pa and eb > pb:
            pieces.append((_sub_msa(A, pa, ea, dim),
                           _sub_msa(B, pb, eb, dim)))
        if h is not None:
            pa, pb = h.ai + h.length, h.bi + h.length
    sub_results = []
    if pieces:
        if ls >= 3:
            # the batched engine is single-affine; route double-affine
            # sub-DPs through group_align's ls3 lanes
            sub_results = [gops.group_align(
                pA, pB, mtx, u=u, v=v,
                wdw=stripe(max(pA.length, 1), max(pB.length, 1), sh),
                ls=ls, u1=u1, k1=k1) for pA, pB in pieces]
        else:
            max_len = max(m.length for ab_ in pieces for m in ab_)
            sub_results = gops.group_align_batch(
                pieces, mtx, u=u, v=v, sh=sh, pads=(1, max_len))

    score = 0.0
    moves = []          # merged move list over the whole pair
    pi = 0
    for pa, ea, pb, eb, h in spans:
        if ea > pa and eb > pb:
            s, skl = sub_results[pi]
            pi += 1
            score += s
            moves.extend(_skl_to_moves(skl))
        elif eb > pb:               # pure insertion in b
            score += -_gapcost(eb - pb, u, v, ls, u1, k1)
            moves.extend([HORI_MV] * (eb - pb))
        elif ea > pa:               # pure deletion (gap in b)
            score += -_gapcost(ea - pa, u, v, ls, u1, k1)
            moves.extend([VERT_MV] * (ea - pa))
        if h is not None:
            # anchor interior: exact diagonal, matrix diagonal scores
            seg = a[h.ai:h.ai + h.length]
            score += float(mtx[seg, b[h.bi:h.bi + h.length]].sum())
            moves.extend([DIAG_MV] * h.length)
    skl = gops._moves_to_skl(np.array(moves, np.int8), A.length,
                             B.length)
    return score, skl


def _gapcost(L: int, u: float, v: float, ls: int, u1: float,
             k1: int) -> float:
    """Run cost of an unbroken gap of length L: single affine, or the
    better of the two affine lines under the -yl3 double-affine model
    (long-gap open v2 = v + (u-u1)*k1, extend u1; fwd2c.h g2/f2
    lanes)."""
    c = v + u * L
    if ls >= 3:
        c = min(c, (v + (u - u1) * k1) + u1 * L)
    return c


DIAG_MV, VERT_MV, HORI_MV = 0, 1, 2


def _skl_to_moves(skl):
    out = []
    for (m0, n0), (m1, n1) in zip(skl, skl[1:]):
        dm, dn = m1 - m0, n1 - n0
        if dm and dn:
            out.extend([DIAG_MV] * dm)
        elif dm:
            out.extend([VERT_MV] * dm)
        else:
            out.extend([HORI_MV] * dn)
    return out
