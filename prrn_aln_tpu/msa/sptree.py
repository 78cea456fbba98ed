"""Tree-structured weighted sum-of-pairs scoring (Sptree).

Reference: ``Sptree::sptree`` / ``calcscore_grp`` (src/fspscore.cc:
624-659, 783-860) — instead of scoring all N(N-1)/2 row pairs
independently, walk the guide tree once: every internal node scores its
left subtree against its right subtree in one vectorized column pass,
with member weights rescaled by the node's volume.  Three-point pair
weights factorize exactly over the LCA (``pwt[i,j] =
wheight[i]*wheight[j] / vol[lca]^2``, phyl.cc:703-786), so the result
equals the naive ``wsp.wsp_score(pairwt=...)`` to float precision while
replacing the per-pair Python loop with per-node einsums (the
substitution term is one frequency-profile contraction per node — MXU
shaped) and a broadcast gap-run comparison (the ``crg`` counting of
maln2.cc:510-530 evaluated on precomputed per-row gap-run lengths).

The reference validates the same equivalence with its built-in
TST_PS_ALG harness (fspscore.cc:924-991); tests/test_sptree.py mirrors
that comparison.
"""

from __future__ import annotations

import numpy as np

from .. import alphabet as ab
from .msa import Msa
from .tree import Tree, upgma, calc_pair_weights
from .distance import msa_distance_matrix


def _run_lengths(gap: np.ndarray) -> np.ndarray:
    """gl[i, c] = length of row i's gap run ending at column c-1
    (0 at c=0; reset after each residue)."""
    n, L = gap.shape
    gl = np.zeros((n, L + 1), np.int32)
    for c in range(L):
        gl[:, c + 1] = np.where(gap[:, c], gl[:, c] + 1, 0)
    return gl[:, :-1]          # state *entering* each column


def sptree_wsp(msa: Msa, mtx: np.ndarray, v: float,
               tree: Tree | None = None, spb: float = 0.0,
               col_chunk: int = 512):
    """Exact WSP with three-point pair weights, computed tree-wise.
    Returns (score, pairwt) so callers can reuse the weights."""
    n = msa.many
    codes = msa.codes
    L = msa.length
    if tree is None:
        d = msa_distance_matrix(codes)
        tree = upgma(d, n)
    pairwt, wheight, vol, cur = calc_pair_weights(tree, full=True)

    gap = codes <= ab.GAP
    res = ~gap
    gapf = gap.astype(np.float32)
    resf = res.astype(np.float32)
    gl = _run_lengths(gap)                      # (n, L) entering state
    dim = mtx.shape[0]
    gg = float(mtx[ab.GAP, ab.GAP])
    # one-hot row images, built once: OH[i] = (L, dim)
    OH = np.eye(dim, dtype=np.float32)[codes]
    mtx32 = mtx.astype(np.float32)

    def leaves_under(node):
        out, stack = [], [node]
        while stack:
            k = stack.pop()
            if tree.is_leaf(k):
                out.append(k)
            else:
                stack.append(tree.left[k])
                stack.append(tree.right[k])
        return out

    total = 0.0
    stack = [tree.root]
    order = []
    while stack:
        k = stack.pop()
        if not tree.is_leaf(k):
            order.append(k)
            stack.append(tree.left[k])
            stack.append(tree.right[k])

    for node in order:
        ll = leaves_under(tree.left[node])
        rr = leaves_under(tree.right[node])
        fl = wheight[ll] / vol[node]
        fr = wheight[rr] / vol[node]

        # substitution term: per-column weighted frequency contraction
        fl32 = fl.astype(np.float32)
        fr32 = fr.astype(np.float32)
        FL = np.tensordot(fl32, OH[ll], axes=(0, 0))     # (L, dim)
        FR = np.tensordot(fr32, OH[rr], axes=(0, 0))
        sub = float(np.einsum("lc,cd,ld->", FL, mtx32, FR))
        if gg != 0.0:
            # remove the both-gap pairs the projection drops
            wgl = fl32 @ gapf[ll]
            wgr = fr32 @ gapf[rr]
            sub -= gg * float(wgl @ wgr)

        # gap opens (crg counting): pair (i gap, j res) opens at c iff
        # gl_j >= gl_i entering c (the whole of i's run so far was
        # dropped as both-gap)
        wgapL = fl32[:, None] * gapf[ll]
        wresL = fl32[:, None] * resf[ll]
        wgapR = fr32[:, None] * gapf[rr]
        wresR = fr32[:, None] * resf[rr]
        glL = gl[ll]
        glR = gl[rr]
        for lo in range(0, L, col_chunk):
            hi = min(lo + col_chunk, L)
            ge = glR[None, :, lo:hi] >= glL[:, None, lo:hi]  # (nl,nr,C)
            opensA = np.einsum("ic,ijc,jc->", wgapL[:, lo:hi], ge,
                               wresR[:, lo:hi])
            opensB = np.einsum("ic,ijc,jc->", wresL[:, lo:hi], ~ge,
                               wgapR[:, lo:hi])
            # ties (gl equal) open on both sides
            eq = glR[None, :, lo:hi] == glL[:, None, lo:hi]
            opensB += np.einsum("ic,ijc,jc->", wresL[:, lo:hi], eq,
                                wgapR[:, lo:hi])
            sub -= v * float(opensA + opensB)
        total += sub

    if spb > 0 and msa.eij is not None:
        from .sigii import sp_sigii
        total += sp_sigii(codes, msa.eij, pairwt, spb, msa.step)
    return total, pairwt
