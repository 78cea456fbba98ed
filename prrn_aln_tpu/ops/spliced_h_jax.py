"""Device (JAX) spliced DP: protein/profile vs genomic DNA (fwd2h).

Banded ``lax.scan`` formulation of the reference Algorithm H
(src/fwd2h.h:131-583 initH/forwardH with the RVPDJ_nv record), matching
``ops/spliced_h_np.forward_h`` cell-for-cell on the default local mode:

* codon-stepped band r = n - 3m; H/G/SJ lanes as (W+6,) field arrays;
* frameshift verticals/horizontals (1/2-nt) as 4-way argmaxes;
* the three per-phase donor candidate lists (NCAND_H=4, INTR=2) are
  fixed-size scan state; phase-1/2 junction codons use precomputed
  (position x base-class) chimeric-codon tables so the merge is pure
  gathers; the sj shadow row carries the phase-2 acceptor;
* traceback via dense event planes (winner, vert/hori choice k,
  per-lane junction merges with donor push-column + crossspj bit, sj
  use) walked on the host into the oracle's knot chain; initH/lastH
  run on the host over the fetched border arrays.

Reference: fwd2h.h:270-583; the NumPy oracle (validated against an
instrumented reference build) is the parity target.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import alphabet as ab
from ..splice import tron
from .spliced_np import NEVSEL, DEAD, DIAG, NEWD, VERT, HORI, SPIN, SPJCI
from .spliced_h_np import (_IS_DIAG, _IS_VERT, _IS_HORI, DIR2NOD,
                           NCAND_H, INTR, HORI3, VERT3)
from .spliced_jax import _pen_arrays, _penalty

F32 = jnp.float32
I32 = jnp.int32

# event bit layout
EVH_WINNER = 0x3
EVH_SJ = 1 << 2
EVH_VK = 3 << 3          # vertical source k (0..3)
EVH_HK = 3 << 5          # horizontal source k (0..3)
EVH_JXH = 1 << 7
EVH_JXF = 1 << 8
EVH_JXG = 1 << 9
EVH_CSH = 1 << 10        # merged lane-0 candidate was crossspj

_DIAG_MASK = np.array([1 if _IS_DIAG[d] else 0 for d in range(16)], np.int32)
_VERT_MASK = np.array([1 if _IS_VERT[d] else 0 for d in range(16)], np.int32)
_HORI_MASK = np.array([1 if _IS_HORI[d] else 0 for d in range(16)], np.int32)
_D2N = np.array(DIR2NOD, np.int32)
_H3 = np.array(HORI3, np.int32)
_V3 = np.array(VERT3, np.int32)


def _codon_tables(b: np.ndarray):
    """Chimeric junction-codon tables (SpJunc/spliceTron semantics):
    A1[J, e3] = aa of codon (b[J-2], b[J-1], base-elem e3; e3=4 none);
    A2[nb, r1] = aa of codon (base-red r1; r1=4 none, b[nb], b[nb+1]);
    e3idx[n]/r1idx[n] index them by the partner position."""
    N = len(b)
    A1 = np.zeros((N + 1, 5), np.int32)
    A2 = np.zeros((N + 1, 5), np.int32)
    red = tron._RED
    elem = tron._ELEM
    gencode = tron.GENCODE

    def at(i):
        return int(b[i]) if 0 <= i < N else ab.NIL

    def aa(c1r, c2, c3e):
        """codon_aa with c1 given as reduced class, c3 as element."""
        if c2 <= ab.GAP:
            return tron.UNP
        r2 = int(red[c2])
        if r2 >= 4:
            return tron.AMB
        if c1r >= 4:
            return int(tron._MOST_ABUND[r2])
        a = int(gencode[16 * c1r + 4 * r2 + c3e]) if c3e < 4 else \
            int(gencode[16 * c1r + 4 * r2])
        if a == tron._A.SER and c2 == 5:
            a = tron.SER2
        elif a == tron.TRM and c2 == 5:
            a = tron.TRM2
        return a

    for p in range(N + 1):
        c1 = at(p - 2)
        c2 = at(p - 1)
        r1 = int(red[c1]) if c1 > ab.GAP else 4
        for e3 in range(5):
            A1[p, e3] = aa(r1, c2, e3)
        c2a = at(p)
        c3a = at(p + 1)
        e3a = int(elem[c3a]) if c3a > ab.GAP else 4
        for r in range(5):
            A2[p, r] = aa(r, c2a, e3a)
    e3idx = np.full(N + 1, 4, np.int32)
    r1idx = np.full(N + 1, 4, np.int32)
    for p in range(N + 1):
        c = at(p)
        e3idx[p] = int(elem[c]) if c > ab.GAP else 4
        c = at(p - 1)
        r1idx[p] = int(red[c]) if c > ab.GAP else 4
    return A1, A2, e3idx, r1idx


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _sweep_h(M, N, lw, up, a_exg, b_exg, lcl,
             H0, G0, qprof, pack, pen_pack):
    a_exgl, a_exgr = a_exg
    b_exgl, b_exgr = b_exg
    W = up - lw + 1
    gop = pack["gop"]
    gep = pack["gep"]
    gap_e1 = pack["gap_e1"]
    gap_e2 = pack["gap_e2"]
    gap_w1 = pack["gap_w1"]
    gap_w2 = pack["gap_w2"]
    gap_w3 = pack["gap_w3"]
    fO = pack["fO"]
    dmask = jnp.asarray(_DIAG_MASK)
    vmask = jnp.asarray(_VERT_MASK)
    hmask = jnp.asarray(_HORI_MASK)
    d2n = jnp.asarray(_D2N)
    trn = pack["trn"]
    sigE = pack["sigE"]
    phs5 = pack["phs5"]
    phs3 = pack["phs3"]
    sig5mix = pack["sig5mix"]
    dinc5 = pack["dinc5"]
    dinc3 = pack["dinc3"]
    pair53 = pack["pair53"]
    sss3 = pack["sss3"]
    apia = pack["api"]
    A1 = pack["A1"]
    A2 = pack["A2"]
    e3idx = pack["e3idx"]
    r1idx = pack["r1idx"]

    slots = jnp.arange(3, W + 3)          # idx(r) = r - lw + 3

    def gapopen(ga, gb, d3):
        pos = (ga >= gb) & (d3 > 0)
        neg = (ga <= gb) & (d3 < 0)
        return jnp.where(pos | neg, gop, F32(0.0))

    def row_step(carry, m):
        (HV, HD, HGA, HGB, HJ, GV, GD, GGA, GGB, GJ,
         SJV, SJD, SJGA, SJGB, SJJ, SJK) = carry
        internal = jnp.logical_or(not a_exgr, m < M)
        pua = jnp.where(internal, gep, F32(0.0))
        n_first = jnp.maximum(3 * m + lw, 1)
        n_last = jnp.minimum(3 * m + up, N)
        qp = qprof[m]
        qp1 = qprof[m + 1]

        # e1 pre-init (fwd2h.h: m==1 && !b_exgl)
        e1V0 = jnp.full(3, NEVSEL, F32)
        e1D0 = jnp.zeros(3, I32)
        e1GA0 = jnp.zeros(3, I32)
        e1GB0 = jnp.zeros(3, I32)
        e1J0 = jnp.zeros(3, I32)
        if not b_exgl:
            r_pre = n_first - 3 * m
            s_pre = jnp.clip(r_pre - lw + 3, 0, W + 5)
            use = (m == 1)
            e1V0 = e1V0.at[2].set(jnp.where(use, gap_w3, e1V0[2]))
            e1D0 = e1D0.at[2].set(jnp.where(use, HD[s_pre], e1D0[2]))
            e1GA0 = e1GA0.at[2].set(jnp.where(use, HGA[s_pre], e1GA0[2]))
            e1GB0 = e1GB0.at[2].set(jnp.where(use, HGB[s_pre], e1GB0[2]))
            e1J0 = e1J0.at[2].set(jnp.where(use, HJ[s_pre], e1J0[2]))

        def cell(ic, s):
            (e1V, e1D, e1GA, e1GB, e1J,
             clV, clJ, clD, clCS, nxs, ncands) = ic
            n = 3 * m + lw + (s - 3)
            valid = (n >= n_first) & (n <= n_last)
            q = jnp.where(valid, (n - n_first) % 3, 0)
            ni = jnp.clip(n, 0, N)
            nm1 = jnp.clip(n - 1, 0, N)
            nm2 = jnp.clip(n - 2, 0, N - 1)

            hqV, hqD, hqGA, hqGB, hqJ = (HV[s], HD[s], HGA[s], HGB[s],
                                         HJ[s])
            sjV, sjDv, sjGA_, sjGB_, sjJ_, sjK_ = (SJV[s], SJD[s],
                                                   SJGA[s], SJGB[s],
                                                   SJJ[s], SJK[s])
            sE = jnp.where(n >= 2, sigE[nm2], F32(0.0))

            # ---- diagonal (or sj crossing) -------------------------
            sj_used = (sjDv != 0) & (n > 2)
            dv = qp[trn[nm2]] + sE
            hV = jnp.where(sj_used, sjV, hqV + dv)
            hGA = jnp.where(sj_used, sjGA_, I32(0))
            hGB = jnp.where(sj_used, sjGB_, I32(0))
            hJ = jnp.where(sj_used, sjJ_, hqJ)
            hDsrc = jnp.where(sj_used, sjDv, hqD)
            hD = jnp.where(dmask[hDsrc & 15] == 1, I32(DIAG), I32(NEWD))
            bad = n <= 2
            hV = jnp.where(bad, F32(NEVSEL), hV)
            hD = jnp.where(bad, I32(0), hD)
            hGA = jnp.where(bad, I32(0), hGA)
            hGB = jnp.where(bad, I32(0), hGB)
            hJ = jnp.where(bad, I32(0), hJ)

            # ---- vertical + frameshift deletions -------------------
            c0 = GV[s + 3] + gapopen(GGA[s + 3], GGB[s + 3], 3)
            f1V_, f1D_ = HV[s + 1], HD[s + 1]
            c1 = f1V_ + jnp.where(vmask[f1D_ & 15] == 1, gap_e1, gap_w1)
            f2V_, f2D_ = HV[s + 2], HD[s + 2]
            c2 = f2V_ + jnp.where(vmask[f2D_ & 15] == 1, gap_e2, gap_w2)
            f3gop = gapopen(HGA[s + 3], HGB[s + 3], 3)
            c3 = HV[s + 3] + f3gop
            cands = jnp.stack([c0, c1, c2, c3])
            vk = jnp.argmax(cands).astype(I32)
            srcV = jnp.stack([GV[s + 3], f1V_, f2V_, HV[s + 3]])[vk]
            srcD = jnp.stack([GD[s + 3], f1D_, f2D_, HD[s + 3]])[vk]
            srcGB = jnp.stack([GGB[s + 3], HGB[s + 1], HGB[s + 2],
                               HGB[s + 3]])[vk]
            srcJ = jnp.stack([GJ[s + 3], HJ[s + 1], HJ[s + 2],
                              HJ[s + 3]])[vk]
            d3v = jnp.where(vk == 0, 3, vk)
            gV = cands[vk] + pua
            gGA = I32(0)
            gGB = srcGB + d3v
            gJ = srcJ
            gD = jnp.asarray(_V3)[vk] | (srcD & SPIN)

            # ---- horizontal + frameshift insertions ----------------
            eqV = e1V[q]
            eqD = e1D[q]
            eqGA = e1GA[q]
            eqGB = e1GB[q]
            eqJ = e1J[q]
            h3gop = gapopen(HGA[s - 3], HGB[s - 3], -3)
            hc0 = jnp.where(n > 2, eqV, F32(NEVSEL))
            hc3 = jnp.where(n > 2, HV[s - 3] + h3gop, F32(NEVSEL))
            hc2 = jnp.where(n > 1, HV[s - 2]
                            + jnp.where(hmask[HD[s - 2] & 15] == 1,
                                        gap_e2, gap_w2), F32(NEVSEL))
            hc1 = HV[s - 1] + jnp.where(hmask[HD[s - 1] & 15] == 1,
                                        gap_e1, gap_w1)
            hcands = jnp.stack([hc0, hc1, hc2, hc3])
            hk = jnp.argmax(hcands).astype(I32)
            hsrcV = jnp.stack([eqV, HV[s - 1], HV[s - 2], HV[s - 3]])[hk]
            hsrcD = jnp.stack([eqD, HD[s - 1], HD[s - 2], HD[s - 3]])[hk]
            hsrcGA = jnp.stack([eqGA, HGA[s - 1], HGA[s - 2],
                                HGA[s - 3]])[hk]
            hsrcJ = jnp.stack([eqJ, HJ[s - 1], HJ[s - 2], HJ[s - 3]])[hk]
            x = hcands[hk] - hsrcV + gep + sE
            d3h = jnp.where(hk == 0, 3, hk)
            neV = hsrcV + x
            neGA = hsrcGA + d3h
            neGB = I32(0)
            neJ = hsrcJ
            spin = hsrcD & SPIN
            neD = jnp.asarray(_H3)[hk] | spin

            # ---- running max ---------------------------------------
            w = I32(0)
            mxV = hV
            w = jnp.where(gV > mxV, I32(2), w)
            mxV = jnp.maximum(gV, mxV)
            w = jnp.where(neV >= mxV, I32(1), w)
            mxV = jnp.maximum(neV, mxV)

            # ---- 3' acceptor merges (per phase) --------------------
            jx = jnp.zeros(3, jnp.bool_)
            jdon = jnp.zeros(4, I32)
            jcs = jnp.zeros(3, jnp.bool_)
            jnb = jnp.zeros(3, I32)       # frm[J] = nb per merged lane
            lvV = jnp.stack([hV, neV, gV])
            sj_nV, sj_nD = F32(NEVSEL), I32(0)
            sj_nJ, sj_nK = I32(0), I32(0)
            sj_nGA, sj_nGB = I32(0), I32(0)
            sj_set = jnp.bool_(False)
            sj_clr = jnp.bool_(False)
            p3 = phs3[ni]
            has_acc = valid & internal & (n < N) & (p3 != -2)
            for pi in range(2):
                if pi == 0:
                    phs = jnp.where(p3 == 2, I32(-1), p3.astype(I32))
                    ap = has_acc
                else:
                    phs = I32(1)
                    ap = has_acc & (p3 == 2)
                nb = n - phs
                nbi = jnp.clip(nb, 0, N)
                sigJ = apia[jnp.clip(3 * m - phs, 0,
                                     apia.shape[0] - 1)]
                li = jnp.clip(phs + 1, 0, 2)
                merged0 = jnp.bool_(False)
                for l in range(NCAND_H):
                    idx = nxs[li, l]
                    act = ap & (l < ncands[li])
                    cV = clV[li, idx]
                    cJ = clJ[li, idx]
                    cD = clD[li, idx]
                    cCS = clCS[li, idx]
                    xm = (cV + sigJ + _penalty(pen_pack, nb - cJ)
                          + pair53[dinc5[jnp.clip(cJ, 0, N)],
                                   dinc3[nbi]] + sss3[nbi])
                    # phase-1 chimeric codon into this row
                    aa1 = A1[jnp.clip(cJ, 0, N), e3idx[nbi]]
                    pm1 = jnp.where((aa1 == tron.TRM) | (aa1 == tron.TRM2),
                                    fO, F32(0.0))
                    xm = xm + jnp.where((cD == 0) & (phs == 1),
                                        pm1 + qp[aa1], F32(0.0))
                    # phase-2: sj shadow candidate
                    aa2 = A2[nbi, r1idx[jnp.clip(cJ, 0, N)]]
                    pm2 = jnp.where((aa2 == tron.TRM) | (aa2 == tron.TRM2),
                                    fO, F32(0.0))
                    y = xm + pm2 + qp1[aa2]
                    nxt_aa = jnp.where(n + 1 < N, trn[jnp.clip(n + 1, 0,
                                                               N - 1)],
                                       I32(ab.AMB))
                    sj_cand = (act & (cD == 0) & (phs == -1)
                               & (y > mxV + qp1[nxt_aa]))
                    sj_nV = jnp.where(sj_cand, y, sj_nV)
                    sj_nJ = jnp.where(sj_cand, nb, sj_nJ)
                    sj_nK = jnp.where(sj_cand, cJ + phs, sj_nK)
                    sj_set = sj_set | sj_cand
                    lane = jnp.clip(cD, 0, 2)
                    better = act & (xm > lvV[lane])
                    lvV = jnp.where(better, lvV.at[lane].set(xm), lvV)
                    jx = jnp.where(better, jx.at[lane].set(True), jx)
                    jdon = jnp.where(better,
                                     jdon.at[lane].set(cJ + phs), jdon)
                    jnb = jnp.where(better, jnb.at[lane].set(nb), jnb)
                    jcs = jnp.where(better & (lane == 0),
                                    jcs.at[0].set(cCS != 0), jcs)
                    merged0 = merged0 | (better & (lane == 0))
                sj_clr = sj_clr | (ap & (phs == -1) & merged0)
                # merged lanes contest mx (strict, lane order)
                mxV = lvV[w]
                for k in range(3):
                    upd = jx[k] & (lvV[k] > mxV)
                    w = jnp.where(upd, I32(k), w)
                    mxV = jnp.where(upd, lvV[k], mxV)
            hV, neV, gV = lvV[0], lvV[1], lvV[2]
            hD = jnp.where(jx[0], hD | SPJCI, hD)
            hJ = jnp.where(jx[0], jnb[0], hJ)
            neD = jnp.where(jx[1], neD | SPJCI, neD)
            neJ = jnp.where(jx[1], jnb[1], neJ)
            gD = jnp.where(jx[2], gD | SPJCI, gD)
            gJ = jnp.where(jx[2], jnb[2], gJ)
            sj_on = sj_set & ~sj_clr
            nsjV = jnp.where(sj_on, sj_nV, F32(NEVSEL))
            nsjD = jnp.where(sj_on, I32(NEWD), I32(0))
            nsjJ = jnp.where(sj_on, sj_nJ, I32(0))
            nsjK = jnp.where(sj_on, sj_nK, I32(0))
            nsjGA = I32(0)
            nsjGB = I32(0)

            # ---- write the cell record ------------------------------
            cVx = jnp.stack([hV, neV, gV])[w]
            cDx = jnp.stack([hD, neD, gD])[w]
            cGAx = jnp.stack([hGA, neGA, gGA])[w]
            cGBx = jnp.stack([hGB, neGB, gGB])[w]
            cJx = jnp.stack([hJ, neJ, gJ])[w]

            # ---- 5' donor pushes (per phase) ------------------------
            p5 = phs5[ni]
            has_don = valid & internal & (n < N) & (p5 != -2)
            lvV2 = jnp.stack([cVx, neV, gV])
            lvD2 = jnp.stack([cDx, neD, gD])
            lvGA2 = jnp.stack([cGAx, neGA, gGA])
            lvGB2 = jnp.stack([cGBx, neGB, gGB])
            lvJ2 = jnp.stack([cJx, neJ, gJ])
            hd = d2n[cDx & 15]
            for pi in range(2):
                if pi == 0:
                    phs = jnp.where(p5 == 2, I32(-1), p5.astype(I32))
                    dp = has_don
                else:
                    phs = I32(1)
                    dp = has_don & (p5 == 2)
                nb = n - phs
                sigJ = sig5mix[jnp.clip(nb, 0, N)]
                li = jnp.clip(phs + 1, 0, 2)
                for k in range(3):
                    kk = I32(k)
                    crossspj = (phs == 1) & (k == 0)
                    ok = dp
                    if k == 0:
                        ok = ok & ((hd == 0) | (phs == 1))
                    fV = jnp.where(crossspj, hqV, lvV2[k])
                    fD = jnp.where(crossspj, hqD, lvD2[k])
                    ok = ok & (fD != 0) & ((fD & SPIN) == 0)
                    thr_on = ~crossspj & (kk != hd) & (hd >= 0)
                    y = mxV + jnp.where(
                        (hd == 0) | (((kk - hd) % 2) != 0),
                        jnp.where(kk // 2 == 1, gop, F32(0.0)),
                        F32(0.0))
                    ok = ok & jnp.where(thr_on, fV > y, True)
                    xp = fV + sigJ
                    ncl = ncands[li]
                    nc1 = jnp.minimum(ncl + 1, NCAND_H)
                    l_start = jnp.where(ncl < NCAND_H, ncl + 1,
                                        I32(NCAND_H))
                    pos = I32(0)
                    broken = jnp.logical_not(ok)
                    nxrow = nxs[li]
                    for l in range(NCAND_H - 1, -1, -1):
                        active = (l < l_start) & ~broken
                        gt = xp > clV[li, nxrow[l]]
                        do_swap = active & gt
                        tl = nxrow[l]
                        tl1 = nxrow[l + 1]
                        nxrow = nxrow.at[l].set(jnp.where(do_swap, tl1,
                                                          tl))
                        nxrow = nxrow.at[l + 1].set(jnp.where(do_swap,
                                                              tl, tl1))
                        stop = active & ~gt
                        pos = jnp.where(stop, I32(l + 1), pos)
                        broken = broken | stop
                    accept = ok & (pos < INTR)
                    slot = nxrow[jnp.clip(pos, 0, NCAND_H)]
                    clV = jnp.where(accept,
                                    clV.at[li, slot].set(xp), clV)
                    clJ = jnp.where(accept,
                                    clJ.at[li, slot].set(nb), clJ)
                    clD = jnp.where(accept,
                                    clD.at[li, slot].set(kk), clD)
                    clCS = jnp.where(accept,
                                     clCS.at[li, slot].set(
                                         jnp.where(crossspj, 1, 0)),
                                     clCS)
                    nxs = jnp.where(ok, nxs.at[li].set(nxrow), nxs)
                    ncands = jnp.where(
                        ok, ncands.at[li].set(
                            jnp.where(accept, nc1, nc1 - 1)), ncands)

            ev = (w | jnp.where(sj_used, EVH_SJ, 0)
                  | (vk << 3) | (hk << 5)
                  | jnp.where(jx[0], EVH_JXH, 0)
                  | jnp.where(jx[1], EVH_JXF, 0)
                  | jnp.where(jx[2], EVH_JXG, 0)
                  | jnp.where(jcs[0], EVH_CSH, 0))
            ev = jnp.where(valid, ev, I32(-1))
            jdon = jdon.at[3].set(jnp.where(sj_used, sjK_, I32(0)))

            # e1 ring writeback
            e1V = e1V.at[q].set(jnp.where(valid, neV, e1V[q]))
            e1D = e1D.at[q].set(jnp.where(valid, neD, e1D[q]))
            e1GA = e1GA.at[q].set(jnp.where(valid, neGA, e1GA[q]))
            e1GB = e1GB.at[q].set(jnp.where(valid, neGB, e1GB[q]))
            e1J = e1J.at[q].set(jnp.where(valid, neJ, e1J[q]))

            outH = tuple(jnp.where(valid, a, o) for a, o in
                         zip((cVx, cDx, cGAx, cGBx, cJx),
                             (HV[s], HD[s], HGA[s], HGB[s], HJ[s])))
            outG = tuple(jnp.where(valid, a, o) for a, o in
                         zip((gV, gD, gGA, gGB, gJ),
                             (GV[s], GD[s], GGA[s], GGB[s], GJ[s])))
            # sj: consumed this cell -> cleared; maybe re-set
            sj_keep = ~valid
            outSJ = (jnp.where(sj_keep, SJV[s],
                               jnp.where(sj_on, nsjV, F32(NEVSEL))),
                     jnp.where(sj_keep, SJD[s],
                               jnp.where(sj_on, nsjD, I32(0))),
                     jnp.where(sj_keep, SJGA[s], nsjGA),
                     jnp.where(sj_keep, SJGB[s], nsjGB),
                     jnp.where(sj_keep, SJJ[s],
                               jnp.where(sj_on, nsjJ, I32(0))),
                     jnp.where(sj_keep, SJK[s],
                               jnp.where(sj_on, nsjK, I32(0))))
            ic2 = (e1V, e1D, e1GA, e1GB, e1J, clV, clJ, clD, clCS,
                   nxs, ncands)
            return ic2, (outH, outG, outSJ, ev, jdon)

        ic0 = (e1V0, e1D0, e1GA0, e1GB0, e1J0,
               jnp.full((3, NCAND_H + 1), NEVSEL, F32),
               jnp.zeros((3, NCAND_H + 1), I32),
               jnp.zeros((3, NCAND_H + 1), I32),
               jnp.zeros((3, NCAND_H + 1), I32),
               jnp.tile(jnp.arange(NCAND_H + 1, dtype=I32), (3, 1)),
               jnp.zeros(3, I32))
        _, (oh, og, osj, ev, jdon) = jax.lax.scan(cell, ic0, slots)
        upd = lambda A, v: A.at[3:W + 3].set(v)
        HV2, HD2, HGA2, HGB2, HJ2 = (upd(HV, oh[0]), upd(HD, oh[1]),
                                     upd(HGA, oh[2]), upd(HGB, oh[3]),
                                     upd(HJ, oh[4]))
        GV2, GD2, GGA2, GGB2, GJ2 = (upd(GV, og[0]), upd(GD, og[1]),
                                     upd(GGA, og[2]), upd(GGB, og[3]),
                                     upd(GJ, og[4]))
        SJ2 = tuple(upd(a, v) for a, v in
                    zip((SJV, SJD, SJGA, SJGB, SJJ, SJK), osj))
        return (HV2, HD2, HGA2, HGB2, HJ2, GV2, GD2, GGA2, GGB2, GJ2,
                *SJ2), (ev, jdon)

    carry0 = (H0["V"], H0["D"], H0["GA"], H0["GB"], H0["J"],
              G0["V"], G0["D"], G0["GA"], G0["GB"], G0["J"],
              jnp.full(W + 6, NEVSEL, F32), jnp.zeros(W + 6, I32),
              jnp.zeros(W + 6, I32), jnp.zeros(W + 6, I32),
              jnp.zeros(W + 6, I32), jnp.zeros(W + 6, I32))
    rows = jnp.arange(1, M + 1)
    carry_f, (evs, jdons) = jax.lax.scan(row_step, carry0, rows)
    return carry_f, evs, jdons


def forward_h_device(qprof, b, exin, ipen, prm, lw, up,
                     exga=(True, True), exgb=(True, True),
                     api=None, lcl=15):
    """Device forwardH + host initH/lastH/traceback; same contract as
    spliced_h_np.forward_h: returns (score, knots)."""
    M = qprof.shape[0] - 2
    N = len(b)
    W = up - lw + 1
    a_exgl, a_exgr = exga
    b_exgl, b_exgr = exgb
    trn = exin.trn

    def idx(r):
        return r - lw + 3

    HV = np.full(W + 6, NEVSEL, np.float32)
    HD = np.zeros(W + 6, np.int32)
    HGA = np.zeros(W + 6, np.int32)
    HGB = np.zeros(W + 6, np.int32)
    HJ = np.zeros(W + 6, np.int32)
    GV = np.full(W + 6, NEVSEL, np.float32)
    GD = np.zeros(W + 6, np.int32)
    GGA = np.zeros(W + 6, np.int32)
    GGB = np.zeros(W + 6, np.int32)
    GJ = np.zeros(W + 6, np.int32)

    def sigS_at(nn):
        if exin.sigS is not None and 0 <= nn < N:
            return float(exin.sigS[nn])
        return 0.0

    def upd_init(i, src, gop, d3):
        HV[i] = HV[src] + gop
        HJ[i] = HJ[src]
        if d3 == 0:
            HGA[i] = HGB[i] = 0
        elif d3 > 0:
            HGA[i], HGB[i] = 0, HGB[src] + d3
        else:
            HGA[i], HGB[i] = HGA[src] - d3, 0

    # ---------------- initH (fwd2h.h:131-200) --------------------------
    # init0_k[slot]: walk bookkeeping for row 0: -1 = own record (DEAD),
    # 1..3 = chained from slot-k, 0 = untouched
    init0_k = np.zeros(W + 6, np.int8)
    HV[idx(0)] = max(sigS_at(1), 0.0)
    HD[idx(0)] = DEAD if a_exgl else DIAG
    init0_k[idx(0)] = -1
    rr = min(up, N)
    if a_exgl:
        for n in range(1, rr + 1):
            i = idx(n)
            if n < 3:
                HV[i] = max(sigS_at(n + 1), 0.0)
                HD[i] = DEAD
                HJ[i] = n
                init0_k[i] = -1
                continue
            x = 0.0
            if lcl & 1:
                x = max(x, sigS_at(n + 1))
            if (lcl & 4) and n < N:
                x = max(x, float(exin.sig3[n]))
            cand = [x,
                    HV[idx(n - 1)] + (prm.gap_w1),
                    HV[idx(n - 2)] + (prm.gap_w2),
                    HV[idx(n - 3)]
                    + prm.term_gap_ext3(n - HJ[idx(n - 3)])
                    + (float(exin.sigE[n - 2]) if n >= 2 else 0.0)]
            k = int(np.argmax(cand))
            if k:
                upd_init(i, idx(n - k), cand[k] - HV[idx(n - k)], -k)
                HD[i] = HORI3[k]
                init0_k[i] = k
            else:
                HV[i] = x
                HD[i] = DEAD
                HJ[i] = n
                HGA[i] = HGB[i] = 0
                init0_k[i] = -1
    # left column
    rr = max(lw, -3 * M)
    m = 0
    initc = {}              # (m, n) -> record knot for b_exgl inits
    for ii in range(1, -rr + 1):
        r = -ii
        i = idx(r)
        if b_exgl:
            HV[i] = 0.0
            HD[i] = DEAD
            HJ[i] = ii % 3
            initc[r] = (m, ii % 3)
        elif ii < 3:
            upd_init(i, idx(r + ii),
                     prm.gap_w1 if ii == 1 else prm.gap_w2, ii)
            HD[i] = VERT + ii
        else:
            src = idx(r + 3)
            gnp = prm.gop if HGA[src] >= HGB[src] else 0.0
            upd_init(i, src, gnp + prm.unp, 3)
            HD[i] = VERT
        if ii % 3 == 0:
            m += 1

    # ---------------- device sweep -------------------------------------
    if api is not None and not isinstance(api, np.ndarray):
        api_arr = np.array([float(api(pt)) for pt in range(3 * M + 4)],
                           np.float32)
    elif api is not None:
        api_arr = np.asarray(api, np.float32)
    else:
        api_arr = np.zeros(3 * M + 4, np.float32)

    A1, A2, e3idx, r1idx = _codon_tables(b)
    pack = dict(
        gop=jnp.float32(prm.gop), gep=jnp.float32(prm.gep),
        gap_e1=jnp.float32(prm.gap_e1), gap_e2=jnp.float32(prm.gap_e2),
        gap_w1=jnp.float32(prm.gap_w1), gap_w2=jnp.float32(prm.gap_w2),
        gap_w3=jnp.float32(prm.gap_w3), fO=jnp.float32(prm.fO),
        trn=jnp.asarray(np.asarray(trn, np.int32)),
        sigE=jnp.asarray(np.asarray(exin.sigE, np.float32)),
        phs5=jnp.asarray(np.asarray(exin.phs5[:N + 1], np.int32)),
        phs3=jnp.asarray(np.asarray(exin.phs3[:N + 1], np.int32)),
        sig5mix=jnp.asarray(np.asarray(exin.sig.sig5, np.float32)),
        dinc5=jnp.asarray(np.asarray(exin.sig.dinc5, np.int64)),
        dinc3=jnp.asarray(np.asarray(exin.sig.dinc3, np.int64)),
        pair53=jnp.asarray(np.asarray(exin.sig.pair53, np.float32)),
        sss3=jnp.asarray(np.asarray(exin.sig.sss3, np.float32)),
        api=jnp.asarray(api_arr),
        A1=jnp.asarray(A1), A2=jnp.asarray(A2),
        e3idx=jnp.asarray(e3idx), r1idx=jnp.asarray(r1idx))
    pen_pack = _pen_arrays(ipen)
    H0 = dict(V=jnp.asarray(HV), D=jnp.asarray(HD), GA=jnp.asarray(HGA),
              GB=jnp.asarray(HGB), J=jnp.asarray(HJ))
    G0 = dict(V=jnp.asarray(GV), D=jnp.asarray(GD), GA=jnp.asarray(GGA),
              GB=jnp.asarray(GGB), J=jnp.asarray(GJ))
    carry_f, evs, jdons = _sweep_h(M, N, lw, up,
                                   (a_exgl, a_exgr), (b_exgl, b_exgr),
                                   lcl, H0, G0,
                                   jnp.asarray(qprof, jnp.float32),
                                   pack, pen_pack)
    fHV = np.asarray(carry_f[0]).astype(np.float64)
    fHD = np.asarray(carry_f[1])
    evs = np.asarray(evs)
    jdons = np.asarray(jdons)

    # ---------------- lastH on host (fwd2h.h:203-268) -------------------
    def sigT_at(nn):
        if exin.sigT is not None and 0 <= nn < N:
            return float(exin.sigT[nn])
        return NEVSEL

    m3 = 3 * M
    rw = max(lw, -m3)
    r9 = N - m3
    # origin cell of the record currently held at each slot
    orig = {}
    for r in range(rw, min(up, N) + 1):
        if r <= r9:
            orig[r] = (M, m3 + r)
        else:
            mm = (N - r) // 3
            orig[r] = (mm, 3 * mm + r)
    extra = {}            # slot r -> extra lastH knot (sigT records)
    lV = fHV.copy()
    lD = fHD.copy()
    glen = [0, 0, 0]
    best_r = r9
    best_val = lV[idx(r9)]
    if a_exgr:
        p = 0
        rf = rw
        while rf <= r9:
            hh = idx(rf)
            if p == 3:
                p = 0
            glen[p] += 3
            nn = rf + m3
            cand = [lV[hh], NEVSEL, NEVSEL]
            if rf - rw >= 3 and lD[hh - 3] != DEAD:
                cand[1] = (lV[hh - 3]
                           + (float(exin.sigE[nn - 2]) if nn >= 2 else 0)
                           + prm.term_gap_ext3(glen[p]))
                if (lcl & 2) and not (lD[hh] & SPIN):
                    cand[2] = lV[hh - 3] + sigT_at(nn - 2)
            k = int(np.argmax(cand))
            if k:
                lV[hh] = cand[k]
                lD[hh] = lD[hh - 3]
                orig[rf] = orig[rf - 3]
                extra[rf] = extra.get(rf - 3)
            elif not _IS_HORI[int(lD[hh]) & 15]:
                glen[p] = 0
            if k == 2:
                lD[hh] = DEAD
                if lV[hh] > best_val:
                    best_val = lV[hh]
                    best_r = rf
                    extra[rf] = (M, nn - 3)
            else:
                if k:
                    lD[hh] = HORI
                if cand[k] > best_val:
                    best_val = cand[k]
                    best_r = rf
            rf += 1
            p += 1
    if b_exgr:
        for r in range(min(up, N), r9, -1):
            x = fHV[idx(r)] + (prm.extra_gop if r % 3 else 0.0)
            if x > best_val:
                best_val = x
                best_r = r
    pdel = best_r - r9
    rf, rwn = M, N
    if pdel > 0:
        rf -= (pdel + 2) // 3
        pp = pdel % 3
        if pp:
            rwn -= (3 - pp)
    elif pdel < 0:
        rwn += pdel

    knots = [(rf, rwn)]
    ex = extra.get(best_r)
    if ex is not None:
        knots.append(ex)
    om, on = orig.get(best_r, (M, m3 + best_r))
    back = _walk_h(evs, jdons, om, on, M, N, lw, up, init0_k, initc,
                   a_exgl, b_exgl, idx)
    knots.extend(back)
    knots.reverse()
    return float(best_val), knots


def _walk_h(evs, jdons, m0, n0, M, N, lw, up, init0_k, initc,
            a_exgl, b_exgl, idx):
    """Backward walk over event planes; knots in backward order."""
    knots = []
    m, n = m0, n0
    state = 0

    def ev_at(mm, nn):
        s = nn - 3 * mm - lw
        mi = mm - 1
        if mi < 0 or s < 0 or s >= evs.shape[1] or mi >= evs.shape[0]:
            return None
        e = int(evs[mi, s])
        return None if e < 0 else e

    def cls_at(mm, nn):
        if mm == 0:
            k = int(init0_k[idx(nn - 0)]) if 0 <= idx(nn) < len(init0_k) \
                else 0
            if k == -1:
                return "dead"
            if k > 0:
                return "hori"
            return "dead"
        e = ev_at(mm, nn)
        if e is None:
            return "dead" if b_exgl else "vert"
        return ("diag", "hori", "vert")[e & EVH_WINNER]

    guard = 0
    while guard < 6 * (M + N + 8):
        guard += 1
        if m <= 0:
            break
        e = ev_at(m, n)
        if e is None:
            break
        s = n - 3 * m - lw
        mi = m - 1
        jd = jdons[mi, s]
        if state == 0:
            w = e & EVH_WINNER
            if w == 0:
                if e & EVH_JXH:
                    knots.append((m, n))
                    knots.append((m, int(jd[0])))
                    if e & EVH_CSH:
                        n = int(jd[0]) - 3
                        m -= 1
                        if cls_at(m, n) != "diag":
                            knots.append((m, n))
                        continue
                    n = int(jd[0])
                    continue
                if e & EVH_SJ:
                    knots.append((m - 1, int(jd[3])))
                    m -= 1
                    n = int(jd[3])
                    continue
                if cls_at(m - 1, n - 3) != "diag":
                    knots.append((m - 1, n - 3))
                m -= 1
                n -= 3
                continue
            state = int(w)
            continue
        if state == 1:
            if e & EVH_JXF:
                knots.append((m, n))
                knots.append((m, int(jd[1])))
                n = int(jd[1])
                continue
            hk = (e & EVH_HK) >> 5
            if hk == 0:
                n -= 3
                continue
            n -= (1, 1, 2, 3)[hk]
            state = 0
            continue
        # state 2: vertical
        if e & EVH_JXG:
            knots.append((m, n))
            knots.append((m, int(jd[2])))
            n = int(jd[2])
            continue
        vk = (e & EVH_VK) >> 3
        if vk == 0:
            m -= 1
            continue
        n -= (0, 2, 1, 0)[vk]
        m -= 1
        state = 0
        continue

    # init records
    if m == 0:
        # follow the init-row chain to its DEAD record
        nn = n
        guard = 0
        while guard < W_GUARD(N):
            guard += 1
            i = idx(nn)
            if not (0 <= i < len(init0_k)):
                break
            k = int(init0_k[i])
            if k > 0:
                nn -= k
                continue
            break
        knots.append((0, nn))
    else:
        r = n - 3 * m
        rec = initc.get(r)
        if rec is not None:
            knots.append(rec)
        else:
            knots.append((m, max(n, 0)))
    return knots


def W_GUARD(N):
    return N + 8
