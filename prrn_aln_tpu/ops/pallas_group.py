"""Pallas TPU kernel: banded group-to-group DP (the refinement engine).

Anti-diagonal wavefront over band slots, one pair per grid row.  This
is the Pallas re-formulation of the ``lax.scan`` engine in
``ops/group.py::_wavefront_core`` (itself the TPU redesign of the
reference's candidate-list group DP, src/fwd2c.h:232-356, with the
exact per-member gap-run accounting of ``DPunit_nv``,
src/fwd2c.cc:106-147).  Scores, direction planes and tie order are
bit-identical to the scan engine; the speedup comes from keeping the
whole per-step state in VMEM and replacing XLA's per-step gathers with
two vectorized rolls:

* **Slots ride lanes.**  Band slot s holds diagonal r = lw-1+s; at
  step d the live cell is (m, n) = ((d-r)/2, (d+r)/2).  All per-slot
  state (H/G/F/G2/F2 values, per-member gap-run lengths gla/glb) lives
  in VMEM registers across the sweep.
* **Doubled column stacks kill the gathers.**  Every per-column input
  (weighted member masks, gap densities, profile channels, thickness,
  eij densities) is packed into one channel stack per side, doubled
  along the length axis (value of column m at positions 2m and 2m+1)
  and — for the A side — reversed.  Then the per-slot gather
  ``col[m(d,s)]`` collapses to ONE `pltpu.roll` of the stack per step
  (2m = d-r is *linear in the lane index*), the trick the pairwise
  kernel uses for band packing.
* **The score image never exists.**  S[m-1,n-1] = sum_c CA[c]*CB[c] is
  contracted per step from the sliced profile channels (a sublane
  reduction), so the O(La*Lb) image costs neither HBM nor bandwidth.
* **crg as sublane blobs.**  The pairwise new-gap counts (crg2,
  fwd2c.cc:106-147) are (an*bn, nslot) compare-multiply-reduce blobs:
  jnp.repeat x pltpu.repeat build the member-pair axis on sublanes.

Outputs (score, dirs, opens) feed the same device-side traceback walk
as the scan engine (``ops/group.py::_traceback_device``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .group_np import DIAG, VERT, HORI, VERT2, HORI2

NEVSEL = -1.0e30
D_DIAG, D_VERT, D_HORI = 1, 2, 3
NPRM = 16          # scalar parameter lanes per pair
DSTEP = 64         # wavefront steps per grid block


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def stack_layout(an: int, C: int):
    """Row offsets of the per-side channel stack (all 8-aligned)."""
    Cp = _pad_to(C, 8)
    off = {}
    off["wna"] = 0
    off["wgd"] = an
    off["wpg"] = 2 * an
    off["S"] = 3 * an
    off["na"] = 3 * an + Cp
    off["cf"] = 4 * an + Cp
    off["ef"] = 4 * an + Cp + 1
    off["e0"] = 4 * an + Cp + 2
    rows = _pad_to(4 * an + Cp + 3, 8)
    return off, rows, Cp


def build_stack(cols_na, cols_gd, cols_pg, w, Csh, cf, ef, e0sh,
                an: int, C: int, flip: bool):
    """Host-side packer: doubled (and for the A side reversed) channel
    stack (rows, X2) from the per-column arrays.

    cols_* are (L+1, an); Csh is (L+1, C) profile channels shifted so
    row m holds profile column m-1; cf/ef (L+1,); e0sh (L+1,).
    """
    off, rows, Cp = stack_layout(an, C)
    L1 = cols_na.shape[0]
    st = np.zeros((rows, L1), np.float32)
    st[off["wna"]:off["wna"] + an] = (cols_na * w[None, :]).T
    st[off["wgd"]:off["wgd"] + an] = (cols_gd * w[None, :]).T
    st[off["wpg"]:off["wpg"] + an] = (cols_pg * w[None, :]).T
    st[off["S"]:off["S"] + C] = Csh.T
    st[off["na"]:off["na"] + an] = cols_na.T
    st[off["cf"]] = cf
    st[off["ef"]] = ef
    st[off["e0"]] = e0sh
    dbl = np.repeat(st, 2, axis=1)                 # column m at 2m, 2m+1
    X = _pad_to(dbl.shape[1], 128)
    out = np.zeros((rows, X), np.float32)
    out[:, :dbl.shape[1]] = dbl
    if flip:
        out = out[:, ::-1].copy()
    return out


def _kernel(prm_ref, fa_ref, fb_ref, st0_ref, gl0_ref,
            score_ref, dirs_ref, opens_ref, stf_ref, glf_ref,
            st_ref, gl_ref,
            *, an, bn, Cp, nslot, nsteps, XA, XB, nD, ls3):
    """Grid step (pair b, step-block dblk): DSTEP wavefront steps.

    prm_ref (1, NPRM) SMEM scalars [la, lb, lw, up, u, gop_scale,
    v2divv1, u2divu1, k1]; fa_ref/fb_ref (1, rows, X) channel stacks
    (A doubled+flipped, B doubled); st_ref (8, nslot) packed lane
    values [Hval Gval Fval G2val F2val Hdir]; gl_ref (10*an, nslot)
    gap-run states [Hgla Hglb Ggla Gglb Fgla Fglb G2gla G2glb F2gla
    F2glb].
    """
    dblk = pl.program_id(1)
    offA, rowsA, _ = stack_layout(an, Cp)
    offB, rowsB, _ = stack_layout(bn, Cp)

    la = prm_ref[0, 0, 0]
    lb = prm_ref[0, 0, 1]
    lw = prm_ref[0, 0, 2]
    up = prm_ref[0, 0, 3]
    u = prm_ref[0, 0, 4]
    gop = prm_ref[0, 0, 5]
    v2divv1 = prm_ref[0, 0, 6]
    u2divu1 = prm_ref[0, 0, 7]
    k1 = prm_ref[0, 0, 8]
    lwi = lw.astype(jnp.int32)

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nslot), 1)
    r_all = lwi - 1 + s_iota                       # (1, nslot) diagonals
    r_f = r_all.astype(jnp.float32)
    j_last = nslot - 1

    d0 = prm_ref[0, 0, 9].astype(jnp.int32)   # step offset (chunked
    # linear-space runs resume from a checkpointed carry)

    @pl.when(dblk == 0)
    def _init():
        st_ref[...] = st0_ref[0]
        gl_ref[...] = gl0_ref[0]

    def shift_lo(x, fill):
        r = pltpu.roll(x, 1, axis=1)
        return jnp.where(s_iota == 0, fill, r)

    def shift_hi(x, fill):
        r = pltpu.roll(x, nslot - 1, axis=1)
        return jnp.where(s_iota == j_last, fill, r)

    def rep_a(x):                                  # (an,ns) -> (an*bn,ns)
        return jnp.repeat(x, bn, axis=0)

    def tile_b(x):                                 # (bn,ns) -> (an*bn,ns)
        return pltpu.repeat(x, an, axis=0)

    def contract(W, cmp_):
        return jnp.sum(W * cmp_, axis=0, keepdims=True) * gop

    vals0 = st_ref[...]
    gl0 = gl_ref[...]

    def unpack(vals, gl):
        Hval = vals[0:1]
        Gval = vals[1:2]
        Fval = vals[2:3]
        G2val = vals[3:4]
        F2val = vals[4:5]
        Hdir = vals[5:6]
        parts = [gl[k * an:(k + 1) * an] for k in range(10)]
        return (Hval, Gval, Fval, G2val, F2val, Hdir), parts

    dsub_iota = jax.lax.broadcasted_iota(jnp.int32, (DSTEP, nslot), 0)

    def step(i, carry):
        (Hval, Gval, Fval, G2val, F2val, Hdir,
         Hgla, Hglb, Ggla, Gglb, Fgla, Fglb,
         G2gla, G2glb, F2gla, F2glb, dirs_blk, opens_blk) = carry
        d = d0 + dblk * DSTEP + i                  # int32 scalar

        # ---- sliced doubled stacks (one roll per side) -----------------
        sa = jnp.mod(-(XA - 2 - d + lwi), XA)
        Asl = pltpu.roll(fa_ref[0], sa, axis=1)[:, :nslot]
        sb = jnp.mod(-(d + lwi - 1), XB)
        Bsl = pltpu.roll(fb_ref[0], sb, axis=1)[:, :nslot]

        wna_a = Asl[offA["wna"]:offA["wna"] + an]
        wgda = Asl[offA["wgd"]:offA["wgd"] + an]
        wpga = Asl[offA["wpg"]:offA["wpg"] + an]
        SA = Asl[offA["S"]:offA["S"] + Cp]
        na_a = Asl[offA["na"]:offA["na"] + an]
        cfa = Asl[offA["cf"]:offA["cf"] + 1]
        efa = Asl[offA["ef"]:offA["ef"] + 1]
        ea0 = Asl[offA["e0"]:offA["e0"] + 1]
        wnb = Bsl[offB["wna"]:offB["wna"] + bn]
        wgdb = Bsl[offB["wgd"]:offB["wgd"] + bn]
        wpgb = Bsl[offB["wpg"]:offB["wpg"] + bn]
        SB = Bsl[offB["S"]:offB["S"] + Cp]
        na_b = Bsl[offB["na"]:offB["na"] + bn]
        cfb = Bsl[offB["cf"]:offB["cf"] + 1]
        efb = Bsl[offB["ef"]:offB["ef"] + 1]
        eb0 = Bsl[offB["e0"]:offB["e0"] + 1]

        m_vec = (d - r_all) >> 1                   # (1, nslot) int32
        n_vec = d - m_vec
        parity = ((d - r_all) & 1) == 0
        mf = m_vec.astype(jnp.float32)
        nf = n_vec.astype(jnp.float32)
        valid = (parity & (mf >= 0.0) & (mf <= la)
                 & (nf >= 0.0) & (nf <= lb)
                 & (r_f >= lw) & (r_f <= up) & (d > 0))
        is_top = mf == 0.0
        is_left = nf == 0.0

        a_gap = na_a <= 0.0                        # (an, nslot)
        b_gap = na_b <= 0.0
        s_cell = jnp.sum(SA * SB, axis=0, keepdims=True)
        b0_cell = ea0 * eb0                        # 0 at m==0 or n==0
        pua = cfa * efb * (-u)
        pub = cfb * efa * (-u)

        # ---- shifted previous-step states ------------------------------
        Hval_lo = shift_lo(Hval, NEVSEL)
        Hdir_lo = shift_lo(Hdir, 0.0)
        Hgla_lo = shift_lo(Hgla, 0.0)
        Hglb_lo = shift_lo(Hglb, 0.0)
        Hval_hi = shift_hi(Hval, NEVSEL)
        Hdir_hi = shift_hi(Hdir, 0.0)
        Hgla_hi = shift_hi(Hgla, 0.0)
        Hglb_hi = shift_hi(Hglb, 0.0)
        Gval_hi = shift_hi(Gval, NEVSEL)
        Ggla_hi = shift_hi(Ggla, 0.0)
        Gglb_hi = shift_hi(Gglb, 0.0)
        Fval_lo = shift_lo(Fval, NEVSEL)
        Fgla_lo = shift_lo(Fgla, 0.0)
        Fglb_lo = shift_lo(Fglb, 0.0)
        if ls3:
            G2val_hi = shift_hi(G2val, NEVSEL)
            G2gla_hi = shift_hi(G2gla, 0.0)
            G2glb_hi = shift_hi(G2glb, 0.0)
            F2val_lo = shift_lo(F2val, NEVSEL)
            F2gla_lo = shift_lo(F2gla, 0.0)
            F2glb_lo = shift_lo(F2glb, 0.0)

        # ---- weighted member-pair factor blobs (an*bn, nslot) ----------
        W_d1 = rep_a(wna_a) * tile_b(wgdb)
        W_d2 = rep_a(wgda) * tile_b(wnb)
        W_v = rep_a(wna_a) * tile_b(wpgb)
        W_h = rep_a(wpga) * tile_b(wnb)

        def ge(gla, glb):
            return (rep_a(gla) >= tile_b(glb)).astype(jnp.float32)

        def le(gla, glb):
            return (tile_b(glb) >= rep_a(gla)).astype(jnp.float32)

        # ---- diagonal candidate ----------------------------------------
        gop_d = contract(W_d1, ge(Hgla, Hglb)) + contract(
            W_d2, le(Hgla, Hglb))
        d_val = Hval + s_cell + gop_d
        d_gla = jnp.where(a_gap, Hgla + 1.0, 0.0)
        d_glb = jnp.where(b_gap, Hglb + 1.0, 0.0)

        # ---- vertical lane ---------------------------------------------
        gnp_v = contract(W_v, ge(Ggla_hi, Gglb_hi))
        gop_v = contract(W_v, ge(Hgla_hi, Hglb_hi))
        open_v = (Hdir_hi != float(D_VERT)) & (Hval_hi + gop_v
                                               > Gval_hi + gnp_v)
        gv = jnp.where(open_v, Hval_hi + gop_v, Gval_hi + gnp_v) + pua
        g_gla = jnp.where(a_gap,
                          jnp.where(open_v, Hgla_hi, Ggla_hi) + 1.0, 0.0)
        g_glb = jnp.where(open_v, Hglb_hi, Gglb_hi) + 1.0
        vert_ok = mf >= 2.0
        gv = jnp.where(vert_ok, gv, NEVSEL)

        # ---- horizontal lane -------------------------------------------
        gnp_h = contract(W_h, le(Fgla_lo, Fglb_lo))
        gop_h = contract(W_h, le(Hgla_lo, Hglb_lo))
        open_h = (Hdir_lo != float(D_HORI)) & (Hval_lo + gop_h
                                               > Fval_lo + gnp_h)
        fv = jnp.where(open_h, Hval_lo + gop_h, Fval_lo + gnp_h) + pub
        f_gla = jnp.where(open_h, Hgla_lo, Fgla_lo) + 1.0
        f_glb = jnp.where(b_gap,
                          jnp.where(open_h, Hglb_lo, Fglb_lo) + 1.0, 0.0)
        hori_ok = nf >= 2.0
        fv = jnp.where(hori_ok, fv, NEVSEL)

        # ---- long-gap lanes (ls=3) -------------------------------------
        if ls3:
            gnp_v2 = v2divv1 * contract(W_v, ge(G2gla_hi, G2glb_hi))
            gop_v2 = v2divv1 * contract(W_v, ge(Hgla_hi, Hglb_hi))
            open_v2 = ((Hdir_hi != float(D_VERT))
                       & (Hval_hi + gop_v2 > G2val_hi + gnp_v2))
            g2v = jnp.where(open_v2, Hval_hi + gop_v2,
                            G2val_hi + gnp_v2) + u2divu1 * pua
            g2_gla = jnp.where(
                a_gap, jnp.where(open_v2, Hgla_hi, G2gla_hi) + 1.0, 0.0)
            g2_glb = jnp.where(open_v2, Hglb_hi, G2glb_hi) + 1.0
            g2v = jnp.where(vert_ok, g2v, NEVSEL)

            gnp_h2 = v2divv1 * contract(W_h, le(F2gla_lo, F2glb_lo))
            gop_h2 = v2divv1 * contract(W_h, le(Hgla_lo, Hglb_lo))
            open_h2 = ((Hdir_lo != float(D_HORI))
                       & (Hval_lo + gop_h2 > F2val_lo + gnp_h2))
            f2v = jnp.where(open_h2, Hval_lo + gop_h2,
                            F2val_lo + gnp_h2) + u2divu1 * pub
            f2_gla = jnp.where(open_h2, Hgla_lo, F2gla_lo) + 1.0
            f2_glb = jnp.where(
                b_gap, jnp.where(open_h2, Hglb_lo, F2glb_lo) + 1.0, 0.0)
            f2v = jnp.where(hori_ok, f2v, NEVSEL)

        # ---- boundary chains -------------------------------------------
        top_val = Hval_lo + gop_h + pub
        left_val = Hval_hi + gop_v + pua
        if ls3:
            top_val = jnp.where(nf >= k1,
                                Hval_lo + v2divv1 * gop_h
                                + u2divu1 * pub, top_val)
            left_val = jnp.where(mf >= k1,
                                 Hval_hi + v2divv1 * gop_v
                                 + u2divu1 * pua, left_val)

        # ---- select (lane order: g, g2 strict, f ties, f2 ties) --------
        mx_val = gv
        mx_lane = jnp.full((1, nslot), float(VERT), jnp.float32)
        if ls3:
            t = g2v > mx_val
            mx_val = jnp.where(t, g2v, mx_val)
            mx_lane = jnp.where(t, float(VERT2), mx_lane)
        t = fv >= mx_val
        mx_val = jnp.where(t, fv, mx_val)
        mx_lane = jnp.where(t, float(HORI), mx_lane)
        if ls3:
            t = f2v >= mx_val
            mx_val = jnp.where(t, f2v, mx_val)
            mx_lane = jnp.where(t, float(HORI2), mx_lane)
        has_b0 = (b0_cell != 0.0) & (mx_val > NEVSEL / 2)
        mx_val = mx_val + jnp.where(has_b0, b0_cell, 0.0)
        gv = gv + jnp.where(has_b0 & (mx_lane == float(VERT)), b0_cell,
                            0.0)
        fv = fv + jnp.where(has_b0 & (mx_lane == float(HORI)), b0_cell,
                            0.0)
        if ls3:
            g2v = g2v + jnp.where(has_b0 & (mx_lane == float(VERT2)),
                                  b0_cell, 0.0)
            f2v = f2v + jnp.where(has_b0 & (mx_lane == float(HORI2)),
                                  b0_cell, 0.0)
        nondiag = mx_val > d_val
        is_vlane = (mx_lane == float(VERT)) | (mx_lane == float(VERT2))
        h_val = jnp.where(nondiag, mx_val, d_val)
        h_dir = jnp.where(nondiag,
                          jnp.where(is_vlane, float(D_VERT),
                                    float(D_HORI)), float(D_DIAG))
        h_src = jnp.where(nondiag, mx_lane, float(DIAG))
        if ls3:
            mx_gla = jnp.where(mx_lane == float(VERT), g_gla,
                     jnp.where(mx_lane == float(VERT2), g2_gla,
                     jnp.where(mx_lane == float(HORI), f_gla, f2_gla)))
            mx_glb = jnp.where(mx_lane == float(VERT), g_glb,
                     jnp.where(mx_lane == float(VERT2), g2_glb,
                     jnp.where(mx_lane == float(HORI), f_glb, f2_glb)))
        else:
            mx_gla = jnp.where(mx_lane == float(VERT), g_gla, f_gla)
            mx_glb = jnp.where(mx_lane == float(VERT), g_glb, f_glb)
        h_gla = jnp.where(nondiag, mx_gla, d_gla)
        h_glb = jnp.where(nondiag, mx_glb, d_glb)

        # overlay boundary chains
        h_val = jnp.where(is_top, top_val,
                          jnp.where(is_left, left_val, h_val))
        h_dir = jnp.where(is_top, float(D_HORI),
                          jnp.where(is_left, float(D_VERT), h_dir))
        h_src = jnp.where(is_top, float(HORI),
                          jnp.where(is_left, float(VERT), h_src))
        top_gla = Hgla_lo + 1.0
        top_glb = jnp.where(b_gap, Hglb_lo + 1.0, 0.0)
        left_gla = jnp.where(a_gap, Hgla_hi + 1.0, 0.0)
        left_glb = Hglb_hi + 1.0
        h_gla = jnp.where(is_top, top_gla,
                          jnp.where(is_left, left_gla, h_gla))
        h_glb = jnp.where(is_top, top_glb,
                          jnp.where(is_left, left_glb, h_glb))

        # ---- masked writeback ------------------------------------------
        vm = valid
        Hval = jnp.where(vm, h_val, Hval)
        Hdir = jnp.where(vm, h_dir, Hdir)
        Hgla = jnp.where(vm, h_gla, Hgla)
        Hglb = jnp.where(vm, h_glb, Hglb)
        inner = vm & ~is_top & ~is_left
        Gval = jnp.where(vm, jnp.where(inner, gv, NEVSEL), Gval)
        Ggla = jnp.where(vm, g_gla, Ggla)
        Gglb = jnp.where(vm, g_glb, Gglb)
        Fval = jnp.where(vm, jnp.where(inner, fv, NEVSEL), Fval)
        Fgla = jnp.where(vm, f_gla, Fgla)
        Fglb = jnp.where(vm, f_glb, Fglb)
        opens = (jnp.where(vm & open_v, 1.0, 0.0)
                 + jnp.where(vm & open_h, 2.0, 0.0))
        if ls3:
            G2val = jnp.where(vm, jnp.where(inner, g2v, NEVSEL), G2val)
            G2gla = jnp.where(vm, g2_gla, G2gla)
            G2glb = jnp.where(vm, g2_glb, G2glb)
            F2val = jnp.where(vm, jnp.where(inner, f2v, NEVSEL), F2val)
            F2gla = jnp.where(vm, f2_gla, F2gla)
            F2glb = jnp.where(vm, f2_glb, F2glb)
            opens = (opens + jnp.where(vm & open_v2, 4.0, 0.0)
                     + jnp.where(vm & open_h2, 8.0, 0.0))

        dirs_row = jnp.where(vm, h_src, -1.0)
        # row write as a masked select over the carried block (dynamic
        # single-row vector stores can't prove tile alignment in Mosaic)
        rowhit = dsub_iota == i
        dirs_blk = jnp.where(rowhit, dirs_row, dirs_blk)
        opens_blk = jnp.where(rowhit, opens, opens_blk)

        return (Hval, Gval, Fval, G2val, F2val, Hdir,
                Hgla, Hglb, Ggla, Gglb, Fgla, Fglb,
                G2gla, G2glb, F2gla, F2glb, dirs_blk, opens_blk)

    (v5, parts) = unpack(vals0, gl0)
    blk0 = jnp.zeros((DSTEP, nslot), jnp.float32)
    carry = (v5[0], v5[1], v5[2], v5[3], v5[4], v5[5], *parts, blk0, blk0)
    carry = jax.lax.fori_loop(0, DSTEP, step, carry)
    (Hval, Gval, Fval, G2val, F2val, Hdir,
     Hgla, Hglb, Ggla, Gglb, Fgla, Fglb,
     G2gla, G2glb, F2gla, F2glb, dirs_blk, opens_blk) = carry
    dirs_ref[0] = dirs_blk.astype(jnp.int8)
    opens_ref[0] = opens_blk.astype(jnp.int8)
    st_ref[...] = jnp.concatenate(
        [Hval, Gval, Fval, G2val, F2val, Hdir,
         jnp.zeros((2, nslot), jnp.float32)], axis=0)
    gl_ref[...] = jnp.concatenate(
        [Hgla, Hglb, Ggla, Gglb, Fgla, Fglb,
         G2gla, G2glb, F2gla, F2glb], axis=0)

    @pl.when(dblk == nD - 1)
    def _finish():
        sc = jnp.max(jnp.where(r_f == lb - la, Hval, NEVSEL))
        score_ref[...] = jnp.full((1, 8, 128), sc, jnp.float32)
        stf_ref[0] = st_ref[...]
        glf_ref[0] = gl_ref[...]


def init_state(lw: int, nslot: int, an: int):
    """Host-side initial carry (matches the kernel's former cold
    init): the DP corner lives on diagonal r = 0."""
    r = lw - 1 + np.arange(nslot)
    st = np.full((8, nslot), NEVSEL, np.float32)
    st[0] = np.where(r == 0, 0.0, NEVSEL)
    st[5] = np.where(r == 0, float(D_DIAG), 0.0)
    st[6:8] = 0.0
    gl = np.zeros((10 * an, nslot), np.float32)
    return st, gl


def _launch(prm, FA, FB, st0=None, gl0=None, **kw):
    """prm (B, NPRM) f32; FA (B, rowsA, XA); FB (B, rowsB, XB);
    st0/gl0 (B, 8, nslot)/(B, 10*an, nslot) initial carries (None =
    cold start from each pair's lw).  Returns (score (B,), dirs
    (B, nsteps, nslot) i8, opens likewise, stf, glf) — the final
    carries let chunked (linear-space) runs resume."""
    if st0 is None or gl0 is None:
        prm_h = np.asarray(prm)
        B = prm_h.shape[0]
        sts, gls = [], []
        for k in range(B):
            st_, gl_ = init_state(int(prm_h[k, 2]), kw["nslot"],
                                  kw["an"])
            sts.append(st_)
            gls.append(gl_)
        st0 = jnp.stack([jnp.asarray(x) for x in sts])
        gl0 = jnp.stack([jnp.asarray(x) for x in gls])
    return _launch_core(prm, FA, FB, st0, gl0, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("an", "bn", "Cp", "nslot", "nsteps", "la_max",
                     "lb_max", "ls3", "interpret"))
def _launch_core(prm, FA, FB, st0, gl0, *, an, bn, Cp, nslot,
                 nsteps, la_max, lb_max, ls3=False, interpret=False):
    B = prm.shape[0]
    prm = prm.reshape(B, 1, NPRM)
    XA = FA.shape[2]
    XB = FB.shape[2]
    nD = nsteps // DSTEP
    kern = functools.partial(_kernel, an=an, bn=bn, Cp=Cp, nslot=nslot,
                             nsteps=nsteps, XA=XA, XB=XB, nD=nD, ls3=ls3)
    _, rowsA, _ = stack_layout(an, Cp)
    _, rowsB, _ = stack_layout(bn, Cp)
    score, dirs, opens, stf, glf = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((B, nsteps, nslot), jnp.int8),
                   jax.ShapeDtypeStruct((B, nsteps, nslot), jnp.int8),
                   jax.ShapeDtypeStruct((B, 8, nslot), jnp.float32),
                   jax.ShapeDtypeStruct((B, 10 * an, nslot),
                                        jnp.float32)),
        grid=(B, nD),
        in_specs=[
            pl.BlockSpec((1, 1, NPRM), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rowsA, XA), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rowsB, XB), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nslot), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 10 * an, nslot), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, 128), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DSTEP, nslot), lambda b, d: (b, d, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DSTEP, nslot), lambda b, d: (b, d, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nslot), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 10 * an, nslot), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, nslot), jnp.float32),
            pltpu.VMEM((10 * an, nslot), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prm, FA, FB, st0, gl0)
    return score[:, 0, 0], dirs, opens, stf, glf


def pack_pair(CA, CB, ea0, eb0, cols, La, Lb, wdw, u, gop_scale,
              v2divv1=0.0, u2divu1=0.0, k1=10 ** 9):
    """Host packer: one pair's stacks + scalar row from the
    _pack_profiles/_pack_cols outputs of ops/group.py."""
    (na_a, gda, pga, na_b, gdb, pgb, cfa, efa, cfb, efb, wa, wb) = cols
    C = CA.shape[1]
    CAsh = np.zeros((CA.shape[0] + 1, C), np.float32)
    CAsh[1:] = CA
    CBsh = np.zeros((CB.shape[0] + 1, C), np.float32)
    CBsh[1:] = CB
    ea0sh = np.zeros(CA.shape[0] + 1, np.float32)
    ea0sh[1:] = ea0
    eb0sh = np.zeros(CB.shape[0] + 1, np.float32)
    eb0sh[1:] = eb0
    an = wa.shape[0]
    bn = wb.shape[0]
    FA = build_stack(na_a, gda, pga, wa, CAsh, cfa, efa, ea0sh,
                     an, C, flip=True)
    FB = build_stack(na_b, gdb, pgb, wb, CBsh, cfb, efb, eb0sh,
                     bn, C, flip=False)
    prm = np.zeros(NPRM, np.float32)
    prm[:9] = [La, Lb, wdw.lw, wdw.up, u, gop_scale, v2divv1, u2divu1,
               min(k1, 10 ** 9)]
    return prm, FA, FB
