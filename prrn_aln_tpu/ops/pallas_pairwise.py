"""Pallas TPU kernel: batched banded pairwise DP (score only), row sweep.

Row-layout formulation (round-3 redesign; the round-2 anti-diagonal
wavefront kernel spent 30 of 43 ms/launch skewing the score image in
XLA and idled half its lanes on the wavefront ramps):

1. The DP runs **row by row** (m = 0..la-1).  The within-row affine-gap
   recurrence E(n) = max(E(n-1), H(n-1) - v) - u looks sequential, but
   substituting H = max(X, E) (X = the E-free part) gives the
   first-order max-plus recurrence

       E(n) = max(E(n-1) - u, X(n-1) - v - u)

   whose solution is a running max:  E(n) = cummax_k(C(k) + k*u) - n*u,
   C(k) = X(k-1) - v - u.  The cummax is a log2(W)-step shifted-max —
   so a whole row resolves in O(log W) vector ops, no wavefront.
2. The state is **band-packed**: lane j of row m holds column
   n = m + lw + j, so the per-row work is proportional to the band
   width (the stripe of src/aln2.cc:156-174), not the rectangle, and
   every lane is a live cell.  Packing makes the diagonal predecessor
   land on the *same* lane (no shift) and the vertical one on lane j+1
   (one static shift).
3. Eight pairs ride the sublane axis; each row update is a handful of
   (8, W) VPU ops.  The packed substitution rows arrive via a Pallas
   grid dimension so Mosaic double-buffers the DMA.

Boundary conditions, banding, and terminal-gap discounting reproduce
the banded wavefront scorer (ops/pairwise.py, reference
src/fwd2d1.cc:66-189) to float reassociation accuracy: the log-depth
E-scan evaluates C(k) + k*u - n*u where the sequential oracle applies
(n-k) successive ``- u`` steps, so scores can differ by a few f32 ulps.

Reference: src/fwd2d1.cc (wavefront scorer), src/aln2.cc:156-174
(stripe), src/fwd2b1.cc (banded Gotoh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEVSEL = -1.0e30
NEG_SENT = -(2 ** 31 // 8) * 7.0    # reference NEG_INT sentinel
GROUP = 128   # default pair-group width; launches pick adaptively
NPLANE = 16     # parameter planes (10 used; padded for tile alignment)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _group_for(B: int) -> int:
    """Widest group <= batch (padded), capped at 128 (measured
    saturation point, PERF.md)."""
    for g in (128, 64, 32):
        if B >= g:
            return g
    return 32


def _k_for(G: int, La_p: int) -> int:
    """Rows per grid step: keep the S block ~K*G*Np*4B =~ 2.6 MB.
    K is the second-to-last dim of the S block, so it must be a
    multiple of 8 (f32 sublane tiling) unless it equals La_p."""
    return max(8, min(La_p, _pad_to(1024 // G, 8)))


def _shift_left1(x, fill, j_iota, Wp):
    r = pltpu.roll(x, Wp - 1, axis=1)      # circular left-by-1
    return jnp.where(j_iota == Wp - 1, fill, r)


def _shift_right1(x, fill, j_iota):
    r = pltpu.roll(x, 1, axis=1)
    return jnp.where(j_iota == 0, fill, r)


def _cummax(t, j_iota, Wp):
    """Running max along lanes (log2(Wp) shifted maxima)."""
    k = 1
    while k < Wp:
        r = pltpu.roll(t, k, axis=1)
        t = jnp.maximum(t, jnp.where(j_iota < k, NEVSEL, r))
        k <<= 1
    return t


def _cummax_2l(t, Wp):
    """Two-level running max along lanes (PERF.md item 3).

    Level 1: independent 7-step prefix maxima inside each 128-lane tile
    (the T per-tile chains are independent, so the VPU overlaps them);
    level 2: a T-step carry of tile maxima.  Versus the flat log2(Wp)
    scan this shortens the *dependent* chain from log2(Wp) full-width
    rolls to 7 tile rolls + (T-1) broadcast maxima, and each roll moves
    Wp/T lanes instead of Wp."""
    G = t.shape[0]
    j128 = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
    T = Wp // 128
    if T <= 1:
        return _cummax(t, j128.astype(t.dtype), Wp)
    tiles = [t[:, i * 128:(i + 1) * 128] for i in range(T)]
    k = 1
    while k < 128:
        tiles = [jnp.maximum(x, jnp.where(j128 < k, NEVSEL,
                                          pltpu.roll(x, k, axis=1)))
                 for x in tiles]
        k <<= 1
    out = [tiles[0]]
    carry = tiles[0][:, 127:128]
    for i in range(1, T):
        cur = jnp.maximum(tiles[i], carry)
        out.append(cur)
        carry = cur[:, 127:128]
    return jnp.concatenate(out, axis=1)


def _kernel_rows(prm_ref, s_ref, out_ref,
                 h_ref, g_ref, last_ref, bc_ref,
                 *, K, La_p, Wp, Np, nrb, lw0, G):
    """Grid step (b, d): rows d*K .. d*K+K-1 of one GROUP-pair group.

    s_ref block: (1, K, GROUP, Np) UNPACKED substitution rows straight
    from the MXU GEMM; the band packing (lane j of DP row m holds
    column n = m + lw0 + j) is applied here with ONE strided
    `pltpu.roll` over the whole block -- a vectorized in-VMEM skew,
    instead of the round-2 XLA barrel-rotate over 512 MB of HBM.
    prm_ref: (1, NPLANE, GROUP, 128) parameter planes [la, lb, u, v,
    fa_l, fb_l, fa_r, fb_r, lw, up]; scratch refs (GROUP, Wp) carry
    H/G of the last processed row plus the captured last-row values
    and the running right-column terminal candidates across grid
    steps.
    """
    d = pl.program_id(1)

    def plane(k):
        return prm_ref[0, k, :, 0:1]       # (8, 1), broadcasts over lanes

    la = plane(0)
    lb = plane(1)
    u = plane(2)
    v = plane(3)
    fa_l = plane(4)
    fb_l = plane(5)
    fa_r = plane(6)
    fb_r = plane(7)
    lw = plane(8)
    up = plane(9)

    j_iota = jax.lax.broadcasted_iota(
        jnp.int32, (G, Wp), 1).astype(jnp.float32)
    neg = j_iota * 0.0 + NEVSEL            # concrete (8, Wp) layout
    ju = j_iota * u                        # j * u (for the E-scan)
    # per-pair band as a lane interval inside the shared packing
    jband = (lw0 + j_iota >= lw) & (lw0 + j_iota <= up)

    @pl.when(d == 0)
    def _init():
        # virtual boundary row m = -1: lane j holds n = -1 + lw0 + j.
        # Boundary values live on slot r = n+1 and are readable only for
        # r inside the band (the oracle NEG-sentinels the edge slots).
        nv = lw0 - 1.0 + j_iota
        slot_ok = (nv + 1.0 >= lw) & (nv + 1.0 <= up)
        hinit = jnp.where(nv == -1.0, 0.0,
                          jnp.where((nv >= 0.0) & slot_ok,
                                    -(v + (nv + 1.0) * u) * fa_l,
                                    NEG_SENT))
        h_ref[...] = hinit
        g_ref[...] = neg
        last_ref[...] = neg
        bc_ref[...] = neg

    # band packing: lane j of DP row m reads column (m+lw0+j) % Np --
    # one dynamic in-VMEM roll per row (wrapped lanes land outside
    # [0, lb) of n_vec and are masked below)
    def row(i, carry):
        H, Gv, LR, BC = carry
        mf = (d * K + i).astype(jnp.float32)
        s_row = pltpu.roll(s_ref[0, :, i, :],
                           jnp.mod(-(d * K + i + lw0), Np),
                           axis=1)[:, :Wp]
        n_vec = mf + lw0 + j_iota
        colb = -(v + (mf + 1.0) * u) * fb_l    # H(m, -1) (8, 1)
        # the left-column boundary lives on slot -(m+1): readable only
        # when that slot is inside the band (m < -lw)
        colb_ok = mf < -lw                     # (8, 1)

        Hs = _shift_left1(H, NEG_SENT, j_iota, Wp)
        Gs = _shift_left1(Gv, NEVSEL, j_iota, Wp)
        G0 = jnp.maximum(Hs - v, Gs) - u
        D0 = H + s_row
        # S is pre-masked to NEG_SENT outside band/rectangle (XLA
        # epilogue of the S einsum), and H carries NEG_SENT on invalid
        # lanes, so X needs no select here: invalid lanes sit around
        # NEG_SENT and never win the E-scan below.
        X = jnp.maximum(D0, G0)
        valid = (n_vec >= 0.0) & (n_vec < lb) & jband
        virt = (n_vec == -1.0) & colb_ok

        C = (_shift_right1(X, NEG_SENT, j_iota) - v) - u
        # left-boundary horizontal open: the n==0 lane's predecessor is
        # the virtual column n=-1 (X there is NEG since S is masked)
        C = jnp.where((n_vec == 0.0) & colb_ok, (colb - v) - u, C)
        M = _cummax_2l(C + ju, Wp)
        E = M - ju
        H0 = jnp.maximum(X, E)
        H0 = jnp.where(valid, H0, jnp.where(virt, colb + 0.0 * j_iota,
                                            NEG_SENT))

        LR = jnp.where(mf == la - 1.0, H0, LR)
        kb = la - 1.0 - mf
        cand = jnp.where((n_vec == lb - 1.0) & (kb > 0.0),
                         H0 - (v + kb * u) * fb_r, neg)
        BC = jnp.maximum(BC, cand)
        return H0, G0, LR, BC

    carry = (h_ref[...], g_ref[...], last_ref[...], bc_ref[...])
    for i in range(K):   # static unroll: lets Mosaic overlap row chains
        carry = row(i, carry)
    H, Gv, LR, BC = carry
    h_ref[...] = H
    g_ref[...] = Gv
    last_ref[...] = LR
    bc_ref[...] = BC

    @pl.when(d == nrb - 1)
    def _finish():
        n_last = (la - 1.0) + lw0 + j_iota
        corner = jnp.max(jnp.where(n_last == lb - 1.0, LR, NEVSEL),
                         axis=1, keepdims=True)
        kfb = lb - 1.0 - n_last
        cand_row = jnp.where((kfb > 0.0) & (n_last >= 0.0),
                             LR - (v + kfb * u) * fa_r, NEVSEL)
        best_row = jnp.max(cand_row, axis=1, keepdims=True)
        best_col = jnp.max(BC, axis=1, keepdims=True)
        score = corner
        score = jnp.where(fa_r < 1.0, jnp.maximum(score, best_row), score)
        score = jnp.where(fb_r < 1.0, jnp.maximum(score, best_col), score)
        out_ref[0, :, :] = jnp.broadcast_to(score, (G, 128))


@functools.partial(jax.jit,
                   static_argnames=("La_p", "Wp", "dim", "lw0",
                                    "interpret", "lossy"))
def _prepare_and_launch(a_batch, b_batch, prm, mtx, *, La_p, Wp, dim, lw0,
                        interpret=False, lossy=False):
    """Packed-S build (XLA) + row-kernel launch (single XLA program).

    a_batch (Bp, Ma) / b_batch (Bp, Mb) int32 codes; prm
    (BG, NPLANE, GROUP, 128) parameter planes; lw0 the shared packing
    offset (min band low over the batch).

    The substitution image is built UNPACKED as one batched MXU GEMM
    (one-hot selections are exact: each output cell sums exactly one
    matrix entry, so MXU precision does not matter) and the band
    packing happens inside the kernel with a single strided
    `pltpu.roll` per grid block — no XLA-side gather/skew pass over
    HBM (that pass cost 30 of 43 ms/launch in the round-2 kernel).
    """
    Bp, Ma = a_batch.shape
    Mb = b_batch.shape[1]
    Np = _pad_to(max(Mb, Wp), 128)
    # lossy: 1-pass bf16 MXU for the S build (the one-hot select then
    # rounds mtx entries to bf16) -- the opt-in score-only screen for
    # soft-exactness edge selection (SURVEY A.8); ~3x faster S einsum
    hi = (jax.lax.Precision.DEFAULT if lossy
          else jax.lax.Precision.HIGHEST)
    g = prm.shape[2]
    # pad the (tiny) code arrays with an out-of-range code so their
    # one-hot rows are all-zero: S comes out of the einsum already
    # padded AND in the kernel's (BG, G, rows, cols) layout -- no
    # 671 MB pad/transpose materialization pass (round-4 fix).
    a_pad = jnp.pad(a_batch, ((0, 0), (0, La_p - Ma)),
                    constant_values=dim)
    b_pad = jnp.pad(b_batch, ((0, 0), (0, Np - Mb)),
                    constant_values=dim)
    onehot_a = jax.nn.one_hot(a_pad, dim, dtype=jnp.float32)
    onehot_b = jax.nn.one_hot(b_pad, dim, dtype=jnp.float32)
    P = jnp.einsum("bmc,cd->bmd", onehot_a, mtx.astype(jnp.float32),
                   precision=hi)                      # exact row select
    S = jnp.einsum("bgmd,bgnd->bgmn",
                   P.reshape(Bp // g, g, La_p, dim),
                   onehot_b.reshape(Bp // g, g, Np, dim),
                   precision=hi)
    # pre-mask out-of-band / out-of-rectangle cells with the NEG
    # sentinel in the einsum epilogue (fused by XLA): the kernel then
    # needs no X-select per row — invalid lanes self-propagate NEG.
    lav = prm[:, 0, :, 0][:, :, None, None]
    lbv = prm[:, 1, :, 0][:, :, None, None]
    lwv = prm[:, 8, :, 0][:, :, None, None]
    upv = prm[:, 9, :, 0][:, :, None, None]
    m_i = jnp.arange(La_p, dtype=jnp.float32)[None, None, :, None]
    n_i = jnp.arange(Np, dtype=jnp.float32)[None, None, None, :]
    r = n_i - m_i
    ok = ((r >= lwv) & (r <= upv) & (m_i < lav) & (n_i < lbv))
    S = jnp.where(ok, S, NEG_SENT)
    return _launch(S, prm, La_p=La_p, Wp=Wp, Np=Np, lw0=lw0,
                   interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("La_p", "Wp", "Np", "lw0", "interpret"))
def _launch(S, prm, *, La_p, Wp, Np, lw0, interpret=False):
    """S: (BG, G, La_p, Np) unpacked rows (pair-major: the natural
    einsum output layout, read with a per-row sublane slice in the
    kernel); prm: (BG, NPLANE, G, 128); G (pairs per sublane block) is
    taken from the shapes -- wider groups amortize the serial
    row-recurrence latency (PERF.md)."""
    BG = S.shape[0]
    G = S.shape[1]
    K = _k_for(G, La_p)
    nrb = La_p // K
    kern = functools.partial(_kernel_rows, K=K, La_p=La_p, Wp=Wp, Np=Np,
                             nrb=nrb, lw0=lw0, G=G)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((BG, G, 128), jnp.float32),
        grid=(BG, nrb),
        in_specs=[
            pl.BlockSpec((1, NPLANE, G, 128), lambda b, d: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, K, Np), lambda b, d: (b, 0, d, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, 128), lambda b, d: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G, Wp), jnp.float32)
                        for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prm, S)


def _kernel_rows_fused(prm_ref, p_ref, bw_ref, out_ref,
                       h_ref, g_ref, last_ref, bc_ref, s_scr,
                       *, K, La_p, Wp, WW, nrb, lw0, G, dim):
    """Grid step (b, d) with the substitution image built IN-KERNEL:
    one (32, K) x (32, WW) MXU contraction per pair over the window of
    genome columns this row block can touch (round-5 fix for the
    sequential 3.6 ms S einsum + 537 MB HBM S round trip).

    p_ref block: (1, G, K, 32) profile rows P[m, c] = mtx[a[m], c]
    (rows d*K..d*K+K-1); bw_ref block: (1, 1, G, WW) b codes of the
    window starting at column d*K + lw0 (out-of-range positions carry
    the all-zero one-hot code).  Band packing is a free diagonal
    slice: lane j of row i reads window column i + j.
    """
    d = pl.program_id(1)

    def plane(k):
        return prm_ref[0, k, :, 0:1]

    la = plane(0)
    lb = plane(1)
    u = plane(2)
    v = plane(3)
    fa_l = plane(4)
    fb_l = plane(5)
    fa_r = plane(6)
    fb_r = plane(7)
    lw = plane(8)
    up = plane(9)

    j_iota = jax.lax.broadcasted_iota(
        jnp.int32, (G, Wp), 1).astype(jnp.float32)
    neg = j_iota * 0.0 + NEVSEL
    ju = j_iota * u
    jband = (lw0 + j_iota >= lw) & (lw0 + j_iota <= up)

    @pl.when(d == 0)
    def _init():
        nv = lw0 - 1.0 + j_iota
        slot_ok = (nv + 1.0 >= lw) & (nv + 1.0 <= up)
        hinit = jnp.where(nv == -1.0, 0.0,
                          jnp.where((nv >= 0.0) & slot_ok,
                                    -(v + (nv + 1.0) * u) * fa_l,
                                    NEG_SENT))
        h_ref[...] = hinit
        g_ref[...] = neg
        last_ref[...] = neg
        bc_ref[...] = neg

    # in-kernel S build: one small MXU contraction per pair.
    # HIGHEST precision: the one-hot row select is exact only if the
    # MXU passes reconstruct full f32 (default 1-pass bf16 rounds the
    # mtx values).  Measured round 5: these per-pair dots are
    # latency-bound, costing about what the batched XLA einsum did --
    # the fused path wins on HBM (no 537 MB S image), not time
    # (14.6 vs 15.4 GCUPS); see PERF.md.
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (32, WW), 0)
    for g in range(G):
        oh = (bw_ref[0, 0, g, :][None, :] == c_iota).astype(jnp.float32)
        s_scr[g] = jax.lax.dot_general(
            p_ref[0, g], oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def row(i, carry):
        H, Gv, LR, BC = carry
        mf = (d * K + i).astype(jnp.float32)
        s_row = s_scr[:, i, i:i + Wp]
        n_vec = mf + lw0 + j_iota
        colb = -(v + (mf + 1.0) * u) * fb_l
        colb_ok = mf < -lw

        Hs = _shift_left1(H, NEG_SENT, j_iota, Wp)
        Gs = _shift_left1(Gv, NEVSEL, j_iota, Wp)
        G0 = jnp.maximum(Hs - v, Gs) - u
        D0 = H + s_row
        X = jnp.maximum(D0, G0)
        # rows past la propagated NEG via the masked S image before;
        # mask X directly now that S is unmasked
        X = jnp.where(mf < la, X, NEG_SENT)
        valid = (n_vec >= 0.0) & (n_vec < lb) & jband
        virt = (n_vec == -1.0) & colb_ok

        C = (_shift_right1(X, NEG_SENT, j_iota) - v) - u
        C = jnp.where((n_vec == 0.0) & colb_ok, (colb - v) - u, C)
        M = _cummax_2l(C + ju, Wp)
        E = M - ju
        H0 = jnp.maximum(X, E)
        H0 = jnp.where(valid, H0, jnp.where(virt, colb + 0.0 * j_iota,
                                            NEG_SENT))

        LR = jnp.where(mf == la - 1.0, H0, LR)
        kb = la - 1.0 - mf
        cand = jnp.where((n_vec == lb - 1.0) & (kb > 0.0),
                         H0 - (v + kb * u) * fb_r, neg)
        BC = jnp.maximum(BC, cand)
        return H0, G0, LR, BC

    carry = (h_ref[...], g_ref[...], last_ref[...], bc_ref[...])
    for i in range(K):
        carry = row(i, carry)
    H, Gv, LR, BC = carry
    h_ref[...] = H
    g_ref[...] = Gv
    last_ref[...] = LR
    bc_ref[...] = BC

    @pl.when(d == nrb - 1)
    def _finish():
        n_last = (la - 1.0) + lw0 + j_iota
        corner = jnp.max(jnp.where(n_last == lb - 1.0, LR, NEVSEL),
                         axis=1, keepdims=True)
        kfb = lb - 1.0 - n_last
        cand_row = jnp.where((kfb > 0.0) & (n_last >= 0.0),
                             LR - (v + kfb * u) * fa_r, NEVSEL)
        best_row = jnp.max(cand_row, axis=1, keepdims=True)
        best_col = jnp.max(BC, axis=1, keepdims=True)
        score = corner
        score = jnp.where(fa_r < 1.0, jnp.maximum(score, best_row), score)
        score = jnp.where(fb_r < 1.0, jnp.maximum(score, best_col), score)
        out_ref[0, :, :] = jnp.broadcast_to(score, (G, 128))


@functools.partial(jax.jit,
                   static_argnames=("La_p", "Wp", "dim", "lw0",
                                    "interpret"))
def _prepare_and_launch_fused(a_batch, b_batch, prm, mtx, *, La_p, Wp,
                              dim, lw0, interpret=False):
    """Fused S-build launch: ships P = mtx rows by a-codes (transposed,
    (BG, G, 32, La_p)) and the per-block b-code windows instead of the
    O(La*Np) substitution image."""
    Bp, Ma = a_batch.shape
    Mb = b_batch.shape[1]
    g = prm.shape[2]
    BG = Bp // g
    K = min(64, La_p)
    nrb = La_p // K
    WW = _pad_to(Wp + K, 128)
    mtx32 = jnp.zeros((64, 32), jnp.float32).at[:dim, :dim].set(
        mtx.astype(jnp.float32))
    a_pad = jnp.pad(a_batch, ((0, 0), (0, La_p - Ma)),
                    constant_values=dim)
    P = mtx32[a_pad].reshape(BG, g, La_p, 32)
    # b windows per row block: column d*K + lw0 + w (out-of-range -> 32,
    # whose one-hot row of mtx32 is zero)
    PADW = K + max(0, -lw0) + 8
    bwide = jnp.full((Bp, PADW + Mb + WW + La_p), 32, jnp.int32)
    bwide = jax.lax.dynamic_update_slice(bwide, b_batch.astype(jnp.int32),
                                         (0, PADW))
    widx = (PADW + lw0 + K * jnp.arange(nrb)[:, None]
            + jnp.arange(WW)[None, :])
    bwin = bwide[:, widx].reshape(BG, g, nrb, WW).transpose(0, 2, 1, 3)

    kern = functools.partial(_kernel_rows_fused, K=K, La_p=La_p, Wp=Wp,
                             WW=WW, nrb=nrb, lw0=lw0, G=g, dim=dim)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((BG, g, 128), jnp.float32),
        grid=(BG, nrb),
        in_specs=[
            pl.BlockSpec((1, NPLANE, g, 128), lambda b, d: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, K, 32), lambda b, d: (b, 0, d, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, WW), lambda b, d: (b, d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, 128), lambda b, d: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((g, Wp), jnp.float32)
                        for _ in range(4)]
        + [pltpu.VMEM((g, K, WW), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prm, P, bwin)


def pallas_pairwise_scores(a_batch, b_batch, la, lb, mtx,
                           u: float, v: float, tgapf: float = 1.0,
                           exg=None, lw=None, up=None,
                           lossy: bool = False):
    """Batched (optionally banded) affine-gap scores via the row kernel.

    a_batch (B, Ma) / b_batch (B, Mb) int32 codes (0-padded), la/lb (B,)
    actual lengths; lw/up (B,) band diagonals (default: full rectangle).
    Returns (B,) f32 scores.
    """
    B, Ma = a_batch.shape
    Mb = b_batch.shape[1]
    dim = mtx.shape[0]
    la = np.asarray(la)
    lb = np.asarray(lb)
    lw = -la if lw is None else np.asarray(lw)
    up = lb if up is None else np.asarray(up)
    La_p = _pad_to(max(Ma, 8), min(128, 1 << int(max(Ma, 8) - 1).bit_length()))
    La_p = max(8, La_p)
    lw0 = int(lw.min())
    Wp = _pad_to(int(up.max()) - lw0 + 1, 128)
    grp = _group_for(B)
    pad_b = (-B) % grp
    if pad_b:
        a_batch = np.pad(a_batch, ((0, pad_b), (0, 0)))
        b_batch = np.pad(b_batch, ((0, pad_b), (0, 0)))
        la = np.pad(la, (0, pad_b), constant_values=1)
        lb = np.pad(lb, (0, pad_b), constant_values=1)
        lw = np.pad(lw, (0, pad_b), constant_values=-1)
        up = np.pad(up, (0, pad_b), constant_values=1)
        if exg is not None:
            exg = np.pad(exg, ((0, pad_b), (0, 0)))
    Bp = B + pad_b

    if exg is None:
        exg = np.zeros((Bp, 4), bool)
    planes = np.zeros((Bp, NPLANE), np.float32)
    planes[:, 0] = la
    planes[:, 1] = lb
    planes[:, 2] = u
    planes[:, 3] = v
    planes[:, 4] = np.where(exg[:, 0], 0.0, tgapf)   # fa_l
    planes[:, 5] = np.where(exg[:, 2], 0.0, tgapf)   # fb_l
    planes[:, 6] = np.where(exg[:, 1], 0.0, tgapf)   # fa_r
    planes[:, 7] = np.where(exg[:, 3], 0.0, tgapf)   # fb_r
    planes[:, 8] = lw
    planes[:, 9] = up
    # (BG, NPLANE params, 8 pairs, 128 lanes)
    prm = np.broadcast_to(
        planes.reshape(Bp // grp, grp, NPLANE, 1).transpose(0, 2, 1, 3),
        (Bp // grp, NPLANE, grp, 128)).copy()

    import os
    # default: the batched-einsum S build (fastest measured; the fused
    # build trades ~6% time for O(1) S memory -- PERF.md r5)
    fused = os.environ.get("PRRN_PW_FUSED", "0") == "1" and dim <= 32
    kw2 = {} if fused else {"lossy": bool(lossy)}
    launch = _prepare_and_launch_fused if fused else _prepare_and_launch
    out = launch(a_batch, b_batch, prm, mtx,
                 La_p=La_p, Wp=Wp, dim=dim, lw0=lw0,
                 interpret=jax.default_backend() != "tpu", **kw2)
    return out.reshape(Bp, 128)[:B, 0]
