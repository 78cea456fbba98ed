"""Pallas TPU kernel: batched pairwise wavefront DP (score only).

Gather-free layout:

1. XLA builds the substitution image S[m, n] = mtx[a[m], b[n]] with a
   one-hot einsum on the MXU, then "skews" it with a barrel rotator
   (log2(rows) masked rolls): row c of the skewed block holds the
   anti-diagonal m + n == c (mod rows).
2. Pairs are packed 8 to a group along the sublane axis: the kernel's
   state is (8, Lb) — one full f32 vreg row per op — and every step is
   pure VPU work: lane shifts, maxima, adds.
3. The wavefront step is a Pallas **grid dimension**: the per-step
   diagonal row is a (1, 1, 8, Lb) block whose DMA Mosaic
   double-buffers, and the DP state lives in VMEM scratch that persists
   across grid steps (reference wavefront: src/fwd2d1.cc:136-189).

Boundary conditions, banding (stripe of src/aln2.cc:156-174) and
terminal-gap discounting reproduce the banded wavefront scorer exactly
(ops/pairwise.py); validated against it in tests and in bench.py.

Perf notes (v5e): see PERF.md — the f32 VPU roofline for this
formulation is ~50-100 GCUPS/chip; roadmap items are banded tiling,
rectangle packing, and int16 state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEVSEL = -1.0e30
GROUP = 8
NPLANE = 16     # parameter planes (10 used; padded for tile alignment)


def _pow2(x: int) -> int:
    p = 8
    while p < x:
        p <<= 1
    return p


def _kernel(prm_ref, srot_ref, out_ref,
            h2_ref, h1_ref, f1_ref, g1_ref, last_ref, bc_ref,
            *, T, K, La_p, Lb_p):
    """Grid step d of one 8-pair group: K unrolled wavefront sub-steps.

    srot_ref block: (1, K, 8, Lb_p) — the skewed score rows for
    anti-diagonals d*K .. d*K+K-1 (rows mod La_p of the skewed image);
    prm_ref block: (1, NPLANE, 8, 128) parameter planes [la, lb, u, v,
    fa_l, fb_l, fa_r, fb_r, lw, up] broadcast over lanes; out_ref:
    (1, 8, 128).  lw/up restrict cells to the diagonal band
    lw <= n - m <= up (reference stripe, src/aln2.cc:156-174); a
    full-rectangle run passes lw = -la, up = +lb.  Scratch refs
    (8, Lb_p) hold the two trailing H diagonals, F/G lanes, the
    captured last row, and the running last-column terminal
    candidates; DP state stays in registers across the K sub-steps.

    Sub-steps with d_abs >= T (block padding) write all-NEVSEL state but
    cannot corrupt last_ref/bc_ref: their capture lanes fall outside
    [0, lb) there.
    """
    d = pl.program_id(1)
    G = GROUP

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

    n_idx = jax.lax.broadcasted_iota(
        jnp.int32, (G, Lb_p), 1).astype(jnp.float32)
    neg = n_idx * 0.0 + NEVSEL             # concrete (8, Lb_p) layout

    @pl.when(d == 0)
    def _init():
        h2_ref[...] = neg
        h1_ref[...] = neg
        f1_ref[...] = neg
        g1_ref[...] = neg
        last_ref[...] = neg
        bc_ref[...] = neg

    lane0 = n_idx == 0
    # boundary top-row values Ta(n) (0 at n==0) and Ta(n+1)
    Ta = jnp.where(lane0, 0.0, -(v + n_idx * u) * fa_l)
    Tav = -(v + (n_idx + 1.0) * u) * fa_l
    half = jnp.float32(0.5)

    H2 = h2_ref[...]
    H1 = h1_ref[...]
    F1 = f1_ref[...]
    G1 = g1_ref[...]
    lastrow = last_ref[...]
    best_col = bc_ref[...]

    d0f = (d * K).astype(jnp.float32)
    for j in range(K):
        df = d0f + j
        s_row = srot_ref[0, j]
        m_vec = df - n_idx
        # valid lanes form the interval lo <= n <= hi:
        #   m in [0, la) ∩ n in [0, lb) ∩ lw <= n - m <= up
        lo = jnp.maximum(jnp.ceil((df + lw) * half), df - la + 1.0)
        hi = jnp.minimum(jnp.floor((df + up) * half),
                         jnp.minimum(df, lb - 1.0))
        valid = (n_idx >= lo) & (n_idx <= hi)

        # lane-0 fills: H1s/F1s feed F0, whose lane 0 must not read the
        # wrapped tail; H2s lane 0 is never read (diag_pred selects the
        # left-column boundary there), so its roll needs no fill
        H1s = jnp.where(lane0, NEVSEL, pltpu.roll(H1, 1, axis=1))
        F1s = jnp.where(lane0, NEVSEL, pltpu.roll(F1, 1, axis=1))
        H2s = pltpu.roll(H2, 1, axis=1)

        top = m_vec == 0
        tb_d = -(v + df * u) * fb_l        # left-column boundary, d > 0
        diag_pred = jnp.where(top, Ta,
                              jnp.where(lane0,
                                        jnp.where(df == 0.0, 0.0, tb_d),
                                        H2s))

        F0 = jnp.maximum(H1s - v, F1s) - u

        vpH = jnp.where(top, Tav, H1)
        vpG = jnp.where(top, NEVSEL, G1)
        G0 = jnp.maximum(vpH - v, vpG) - u

        H0 = jnp.maximum(jnp.maximum(diag_pred + s_row, F0), G0)
        H0 = jnp.where(valid, H0, neg)

        # last row H(la-1, n) lands at lane n when m == la-1
        lastrow = jnp.where(m_vec == la - 1.0, H0, lastrow)
        # last-column terminal candidates (trailing gap in b):
        #   H(m, lb-1) - (v + (la-1-m) u) * fb_r
        kf = la - 1.0 - m_vec
        cand = jnp.where((n_idx == lb - 1.0) & (kf > 0),
                         H0 - (v + kf * u) * fb_r, neg)
        best_col = jnp.maximum(best_col, cand)

        H2, H1, F1, G1 = H1, H0, F0, G0

    h2_ref[...] = H2
    h1_ref[...] = H1
    f1_ref[...] = F1
    g1_ref[...] = G1
    last_ref[...] = lastrow
    bc_ref[...] = best_col

    nblocks = (T + K - 1) // K
    @pl.when(d == nblocks - 1)
    def _finish():
        best_colr = jnp.max(best_col, axis=1, keepdims=True)
        corner = jnp.max(jnp.where(n_idx == lb - 1.0, lastrow, NEVSEL),
                         axis=1, keepdims=True)
        kfb = lb - 1.0 - n_idx
        cand_row = jnp.where(kfb > 0, lastrow - (v + kfb * u) * fa_r,
                             NEVSEL)
        best_row = jnp.max(cand_row, axis=1, keepdims=True)
        score = corner
        score = jnp.where(fa_r < 1.0, jnp.maximum(score, best_row), score)
        score = jnp.where(fb_r < 1.0, jnp.maximum(score, best_colr), score)
        out_ref[0, :, :] = jnp.broadcast_to(score, (G, 128))


@functools.partial(jax.jit, static_argnames=("la_pad", "lb_pad", "dim"))
def _prepare_and_launch(a_batch, b_batch, prm, mtx, *, la_pad, lb_pad, dim):
    """Fused S-image build + skew + kernel launch (single XLA program)."""
    Bp, Ma = a_batch.shape
    Mb = b_batch.shape[1]
    hi = jax.lax.Precision.HIGHEST
    onehot_a = jax.nn.one_hot(a_batch, dim, dtype=jnp.float32)
    onehot_b = jax.nn.one_hot(b_batch, dim, dtype=jnp.float32)
    P = jnp.einsum("bmc,cd->bmd", onehot_a, mtx.astype(jnp.float32),
                   precision=hi)
    S = jnp.einsum("bmd,bnd->bmn", P, onehot_b, precision=hi)
    S = jnp.pad(S, ((0, 0), (0, la_pad - Ma), (0, lb_pad - Mb)))
    S = _skew(S, la_pad=la_pad)
    S = S.reshape(Bp // GROUP, GROUP, la_pad, lb_pad).transpose(0, 2, 1, 3)
    return _launch(S, prm, la_pad=la_pad, lb_pad=lb_pad)


@functools.partial(jax.jit, static_argnames=("la_pad", "lb_pad"))
def _launch(S, prm, *, la_pad, lb_pad):
    """S: (BG, la_pad, 8, lb_pad) pre-skewed; prm: (BG, NPLANE, 8, 128)."""
    BG = S.shape[0]
    T = la_pad + lb_pad - 1
    K = min(8, la_pad)                     # unrolled sub-steps per grid step
    nblocks = (T + K - 1) // K
    row_blocks = la_pad // K               # skewed image wraps mod la_pad
    kern = functools.partial(_kernel, T=T, K=K, La_p=la_pad, Lb_p=lb_pad)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((BG, GROUP, 128), jnp.float32),
        grid=(BG, nblocks),
        in_specs=[
            pl.BlockSpec((1, NPLANE, 8, 128), lambda b, d: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, GROUP, lb_pad),
                         lambda b, d: (b, d % row_blocks, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, GROUP, 128), lambda b, d: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((GROUP, lb_pad), jnp.float32)
                        for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(prm, S)


@functools.partial(jax.jit, static_argnames=("la_pad",))
def _skew(S, *, la_pad):
    """Roll column n of each (la_pad, lb_pad) image down by n (mod)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, S.shape, 2)
    out = S
    k = 1
    while k < la_pad:
        rolled = jnp.roll(out, k, axis=1)
        out = jnp.where((lane & k) != 0, rolled, out)
        k <<= 1
    return out


def pallas_pairwise_scores(a_batch, b_batch, la, lb, mtx,
                           u: float, v: float, tgapf: float = 1.0,
                           exg=None, lw=None, up=None):
    """Batched (optionally banded) wavefront scores via the Pallas kernel.

    a_batch (B, Ma) / b_batch (B, Mb) int32 codes (0-padded), la/lb (B,)
    actual lengths; lw/up (B,) band diagonals (default: full rectangle).
    Returns (B,) f32 scores.
    """
    B, Ma = a_batch.shape
    Mb = b_batch.shape[1]
    la_pad = _pow2(Ma)
    lb_pad = max(128, _pow2(Mb))
    dim = mtx.shape[0]
    la = np.asarray(la)
    lb = np.asarray(lb)
    lw = -la if lw is None else np.asarray(lw)
    up = lb if up is None else np.asarray(up)
    pad_b = (-B) % GROUP
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
        planes.reshape(Bp // GROUP, GROUP, NPLANE, 1).transpose(0, 2, 1, 3),
        (Bp // GROUP, NPLANE, GROUP, 128)).copy()

    out = _prepare_and_launch(a_batch, b_batch, prm, mtx,
                              la_pad=la_pad, lb_pad=lb_pad, dim=dim)
    return out.reshape(Bp, 128)[:B, 0]
