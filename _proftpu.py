import time
import numpy as np, jax
from prrn_aln_tpu import scoring
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.ops import pallas_pairwise as pp
from prrn_aln_tpu.ops.pairwise import wavefront_scores
from prrn_aln_tpu.ops.window import stripe

rng = np.random.default_rng(7)
mtx, _ = scoring.protein_matrix(AlnParams(pam=150))

# --- correctness: ragged banded batch vs oracle ---
B, L = 16, 200
a = rng.integers(3, 23, size=(B, L)).astype(np.int32)
b = rng.integers(3, 23, size=(B, L)).astype(np.int32)
la = rng.integers(60, L + 1, size=B).astype(np.int32)
lb = rng.integers(60, L + 1, size=B).astype(np.int32)
for i in range(B):
    a[i, la[i]:] = 0
    b[i, lb[i]:] = 0
wd = [stripe(int(la[i]), int(lb[i]), -60) for i in range(B)]
lw = np.array([w.lw for w in wd], np.int32)
up = np.array([w.up for w in wd], np.int32)
exg = rng.integers(0, 2, size=(B, 4)).astype(bool)
got = np.asarray(pp.pallas_pairwise_scores(a, b, la, lb, mtx, 2.0, 9.0,
                                           tgapf=0.5, exg=exg, lw=lw, up=up))
want = np.asarray(wavefront_scores(
    a, b, la, lb, lw, up, mtx,
    np.full(B, 2.0, np.float32), np.full(B, 9.0, np.float32),
    np.full(B, 0.5, np.float32), exg,
    nslot=int(max(w.width for w in wd)) + 2, nsteps=int((la + lb).max()),
    dim=25, local=False))
err = np.abs(got - want).max()
print("banded+exg+tgapf err:", err, flush=True)
assert err < 2e-3, (got[:5], want[:5])

# --- throughput: bench workload ---
B, L, N = 512, 512, 24
w = stripe(L, L, -60)
la = np.full(B, L, np.int32); lb = la.copy()
lw = np.full(B, w.lw, np.int32); up = np.full(B, w.up, np.int32)
planes = np.zeros((B, pp.NPLANE), np.float32)
planes[:, 0] = L; planes[:, 1] = L; planes[:, 2] = 2.0; planes[:, 3] = 9.0
planes[:, 4:8] = 1.0; planes[:, 8] = w.lw; planes[:, 9] = w.up
prm = np.broadcast_to(
    planes.reshape(B//pp.GROUP, pp.GROUP, pp.NPLANE, 1).transpose(0,2,1,3),
    (B//pp.GROUP, pp.NPLANE, pp.GROUP, 128)).copy()
prmd = jax.device_put(prm); mtxd = jax.device_put(mtx)
A = rng.integers(3, 23, size=(N, B, L)).astype(np.int32)
Bb = rng.integers(3, 23, size=(N, B, L)).astype(np.int32)
Ad, Bd = jax.device_put(A), jax.device_put(Bb)
Wp = pp._pad_to(int((up - lw).max()) + 1, 128)

@jax.jit
def many(Ad, Bd):
    def body(c, ab):
        aa, bb = ab
        out = pp._prepare_and_launch(aa, bb, prmd, mtxd,
                                     La_p=512, Wp=Wp, dim=25,
                                     lw0=int(lw.min()))
        return c, out[:, :, 0]
    return jax.lax.scan(body, 0, (Ad, Bd))[1]

outs = np.asarray(many(Ad, Bd))
# spot-check launch 0 vs oracle
nchk = 8
want = np.asarray(wavefront_scores(
    A[0, :nchk], Bb[0, :nchk], la[:nchk], lb[:nchk], lw[:nchk], up[:nchk],
    mtx, np.full(nchk, 2.0, np.float32), np.full(nchk, 9.0, np.float32),
    np.ones(nchk, np.float32), np.zeros((nchk, 4), bool),
    nslot=w.width + 2, nsteps=2 * L - 1, dim=25, local=False))
err = np.abs(outs[0].reshape(-1)[:nchk] - want).max()
print("bench-shape err:", err, flush=True)

def band_cells(la_, lb_, lw_, up_):
    m = np.arange(la_)[:, None]; n = np.arange(lb_)[None, :]
    r = n - m
    return int(((r >= lw_) & (r <= up_)).sum())

best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    _ = np.asarray(many(Ad, Bd))
    best = min(best, time.perf_counter() - t0)
cells = N * B * band_cells(L, L, w.lw, w.up)
print("time %.1f ms  (%.2f ms/launch)  %.1f GCUPS" %
      (best * 1e3, best / N * 1e3, cells / best / 1e9), flush=True)
