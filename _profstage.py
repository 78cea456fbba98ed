import time
import numpy as np, jax, jax.numpy as jnp
from prrn_aln_tpu import scoring
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.ops import pallas_pairwise as pp
from prrn_aln_tpu.ops.window import stripe

rng = np.random.default_rng(7)
B, L, N = 512, 512, 8
mtx, _ = scoring.protein_matrix(AlnParams(pam=150))
dim = mtx.shape[0]
w = stripe(L, L, -60)
lw0 = w.lw
Wp = pp._pad_to(w.up - w.lw + 1, 128)
planes = np.zeros((B, pp.NPLANE), np.float32)
planes[:, 0] = L; planes[:, 1] = L; planes[:, 2] = 2.0; planes[:, 3] = 9.0
planes[:, 4:8] = 1.0; planes[:, 8] = w.lw; planes[:, 9] = w.up
prm = np.broadcast_to(planes.reshape(B//pp.GROUP, pp.GROUP, pp.NPLANE, 1).transpose(0,2,1,3),
                      (B//pp.GROUP, pp.NPLANE, pp.GROUP, 128)).copy()
prmd = jax.device_put(prm); mtxd = jax.device_put(mtx)
A = rng.integers(3, 23, size=(N, B, L)).astype(np.int32)
Bb = rng.integers(3, 23, size=(N, B, L)).astype(np.int32)
Ad, Bd = jax.device_put(A), jax.device_put(Bb)
hi = jax.lax.Precision.HIGHEST
print("Wp =", Wp, "lw0 =", lw0, flush=True)

Np = pp._pad_to(max(L, Wp), 128)
def build_S(a, b):
    # mirrors pp._prepare_and_launch's round-4 direct-layout build
    Bp, Ma = a.shape
    g = pp.GROUP
    a_pad = jnp.pad(a, ((0, 0), (0, L - Ma)), constant_values=dim)
    b_pad = jnp.pad(b, ((0, 0), (0, Np - b.shape[1])), constant_values=dim)
    onehot_a = jax.nn.one_hot(a_pad, dim, dtype=jnp.float32)
    onehot_b = jax.nn.one_hot(b_pad, dim, dtype=jnp.float32)
    P = jnp.einsum("bmc,cd->bmd", onehot_a, mtxd.astype(jnp.float32),
                   precision=hi)
    S = jnp.einsum("bgmd,bgnd->bgmn",
                      P.reshape(Bp // g, g, L, dim),
                      onehot_b.reshape(Bp // g, g, Np, dim), precision=hi)
    lav = prmd[:, 0, :, 0][:, :, None, None]
    lbv = prmd[:, 1, :, 0][:, :, None, None]
    lwv = prmd[:, 8, :, 0][:, :, None, None]
    upv = prmd[:, 9, :, 0][:, :, None, None]
    m_i = jnp.arange(L, dtype=jnp.float32)[None, None, :, None]
    n_i = jnp.arange(Np, dtype=jnp.float32)[None, None, None, :]
    r = n_i - m_i
    ok = ((r >= lwv) & (r <= upv) & (m_i < lav) & (n_i < lbv))
    return jnp.where(ok, S, pp.NEG_SENT)

def mk(stage):
    @jax.jit
    def fn(Ad, Bd):
        def body(c, ab):
            a, b = ab
            if stage == "full":
                out = pp._prepare_and_launch(a, b, prmd, mtxd, La_p=L,
                                             Wp=Wp, dim=dim, lw0=lw0)
                return c, out[:, :, 0]
            S = build_S(a, b)
            if stage == "kernel":
                out = pp._launch(S, prmd, La_p=L, Wp=Wp, Np=Np, lw0=lw0)
                return c, out[:, :, 0]
            return c, S.sum((1, 3))[:, :1]
        return jax.lax.scan(body, 0, (Ad, Bd))[1]
    return fn

for name in ("build", "kernel", "full"):
    fn = mk(name)
    r = np.asarray(fn(Ad, Bd))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); r = np.asarray(fn(Ad, Bd))
        best = min(best, time.perf_counter()-t0)
    print("%-6s %.1f ms/launch" % (name, best/N*1000), flush=True)
