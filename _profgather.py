import time
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(7)
B, L, W, D = 512, 512, 128, 25
N = 8
mtx = rng.normal(size=(D, D)).astype(np.float32)
A = rng.integers(3, 23, size=(N, B, L)).astype(np.int32)
Bb = rng.integers(3, 23, size=(N, B, L)).astype(np.int32)
lw = np.full((B,), -60, np.int32)
Ad, Bd = jax.device_put(A), jax.device_put(Bb)
mtxd = jax.device_put(mtx)
lwd = jax.device_put(lw)
flat = mtxd.reshape(-1)
hi = jax.lax.Precision.HIGHEST

def mk(stage):
    @jax.jit
    def fn(Ad, Bd):
        def body(c, ab):
            a, b = ab
            m = jnp.arange(L)[:, None]
            j = jnp.arange(W)[None, :]
            col = m + lw[0] + j                     # static lw variant
            colc = jnp.clip(col, 0, L - 1)
            if stage == "flatgather":
                idx = a[:, :, None] * D + b[:, colc]
                S = flat[idx]
            elif stage == "twostep":
                P = mtxd[a]                          # (B, L, D)
                bc = b[:, colc]                      # (B, L, W)
                S = jnp.take_along_axis(P, bc, axis=2)
            elif stage == "einsum_packed":
                P = jnp.einsum("bmc,cd->bmd",
                               jax.nn.one_hot(a, D, dtype=jnp.float32),
                               mtxd, precision=hi)   # (B, L, D)
                bc = b[:, colc]
                OH = jax.nn.one_hot(bc, D, dtype=jnp.float32)  # (B,L,W,D)
                S = jnp.einsum("bmd,bmjd->bmj", P, OH, precision=hi)
            return c, S.sum((1, 2))
        return jax.lax.scan(body, 0, (Ad, Bd))[1]
    return fn

for name in ("flatgather", "twostep", "einsum_packed"):
    try:
        fn = mk(name)
        r = np.asarray(fn(Ad, Bd))
        t0 = time.perf_counter(); r = np.asarray(fn(Ad, Bd)); dt = time.perf_counter() - t0
        print("%-14s %.2f ms/launch" % (name, dt / N * 1000), flush=True)
    except Exception as e:
        print(name, "FAIL", repr(e)[:200], flush=True)
