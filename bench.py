#!/usr/bin/env python3
"""Benchmark: sustained DP cell-update throughput of the batched pairwise
wavefront kernel (the distance-matrix workhorse).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the fraction of the 1 TCUPS/chip target (BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    from prrn_aln_tpu import scoring
    from prrn_aln_tpu.config import AlnParams
    from prrn_aln_tpu.ops.pairwise import wavefront_scores

    rng = np.random.default_rng(7)
    B, L = 64, 512
    sh = 60 * L // 100
    lw_v, up_v = -sh, sh

    a = rng.integers(3, 23, size=(B, L)).astype(np.int32)
    b = rng.integers(3, 23, size=(B, L)).astype(np.int32)
    la = np.full(B, L, np.int32)
    lb = np.full(B, L, np.int32)
    lw = np.full(B, lw_v, np.int32)
    up = np.full(B, up_v, np.int32)
    mtx, _ = scoring.protein_matrix(AlnParams(pam=150))
    u = np.full(B, 2.0, np.float32)
    v = np.full(B, 9.0, np.float32)
    tg = np.ones(B, np.float32)
    exg = np.zeros((B, 4), bool)

    nslot = up_v - lw_v + 3
    nsteps = 2 * L - 1
    kwargs = dict(nslot=nslot, nsteps=nsteps, dim=mtx.shape[0], local=False)

    # warmup/compile
    out = wavefront_scores(a, b, la, lb, lw, up, mtx, u, v, tg, exg, **kwargs)
    out.block_until_ready()

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = wavefront_scores(a, b, la, lb, lw, up, mtx, u, v, tg, exg,
                               **kwargs)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    # true banded cells per pair
    cells_per_pair = 0
    for m in range(L):
        n_lo = max(0, m + lw_v)
        n_hi = min(L - 1, m + up_v)
        cells_per_pair += max(0, n_hi - n_lo + 1)
    total_cells = cells_per_pair * B
    gcups = total_cells / dt / 1e9

    print(json.dumps({
        "metric": "pairwise_wavefront_throughput",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 1000.0, 6),
    }))


if __name__ == "__main__":
    main()
