#!/usr/bin/env python3
"""Benchmark: sustained DP cell-update throughput of the batched pairwise
wavefront kernel (Pallas; the distance-matrix workhorse).

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
    from prrn_aln_tpu.ops import pallas_pairwise as pp

    rng = np.random.default_rng(7)
    # distance-pass scale: one launch = 256 pairs (sl-forest edge
    # batches run thousands); big enough to amortize dispatch latency
    B, L = 512, 512
    mtx, _ = scoring.protein_matrix(AlnParams(pam=150))

    prm = np.zeros((B // pp.GROUP, 8, pp.GROUP, 128), np.float32)
    prm[:, 0] = L
    prm[:, 1] = L
    prm[:, 2] = 2.0
    prm[:, 3] = 9.0
    prm[:, 4:8] = 1.0
    prmd = jax.device_put(prm)
    mtxd = jax.device_put(mtx)

    nsets = 8
    sets = []
    for _ in range(nsets):
        a = rng.integers(3, 23, size=(B, L)).astype(np.int32)
        b = rng.integers(3, 23, size=(B, L)).astype(np.int32)
        sets.append((jax.device_put(a), jax.device_put(b)))

    kw = dict(la_pad=512, lb_pad=512, dim=mtx.shape[0])
    out = pp._prepare_and_launch(*sets[0], prmd, mtxd, **kw)
    out.block_until_ready()

    reps = 40
    t0 = time.perf_counter()
    outs = []
    for i in range(reps):
        a, b = sets[i % nsets]
        outs.append(pp._prepare_and_launch(a, b, prmd, mtxd, **kw))
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    cells = B * L * L
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "pairwise_wavefront_throughput",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 1000.0, 6),
    }))


if __name__ == "__main__":
    main()
