"""Shuffle significance test (aln -R): Z-score of the real alignment
score against residue-shuffled versions (reference: autocomp.h:170-195
ShuffleServer, calcserv.h:694-704 fpavsd).

All shuffles are scored in ONE batched wavefront launch — the reference's
serial jumble loop becomes a batch axis.
"""

from __future__ import annotations

import numpy as np

from ..ops.window import stripe
from ..ops.pairwise import wavefront_scores


def shuffle_test(a: np.ndarray, b: np.ndarray, mtx, u: float, v: float,
                 sh: int, njumble: int = 10, which: int = 3,
                 seed: int = 1) -> dict:
    """Returns {score, mean, sd, dev, njumble}."""
    rng = np.random.default_rng(seed)
    A = [a]
    B = [b]
    for _ in range(njumble):
        A.append(rng.permutation(a) if which & 1 else a)
        B.append(rng.permutation(b) if which & 2 else b)
    Bn = len(A)
    ma, mb = len(a), len(b)
    a_batch = np.stack(A).astype(np.int32)
    b_batch = np.stack(B).astype(np.int32)
    la = np.full(Bn, ma, np.int32)
    lb = np.full(Bn, mb, np.int32)
    wdw = stripe(ma, mb, sh)
    lw = np.full(Bn, wdw.lw, np.int32)
    up = np.full(Bn, wdw.up, np.int32)
    scores = np.asarray(wavefront_scores(
        a_batch, b_batch, la, lb, lw, up, mtx,
        np.full(Bn, u, np.float32), np.full(Bn, v, np.float32),
        np.ones(Bn, np.float32), np.zeros((Bn, 4), bool),
        nslot=wdw.width, nsteps=ma + mb - 1, dim=mtx.shape[0],
        local=False))
    real = float(scores[0])
    sample = scores[1:]
    mean = float(sample.mean())
    sd = float(sample.std())
    dev = (real - mean) / sd if sd > 0 else 0.0
    return {"score": real, "mean": mean, "sd": sd, "dev": dev,
            "njumble": njumble}
