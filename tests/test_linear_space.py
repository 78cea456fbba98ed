"""Linear-space (checkpoint/recompute) aligner vs the standard path.

group_align_linear must return the identical score and SKL while never
materializing more than one chunk of direction planes (the reference's
Hirschberg capability, src/fwd2b1.cc:492,1053-1078, re-designed as
blockwise recomputation).
"""

import numpy as np
import pytest

from prrn_aln_tpu import scoring, alphabet as ab
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.msa.msa import Msa
from prrn_aln_tpu.ops import group as gops
from prrn_aln_tpu.ops.window import stripe

MTX, _ = scoring.protein_matrix(AlnParams(pam=150))


def _mk(rng, many, L, gap=0.06):
    codes = (rng.integers(0, 20, size=(many, L)) + ab.ALA).astype(np.int8)
    gaps = rng.random((many, L)) < gap
    codes[gaps] = ab.GAP
    codes[:, 0] = ab.ALA
    m = Msa(codes=codes, molc=ab.PROTEIN,
            names=[f"s{i}" for i in range(many)])
    m.prepare(MTX.shape[0])
    return m


@pytest.fixture(autouse=True)
def _force_pallas():
    gops.USE_PALLAS_GROUP = True
    yield
    gops.USE_PALLAS_GROUP = None


@pytest.mark.parametrize("many,L,chunk", [(1, 150, 128), (3, 120, 64)])
def test_linear_matches_standard(many, L, chunk):
    rng = np.random.default_rng(31 + many)
    A = _mk(rng, many, L)
    B = _mk(rng, many, L + 17)
    wdw = stripe(A.length, B.length, -60)
    s0, k0 = gops.group_align(A, B, MTX, u=2.0, v=9.0, wdw=wdw)
    s1, k1 = gops.group_align_linear(A, B, MTX, u=2.0, v=9.0, wdw=wdw,
                                     chunk=chunk)
    assert s1 == pytest.approx(s0, rel=1e-6, abs=1e-3)
    assert k1 == k0


def test_linear_single_chunk_degenerate():
    rng = np.random.default_rng(5)
    A = _mk(rng, 2, 40)
    B = _mk(rng, 2, 44)
    wdw = stripe(A.length, B.length, -100)
    s0, k0 = gops.group_align(A, B, MTX, u=2.0, v=9.0, wdw=wdw)
    s1, k1 = gops.group_align_linear(A, B, MTX, u=2.0, v=9.0, wdw=wdw,
                                     chunk=4096)
    assert s1 == pytest.approx(s0, rel=1e-6, abs=1e-3)
    assert k1 == k0
