"""Band-frontier ring (ops/frontier.py): one pair's band split over a
device mesh must score exactly like the single-device sweep."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from prrn_aln_tpu.ops.frontier import frontier_pairwise_score
from prrn_aln_tpu.ops.pairwise import wavefront_scores


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_frontier_matches_single_device(ndev):
    if len(jax.devices()) < ndev:
        pytest.skip("needs virtual multi-device mesh")
    rng = np.random.default_rng(9)
    la = lb = 96
    a = rng.integers(0, 24, la).astype(np.int32)
    b = rng.integers(0, 24, lb).astype(np.int32)
    mtx = rng.normal(0, 2, (26, 26)).astype(np.float32)
    lw, up = -40, 40
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("band",))
    got = frontier_pairwise_score(a, b, lw, up, 2.0, 9.0, mtx, mesh)
    want = float(np.asarray(wavefront_scores(
        a[None], b[None], np.array([la]), np.array([lb]),
        np.array([lw]), np.array([up]), mtx,
        np.full(1, 2.0, np.float32), np.full(1, 9.0, np.float32),
        np.ones(1, np.float32), np.zeros((1, 4), bool),
        nslot=up - lw + 3, nsteps=la + lb + 1, dim=26))[0])
    assert abs(got - want) <= 1e-3 * max(1.0, abs(want)), (got, want)


def test_maybe_init_distributed_noop(monkeypatch):
    from prrn_aln_tpu.ops.frontier import maybe_init_distributed
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("PRRN_DIST", raising=False)
    assert maybe_init_distributed() is False
