"""P4: level-synchronous batched forest construction equals the serial
per-tree progressive build (reference thread fan-out prrn5.cc:1151-1155
recast as device batching)."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from prrn_aln_tpu import alphabet as ab, io as iomod, scoring
from prrn_aln_tpu.config import AlnParams
from prrn_aln_tpu.msa.msa import Msa
from prrn_aln_tpu.msa import tree as treemod
from prrn_aln_tpu.msa.progressive import (progressive_msa,
                                          progressive_msa_forest)


def _family(rng, nseq, L, seed_row):
    rows = []
    for _ in range(nseq):
        r = seed_row.copy()
        mut = rng.random(L) < 0.15
        r[mut] = rng.integers(0, 20, mut.sum()) + ab.ALA
        rows.append(r)
    return np.array(rows, np.int8)


def _forest(ntrees=4, nseq=5, L=60, seed=11):
    rng = np.random.default_rng(seed)
    mtx, _ = scoring.protein_matrix(AlnParams(pam=150))
    trees, leaves = [], []
    for t in range(ntrees):
        seed_row = (rng.integers(0, 20, L) + ab.ALA).astype(np.int8)
        fam = _family(rng, nseq, L, seed_row)
        ms = [Msa(codes=fam[i:i + 1], molc=ab.PROTEIN, names=[f"t{t}s{i}"])
              for i in range(nseq)]
        cond = [float((fam[i] != fam[j]).mean())
                for i in range(nseq) for j in range(i + 1, nseq)]
        trees.append(treemod.upgma(np.array(cond), nseq))
        leaves.append(ms)
    return trees, leaves, mtx


def _rows(m):
    return [iomod.decode_row(m, i) for i in range(m.many)]


def test_forest_matches_serial():
    trees, leaves, mtx = _forest()
    import copy
    serial = [progressive_msa(copy.deepcopy(ls), t, mtx, u=2.0, v=9.0,
                              sh=-60)
              for t, ls in zip(trees, copy.deepcopy(leaves))]
    batched = progressive_msa_forest(trees, leaves, mtx, u=2.0, v=9.0,
                                     sh=-60)
    assert len(batched) == len(serial)
    for b, s in zip(batched, serial):
        assert _rows(b) == _rows(s)


def test_forest_mesh_matches_serial():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs multi-device mesh")
    mesh = Mesh(np.array(devs), axis_names=("pairs",))
    trees, leaves, mtx = _forest(seed=13)
    import copy
    want = progressive_msa_forest(copy.deepcopy(trees),
                                  copy.deepcopy(leaves), mtx,
                                  u=2.0, v=9.0, sh=-60)
    got = progressive_msa_forest(trees, leaves, mtx, u=2.0, v=9.0,
                                 sh=-60, mesh=mesh)
    for b, s in zip(got, want):
        assert _rows(b) == _rows(s)
