"""MinHash-LSH M-nearest candidate discovery (kmer_knn_candidates):
sub-quadratic replacement for the O(N^2) k-mer Gram pass on the
sl-forest edge path (reference role: blksrc.cc block index)."""

import numpy as np
import pytest

from prrn_aln_tpu import alphabet as ab
from prrn_aln_tpu.msa import kmer as K
from prrn_aln_tpu.msa.slforest import build_forest, Edge


def _families(rng, nfam=3, per=30, L=300):
    seqs = []
    for _ in range(nfam):
        base = rng.integers(3, 7, L)
        for _ in range(per):
            s = base.copy()
            mut = rng.integers(0, L, L // 25)
            s[mut] = ((s[mut] - 3 + 1) % 4) + 3
            seqs.append(s.astype(np.int64))
    return seqs


def test_knn_candidates_family_structure():
    rng = np.random.default_rng(2)
    per = 30
    seqs = _families(rng, per=per)
    pairs, dist = K.kmer_knn_candidates(seqs, ab.DNA, m_nearest=6)
    fam = lambda i: i // per
    same = sum(1 for i, j in pairs if fam(i) == fam(j))
    assert same / len(pairs) > 0.9
    assert all((i, j) in dist for i, j in pairs)
    # every node proposed at least one candidate
    touched = set()
    for i, j in pairs:
        touched.add(i)
        touched.add(j)
    assert len(touched) == len(seqs)


def test_knn_forest_partition_matches_dense():
    """Kruskal forest over LSH candidates yields the same partition as
    the dense M-nearest pass (edge exactness is soft, SURVEY A.8 --
    the PARTITION is what the pipeline consumes)."""
    rng = np.random.default_rng(5)
    per = 30
    seqs = _families(rng, nfam=3, per=per)
    n = len(seqs)

    def partition(pairs, dist):
        edges = [Edge(i, j, dist[(i, j)]) for i, j in pairs]
        trees, _ = build_forest(n, edges, thr=10.0)
        return {frozenset(t.leaves()) for t in trees}

    pairs, dist = K.kmer_knn_candidates(seqs, ab.DNA, m_nearest=6)
    # dense reference: full matrix, top-6 per node
    from prrn_aln_tpu.msa import distance as dmod
    kd = K.kmer_distance_matrix(seqs, ab.DNA)

    def kdist(i, j):
        return kd[dmod.condensed_index(i, j)]

    dpairs = set()
    for i in range(n):
        near = sorted((kdist(i, j), j) for j in range(n) if j != i)[:6]
        for _, j in near:
            dpairs.add((min(i, j), max(i, j)))
    ddist = {(i, j): kdist(i, j) for i, j in dpairs}
    assert partition(pairs, dist) == partition(sorted(dpairs), ddist)
