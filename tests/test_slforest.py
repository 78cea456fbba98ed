"""sl-forest scale-out path: sparse edges, Kruskal forest, large de-novo."""

import random

import numpy as np
import pytest

from prrn_aln_tpu import alphabet as ab, io as pio
from prrn_aln_tpu.io import SeqRecord
from prrn_aln_tpu.msa import slforest
from prrn_aln_tpu.msa.slforest import Edge


def test_build_forest_caps():
    edges = [Edge(0, 1, 5.0), Edge(1, 2, 6.0), Edge(2, 3, 7.0),
             Edge(4, 5, 8.0), Edge(3, 4, 90.0)]
    trees, singles = slforest.build_forest(7, edges, thr=70.0)
    sizes = sorted(t.ndesc for t in trees)
    assert sizes == [2, 4]          # 90.0 edge above threshold
    assert singles == [6]

    # with min_memb=1 the cap graduates trees instead of absorbing
    # singletons past it (FindUnion::merge npr[y] >= min_memb condition)
    trees, singles = slforest.build_forest(7, edges, thr=70.0, max_memb=3,
                                           min_memb=1)
    assert max(t.ndesc for t in trees) <= 3


def _family(seed, length, count, prefix):
    rng = random.Random(seed)
    base = "".join(rng.choice("ACGT") for _ in range(length))

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.01:
                continue
            if r < 0.02:
                out.append(ch)
                out.append(rng.choice("ACGT"))
                continue
            if r < 0.10:
                out.append(rng.choice("ACGT"))
                continue
            out.append(ch)
        return "".join(out)

    return [SeqRecord(f"{prefix}{i}", mutate(base)) for i in range(count)]


@pytest.mark.slow
def test_large_denovo_pipeline():
    recs = _family(1, 220, 10, "a") + _family(2, 230, 9, "b")
    from prrn_aln_tpu.pipeline import build_msa
    msa = build_msa(recs, randseed=0, maxitr=1)
    assert msa.many == len(recs)
    originals = {r.name: r.seq for r in recs}
    for i, n in enumerate(msa.names):
        assert pio.decode_row(msa, i).replace("-", "") == originals[n], n
    # the two families should be contiguous blocks in the output
    fams = ["ab"[n.startswith("b")] for n in msa.names]
    assert fams == sorted(fams) or fams == sorted(fams, reverse=True)
