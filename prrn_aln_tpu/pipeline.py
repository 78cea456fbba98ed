"""End-to-end MSA pipeline (the prrn flagship path).

Unaligned sequences -> all-pairs wavefront distances -> UPGMA guide tree ->
progressive profile alignment -> randomized iterative refinement
(reference flow: prrn5.cc makemsa :961-987 + IterMsa::msa :909-917).
"""

from __future__ import annotations

import numpy as np

from . import alphabet as ab
from . import scoring
from .config import AlnParams, default_params
from .io import SeqRecord, records_to_msa
from .msa.msa import Msa, single
from .msa import distance, tree
from .msa.progressive import progressive_msa
from .msa.refine import refine_msa
from .utils.crand import GlibcRand


def build_msa(records: list[SeqRecord], params: AlnParams | None = None,
              molc: int | None = None, maxitr: int = 10,
              randseed: int = 1, refine: bool = True,
              mesh=None) -> Msa:
    if molc is None:
        molc = ab.infer_molc(records[0].seq)
    if params is None:
        params = default_params(molc, "prrn")
    mtx, _ = scoring.build_matrix(molc, params)

    seqs = [ab.encode(r.seq.replace("-", ""), molc) for r in records]
    names = [r.name for r in records]

    if len(seqs) == 1:
        return single(seqs[0], molc, names[0])

    d = distance.distance_matrix(seqs, mtx, u=params.u, v=params.v,
                                 sh=params.sh, mesh=mesh)
    t = tree.upgma(d, len(seqs))

    leaves = [single(s, molc, n) for s, n in zip(seqs, names)]
    msa = progressive_msa(leaves, t, mtx, u=params.u, v=params.v,
                          sh=params.sh)
    if refine and msa.many > 2:
        crand = GlibcRand(1)
        res = refine_msa(msa, mtx, u=params.u, v=params.v, sh=params.sh,
                         maxitr=maxitr, randseed=randseed, crand=crand)
        msa = res.msa
    return msa
