"""Merging alignments along a DP path (reference syntheseq/aggregate,
maln2.cc:2027-2046, mgaps.cc:282-384)."""

from __future__ import annotations

import numpy as np

from .. import alphabet as ab
from .msa import Msa


def merge_msas(A: Msa, B: Msa, skl) -> Msa:
    """Build the joint MSA of A and B along the SKL path: diagonal steps
    take a column from each side; vertical steps pad B with gaps,
    horizontal steps pad A."""
    from ..ops.path_score import skl_to_moves
    moves = skl_to_moves(skl)
    L = len(moves)
    many = A.many + B.many
    out = np.full((many, L), ab.GAP, np.int8)
    m = n = 0
    for c, mv in enumerate(moves):
        if mv == 0:
            out[:A.many, c] = A.codes[:, m]
            out[A.many:, c] = B.codes[:, n]
            m += 1
            n += 1
        elif mv == 1:
            out[:A.many, c] = A.codes[:, m]
            m += 1
        else:
            out[A.many:, c] = B.codes[:, n]
            n += 1
    names = list(A.names) + list(B.names)
    weight = None
    if A.weight is not None and B.weight is not None:
        weight = np.concatenate([A.weight, B.weight])
    eij = None
    if A.eij is not None or B.eij is not None:
        eij = list(A.eij or [None] * A.many) + list(B.eij or [None] * B.many)
    return Msa(codes=out, molc=A.molc, names=names, weight=weight,
               tgapf=A.tgapf, eij=eij)
