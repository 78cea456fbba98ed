"""Device (JAX) fwd2s kernel vs the NumPy oracle: score + path parity."""

import json
from pathlib import Path

import numpy as np
import pytest

from prrn_aln_tpu import alphabet as ab, scoring
from prrn_aln_tpu.config import default_params
from prrn_aln_tpu.ops.spliced_np import spliced_align_np
from prrn_aln_tpu.ops.spliced_jax import spliced_align_device
from prrn_aln_tpu.ops.window import stripe
from prrn_aln_tpu.splice.penalty import IntronPenalty
from prrn_aln_tpu.splice.signals import SpliceSignals

FIX = Path(__file__).parent / "fixtures"


def _mk_gene(rng, nexon=3, exon=(20, 60), intron=(25, 120)):
    """Random gene: exons joined by GT..AG introns."""
    bases = "ACGT"
    genome = []
    cdna = []
    for k in range(nexon):
        ex = "".join(rng.choice(list(bases))
                     for _ in range(rng.integers(*exon)))
        genome.append(ex)
        cdna.append(ex)
        if k < nexon - 1:
            ilen = int(rng.integers(*intron))
            mid = "".join(rng.choice(list(bases))
                          for _ in range(max(ilen - 4, 1)))
            genome.append("GT" + mid + "AG")
    return "".join(genome), "".join(cdna)


def _run_both(gen, cdna, sh=-50, exga=(True, True), exgb=(True, True)):
    bg = ab.encode(gen, ab.DNA)
    ac = ab.encode(cdna, ab.DNA)
    mtx, _ = scoring.dna_matrix(default_params(ab.DNA, "aln"))
    sig = SpliceSignals.build(bg)
    ipen = IntronPenalty.build()
    w = stripe(len(ac), len(bg), sh)
    s_np, k_np = spliced_align_np(ac, bg, sig, ipen, mtx,
                                  lw=w.lw, up=w.up, exga=exga, exgb=exgb)
    s_dv, k_dv = spliced_align_device(ac, bg, sig, ipen, mtx,
                                      lw=w.lw, up=w.up,
                                      exga=exga, exgb=exgb)
    return (s_np, k_np), (s_dv, k_dv)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_matches_oracle_random_genes(seed):
    rng = np.random.default_rng(seed)
    gen, cdna = _mk_gene(rng)
    (s_np, k_np), (s_dv, k_dv) = _run_both(gen, cdna)
    assert abs(s_dv - s_np) <= 1e-3 * max(1.0, abs(s_np))
    assert k_dv == k_np


def test_device_matches_oracle_fixture_case():
    gen = "".join(l.strip() for l in
                  (FIX / "gen1.fa").read_text().splitlines()
                  if not l.startswith(">"))
    cdna = "".join(l.strip() for l in
                   (FIX / "cdna1.fa").read_text().splitlines()
                   if not l.startswith(">"))
    (s_np, k_np), (s_dv, k_dv) = _run_both(gen, cdna)
    assert abs(s_dv - s_np) <= 1e-3 * max(1.0, abs(s_np))
    assert k_dv == k_np


def test_device_matches_oracle_global_ends():
    rng = np.random.default_rng(7)
    gen, cdna = _mk_gene(rng, nexon=2)
    (s_np, k_np), (s_dv, k_dv) = _run_both(
        gen, cdna, exga=(False, False), exgb=(False, False))
    assert abs(s_dv - s_np) <= 1e-3 * max(1.0, abs(s_np))
    assert k_dv == k_np


def test_device_matches_oracle_mismatches():
    rng = np.random.default_rng(11)
    gen, cdna = _mk_gene(rng)
    # point mutations + a small deletion in the cDNA
    c = list(cdna)
    for p in rng.integers(0, len(c), 6):
        c[p] = "ACGT"[rng.integers(0, 4)]
    del c[10:13]
    (s_np, k_np), (s_dv, k_dv) = _run_both(gen, "".join(c))
    assert abs(s_dv - s_np) <= 1e-3 * max(1.0, abs(s_np))
    assert k_dv == k_np
