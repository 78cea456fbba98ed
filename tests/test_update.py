"""prrn update mode (-U): combine pre-aligned MSAs + refine."""

import copy
import json
import re
from pathlib import Path

import pytest

from prrn_aln_tpu import io, alphabet
from prrn_aln_tpu.msa.msa import msa_from_strings
from prrn_aln_tpu.pipeline import update_msa

FIX = Path(__file__).parent / "fixtures"


def _groups():
    gfix = json.loads((FIX / "galign_fixtures.json").read_text())
    return [msa_from_strings(gfix["files"][k]["rows"], alphabet.PROTEIN,
                             gfix["files"][k]["names"])
            for k in ("pas/Multi_A", "pas/Multi_B")]


def _golden(p):
    rows = {}
    for line in (FIX / p).read_text().splitlines():
        mt = re.match(r"\s*\d+ (.{1,61})\| (\S+)", line)
        if mt:
            rows.setdefault(mt.group(2), []).append(mt.group(1).rstrip())
    return {k: "".join(v) for k, v in rows.items()}


def test_combine_hosts_matches_reference():
    m = update_msa(_groups(), refine=False)
    g = _golden("golden_aln_multiAB.txt")
    assert m.names == list(g)
    for i, n in enumerate(m.names):
        assert io.decode_row(m, i) == g[n], n


@pytest.mark.slow
def test_update_refine_matches_reference():
    m = update_msa(_groups(), refine=True, randseed=0)
    g = _golden("golden_prrn_U_R0.txt")
    assert m.names == list(g)
    for i, n in enumerate(m.names):
        assert io.decode_row(m, i) == g[n], n
