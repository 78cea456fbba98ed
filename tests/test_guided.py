"""Guide-tree mode (-b): progressive along a user Newick tree."""

import os
import re
from pathlib import Path

import pytest

from prrn_aln_tpu import io
from prrn_aln_tpu.pipeline import build_msa_guided

FIX = Path(__file__).parent / "fixtures"


@pytest.mark.slow
def test_guided_matches_reference(monkeypatch):
    monkeypatch.chdir(FIX)   # tree leaf labels are relative file paths
    msa = build_msa_guided("guide5.nwk", randseed=0)
    rows = {}
    for line in (FIX / "golden_prrn_guided5.txt").read_text().splitlines():
        mt = re.match(r"\s*\d+ (.{1,61})\| (\S+)", line)
        if mt:
            rows.setdefault(mt.group(2), []).append(mt.group(1).rstrip())
    golden = {k: "".join(v) for k, v in rows.items()}
    assert set(msa.names) == set(golden)
    # row order depends on tie-sensitive intermediate lengths (operand
    # swap rule); require byte-exact rows by name
    for i, n in enumerate(msa.names):
        assert io.decode_row(msa, i) == golden[n], n
