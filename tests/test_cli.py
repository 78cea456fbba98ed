"""CLI smoke + golden-body tests."""

import re
from pathlib import Path

import pytest

from prrn_aln_tpu import io
from prrn_aln_tpu.cli import aln_main, prrn_main, phyln_main

FIX = Path(__file__).parent / "fixtures"


def _golden_rows(fname):
    path = Path(fname)
    if not path.is_absolute():
        path = FIX / fname
    rows = {}
    for line in path.read_text().splitlines():
        mt = re.match(r"\s*\d+ (.{1,61})\| (\S+)", line)
        if mt:
            rows.setdefault(mt.group(2), []).append(mt.group(1).rstrip())
    return {k: "".join(v) for k, v in rows.items()}


def test_aln_group_merge_matches_reference(tmp_path, capsys):
    # reconstruct Multi_A / Multi_B from the galign fixture
    import json
    gfix = json.loads((FIX / "galign_fixtures.json").read_text())
    paths = []
    for key in ("pas/Multi_A", "pas/Multi_B"):
        info = gfix["files"][key]
        p = tmp_path / key.split("/")[-1]
        with open(p, "w") as f:
            f.write(f"{len(info['rows']):5d}{len(info['rows'][0]):6d}\tx\n")
            for n, r in zip(info["names"], info["rows"]):
                f.write(f">{n}\n{r}\n/\n")
        paths.append(str(p))
    out = tmp_path / "out.txt"
    assert aln_main([*paths, "-o", str(out)]) == 0
    # full-file byte parity: header, PAM/FSTAT framing, consensus
    # rows, trailer (sqpr.cc:1133-1196 print2)
    assert out.read_text() == (FIX / "golden_aln_multiAB.txt") \
        .read_text()


def test_prrn_cli_runs(tmp_path):
    out = tmp_path / "msa.fasta"
    rc = prrn_main([str(FIX / "dnafam.fa"), "-F", "fasta", "-R", "0",
                    "-o", str(out)])
    assert rc == 0
    recs = io.read_fasta(out)
    assert len(recs) == 6


def test_phyln_cli(capsys):
    rc = phyln_main([str(FIX / "dnafam.fa")])
    assert rc == 0
    newick = capsys.readouterr().out
    assert newick.count("(") == 5 and newick.endswith(";\n")

    rc = phyln_main(["-m", "nj", str(FIX / "dnafam.fa")])
    assert rc == 0
    newick = capsys.readouterr().out
    assert newick.count("(") == 5


def test_shuffle_significance():
    import numpy as np
    from prrn_aln_tpu import scoring, alphabet
    from prrn_aln_tpu.config import AlnParams
    from prrn_aln_tpu.msa.shuffle import shuffle_test
    mtx, _ = scoring.protein_matrix(AlnParams(pam=150))
    a = alphabet.encode("MKVLAAGFDDEERRKKLLMMNPQSTWYHIV" * 4,
                        alphabet.PROTEIN).astype(np.int32)
    b = alphabet.encode("MKVLAGGFDEEERRKQLLMMNPQATWYHIV" * 4,
                        alphabet.PROTEIN).astype(np.int32)
    r = shuffle_test(a, b, mtx, u=2.0, v=9.0, sh=-50, njumble=8)
    assert r["dev"] > 3.0          # homologs score far above shuffles
    assert r["score"] > r["mean"]


def test_aln_pileup_and_tree_modes(tmp_path, capsys):
    from prrn_aln_tpu.cli import aln_main
    seqs = {"s1": "MKVLWAAGLF", "s2": "MKVLWAGLF", "s3": "MRVLWAAGIF"}
    files = []
    for n, s in seqs.items():
        f = tmp_path / f"{n}.fa"
        f.write_text(f">{n}\n{s}\n")
        files.append(str(f))
    rc = aln_main(["-a", "-F", "fasta"] + files)
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count(">") == 3 and "MKVLW" in out.replace("-", "")
    # guide-tree mode
    tree = tmp_path / "t.nwk"
    tree.write_text(f"(({files[0]},{files[1]}),{files[2]});\n")
    rc = aln_main(["-b", str(tree), "-F", "fasta"])
    out = capsys.readouterr().out
    assert rc == 0 and out.count(">") == 3


def test_aln_catalog_modes(tmp_path, capsys):
    from prrn_aln_tpu.cli import aln_main
    f = tmp_path / "all.fa"
    f.write_text(">a\nMKVLWAAG\n>b\nMKVLWAG\n>c\nMRVLWAAG\n>d\nMKILWAAG\n")
    rc = aln_main(["-i", "e", str(f)])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("! ") == 6          # all pairs of 4
    rc = aln_main(["-i", "f", str(f)])
    out = capsys.readouterr().out
    assert out.count("! ") == 3 and "! a x" in out
    # catalog file listing inputs
    cat = tmp_path / "cat.txt"
    cat.write_text(f"{f}\n")
    rc = aln_main(["-i", f"a:{cat}"])
    out = capsys.readouterr().out
    assert out.count("! ") == 2
