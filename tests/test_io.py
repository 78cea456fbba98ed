"""I/O format readers and writers."""

from pathlib import Path

import pytest

from prrn_aln_tpu import io, alphabet as ab
from prrn_aln_tpu.msa.msa import msa_from_strings

FIX = Path(__file__).parent / "fixtures"


def test_read_formats_from_reference_corpus():
    # the reference sample corpus doubles as format fixtures (SURVEY §4)
    gb = io.read_genbank("/root/reference/sample/nas/GenBank") \
        if Path("/root/reference/sample/nas/GenBank").exists() else None
    if gb is not None:
        assert gb[0].name and len(gb[0].seq) > 1000
        embl = io.read_embl("/root/reference/sample/nas/EMBL")
        assert embl[0].name == "hm11b1" and len(embl[0].seq) == 2085


def test_read_swiss_pir_gde_bare_corpus():
    pas = Path("/root/reference/sample/pas")
    if not pas.exists():
        pytest.skip("reference corpus absent")
    sw = io.sniff_and_read(pas / "Swiss")
    assert sw[0].name == "ALB3_MAIZE" and len(sw[0].seq) == 303
    pir = io.sniff_and_read(pas / "Codata")
    assert pir[0].name == "S03172" and len(pir[0].seq) > 200
    assert pir[0].seq.startswith("MAETNPELSDLMAQTNKKIVPKF")
    # GDE_A = `num len name` header + GenBank-entry body (seq_NandL)
    gde = io.sniff_and_read(pas / "GDE_A")
    assert [r.name for r in gde] == ["ggewa3.p", "ggice7.p", "gglmf.pt"]
    assert all(len(r.seq) == 162 for r in gde)
    bare = io.sniff_and_read("/root/reference/sample/nas/Bare")
    assert len(bare) == 1 and bare[0].seq.startswith("CTGGGCGTGGTGG")


def test_msf_gde_nexus_roundtrip(tmp_path):
    m = msa_from_strings(["MKVL-AAG", "MKVLWAAG"], ab.PROTEIN, ["s1", "s2"])
    msf = tmp_path / "a.msf"
    io.write_msf(m, msf)
    back = io.read_msf(msf)
    assert [r.name for r in back] == ["s1", "s2"]
    assert back[0].seq == "MKVL-AAG"
    gde = tmp_path / "a.gde"
    io.write_gde(m, gde)
    back = io.sniff_and_read(gde)
    assert back[1].seq == "MKVLWAAG"
    nx = io.write_nexus(m)
    assert nx.startswith("#NEXUS") and "ntax=2 nchar=8" in nx


def test_pir_nbrf_variant(tmp_path):
    f = tmp_path / "x.pir"
    f.write_text(">P1;HBA\nhemoglobin alpha\nMKVLW\nAAG*\n")
    recs = io.read_pir(f)
    assert recs[0].name == "HBA" and recs[0].seq == "MKVLWAAG"


def test_fasta_exon_comments(tmp_path):
    f = tmp_path / "x.fa"
    f.write_text(">g1 test\n;C join(100..200,300..400)\nMKVL\nAAGF\n")
    recs = io.read_fasta(f)
    assert recs[0].seq == "MKVLAAGF"
    assert recs[0].exons == [(100, 200), (300, 400)]


def test_writers_roundtrip(tmp_path):
    m = msa_from_strings(["MKVL-AAG", "MKVLWAAG"], ab.PROTEIN, ["s1", "s2"])
    fa = io.write_fasta(m)
    assert ">s1" in fa and "MKVL-AAG" in fa
    cl = io.write_clustal(m)
    assert cl.startswith("CLUSTAL")
    ph = io.write_phylip(m)
    assert ph.splitlines()[0].strip() == "2 8"
    msf = io.write_msf(m)
    assert "MSF: 8" in msf and "MKVL.AAG" in msf
    gde = io.write_gde(m)
    assert gde.startswith("%s1")
    nb = io.write_native_block(m)
    assert "| s1" in nb


def test_native_msa_roundtrip(tmp_path):
    m = msa_from_strings(["MKVL-AAG", "MKVLWAAG"], ab.PROTEIN, ["s1", "s2"])
    path = tmp_path / "msa.nat"
    with open(path, "w") as f:
        f.write(f"    2     8\tmsa\n")
        for i, n in enumerate(m.names):
            f.write(f">{n}\n{io.decode_row(m, i)}\n/\n")
    recs = io.read_native(path)
    assert [r.name for r in recs] == ["s1", "s2"]
    assert recs[0].seq == "MKVL-AAG"


def test_html_intron_markup():
    """-ph HTML variant of the -pi marking (reference HtmlCharCtl,
    iolib.cc:769-791)."""
    from prrn_aln_tpu import io as iomod
    from prrn_aln_tpu.msa.msa import msa_from_strings
    from prrn_aln_tpu import alphabet as ab
    import numpy as np
    m = msa_from_strings(["MKVLAAG", "MKVLAAG"], ab.PROTEIN, ["a", "b"])
    m.eij = [np.array([9], np.int64), np.array([], np.int64)]
    text = iomod.write_native_block(m, markeij=2)
    assert text.startswith("<html>")
    assert "<pre>" in text and "</body>" in text
    assert 'background-color:red' in text or \
        'background-color:green' in text or \
        'background-color:blue' in text
    # ANSI variant still intact
    ansi = iomod.write_native_block(m, markeij=1)
    assert "\x1b[37;4" in ansi
