"""rdn/utn/utp-style utility functions."""

import numpy as np

from prrn_aln_tpu import alphabet as ab
from prrn_aln_tpu.msa.msa import msa_from_strings
from prrn_aln_tpu.utils import seqtools as st


def test_translate_and_orf():
    dna = ab.encode("ATGGCTGCATAA", ab.DNA)       # M A A *
    assert st.translate(dna) == "MAA*"
    dna2 = ab.encode("ATG" + "GCT" * 40 + "TAA", ab.DNA)
    orfs = st.find_orfs(dna2, min_aa=30)
    assert orfs and orfs[0][2] == 0
    assert st.translate(ab.encode("TTTCTGGAA", ab.DNA)) == "FLE"


def test_reverse_complement():
    dna = ab.encode("ACGTTG", ab.DNA)
    rc = st.reverse_complement(dna)
    assert ab.decode(rc, ab.DNA) == "CAACGT"


def test_composition():
    c = st.composition(ab.encode("AAACCG", ab.DNA), ab.DNA)
    assert c == {"A": 3, "C": 2, "G": 1}


def test_msa_editing():
    m = msa_from_strings(["AC-GT", "AC-GT", "A--GT"], ab.DNA)
    d = st.delete_common_gaps(m)
    assert d.length == 4
    u = st.remove_duplicates(m)
    assert u.many == 2
    j = st.justify(m, left=True)
    assert ab.decode(j.codes[2], ab.DNA) == "AGT--"
    e = st.extract_members(m, [0, 2])
    assert e.many == 2 and e.names == ["seq0", "seq2"]
