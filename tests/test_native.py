"""Native host runtime: compile, bind, and match Python fallbacks."""

import numpy as np
import pytest

from prrn_aln_tpu import alphabet as ab, native
from prrn_aln_tpu.msa import kmer


def test_native_compiles():
    assert native.available(), "native seqlib failed to build"


def test_encode_matches_python():
    text = b">x\nMKVL-AAG\n;comment\nFFW123DD\n"
    # strip header manually like the caller does
    payload = b"MKVL-AAG\n;comment\nFFW123DD\n"
    from prrn_aln_tpu.alphabet import _AA_TABLE
    got = native.encode_buffer(payload, _AA_TABLE)
    want = ab.encode("MKVL-AAGFFWDD", ab.PROTEIN)
    np.testing.assert_array_equal(got, want)


def test_kmer_count_matches_python():
    rng = np.random.default_rng(0)
    red = rng.integers(-1, 19, size=500).astype(np.int8)
    counts, total = native.kmer_count(red, "11011", 19)
    # python fallback
    native._lib_save = native._lib
    native._lib = None
    counts2, total2 = native.kmer_count(red, "11011", 19)
    native._lib = native._lib_save
    assert total == total2
    np.testing.assert_array_equal(counts, counts2)


def test_seqdb_roundtrip(tmp_path):
    seqs = [ab.encode("MKVLAAG", ab.PROTEIN), ab.encode("FFWDD", ab.PROTEIN)]
    db = native.SeqDB.build(tmp_path / "db", seqs, ["s1", "s2"])
    assert len(db) == 2
    np.testing.assert_array_equal(db[0], seqs[0])
    np.testing.assert_array_equal(db[1], seqs[1])
    assert db.names == ["s1", "s2"]
