"""ctypes bindings for the native host runtime (native/seqlib.cpp).

Compiles the shared library on first use (cached next to the package);
every entry point has a NumPy/Python fallback so the framework works
without a C++ toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "seqlib.cpp"
_SO = Path(__file__).resolve().parent / "_seqlib.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not _SO.exists() or
                (_SRC.exists() and _SRC.stat().st_mtime > _SO.stat().st_mtime)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.fasta_scan.restype = ctypes.c_int
        lib.encode_seq.restype = ctypes.c_int64
        lib.kmer_count.restype = ctypes.c_int64
        lib.kmer_min_overlap.restype = ctypes.c_int64
        lib.seqdb_write.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def encode_buffer(data: bytes, table: np.ndarray) -> np.ndarray:
    """Encode raw sequence text (whitespace/digits/; comments skipped)."""
    lib = _load()
    if lib is None:
        import re
        txt = re.sub(rb"(?m)^;.*$", b"", data)
        txt = re.sub(rb"[\s\d]", b"", txt)
        raw = np.frombuffer(txt, dtype=np.uint8)
        return table.astype(np.int8)[raw]
    buf = np.frombuffer(data, dtype=np.int8)
    out = np.empty(len(data), np.int8)
    tab = np.ascontiguousarray(table, np.int8)
    n = lib.encode_seq(_ptr(buf, ctypes.c_char), ctypes.c_int64(len(data)),
                       _ptr(tab, ctypes.c_int8), _ptr(out, ctypes.c_int8))
    return out[:n].copy()


def kmer_count(red: np.ndarray, seed: str, nalpha: int) -> tuple[np.ndarray, int]:
    """Dense spaced-seed word counts; returns (counts, total)."""
    ones = seed.count("1")
    table_size = nalpha ** ones
    counts = np.zeros(table_size, np.int32)
    lib = _load()
    red8 = np.ascontiguousarray(red, np.int8)
    if lib is None:
        on = [i for i, c in enumerate(seed) if c == "1"]
        total = 0
        for s in range(0, len(red8) - len(seed) + 1):
            sel = red8[s:s + len(seed)][on]
            if (sel < 0).any():
                continue
            w = 0
            for c in sel:
                w = w * nalpha + int(c)
            counts[w] += 1
            total += 1
        return counts, total
    seed8 = np.frombuffer(seed.encode(), np.uint8).astype(np.int8) - ord("0")
    total = lib.kmer_count(
        _ptr(red8, ctypes.c_int8), ctypes.c_int64(len(red8)),
        _ptr(np.ascontiguousarray(seed8), ctypes.c_int8),
        ctypes.c_int(len(seed)), ctypes.c_int(nalpha),
        _ptr(counts, ctypes.c_int32), ctypes.c_int64(table_size))
    return counts, int(total)


def kmer_min_overlap(ca: np.ndarray, cb: np.ndarray,
                     ma: int = 1, mb: int = 1) -> int:
    lib = _load()
    if lib is None:
        return int(np.minimum(ca.astype(np.int64) * mb,
                              cb.astype(np.int64) * ma)
                   [(ca > 0) & (cb > 0)].sum())
    return int(lib.kmer_min_overlap(
        _ptr(np.ascontiguousarray(ca, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(cb, np.int32), ctypes.c_int32),
        ctypes.c_int64(len(ca)), ctypes.c_int(ma), ctypes.c_int(mb)))


class SeqDB:
    """Formatted random-access sequence DB (reference makdbs/DbsDt):
    .psq concatenated codes + .pix offsets + .pnm names."""

    def __init__(self, base: str | Path):
        self.base = Path(base)
        self.codes = np.memmap(f"{base}.psq", dtype=np.int8, mode="r")
        self.offsets = np.fromfile(f"{base}.pix", dtype=np.int64)
        self.names = Path(f"{base}.pnm").read_text().splitlines()

    def __len__(self):
        return len(self.offsets) - 1

    def __getitem__(self, i: int) -> np.ndarray:
        return np.asarray(self.codes[self.offsets[i]:self.offsets[i + 1]])

    @staticmethod
    def build(base: str | Path, seqs: list[np.ndarray],
              names: list[str]) -> "SeqDB":
        offsets = np.zeros(len(seqs) + 1, np.int64)
        for i, s in enumerate(seqs):
            offsets[i + 1] = offsets[i] + len(s)
        codes = (np.concatenate([s.astype(np.int8) for s in seqs])
                 if seqs else np.zeros(0, np.int8))
        names_blob = ("\n".join(names) + "\n").encode()
        lib = _load()
        if lib is not None:
            rc = lib.seqdb_write(
                str(base).encode(), _ptr(codes, ctypes.c_int8),
                _ptr(offsets, ctypes.c_int64), ctypes.c_int(len(seqs)),
                names_blob, ctypes.c_int64(len(names_blob)))
            if rc != 0:
                raise OSError(f"seqdb_write failed: {rc}")
        else:
            codes.tofile(f"{base}.psq")
            offsets.tofile(f"{base}.pix")
            Path(f"{base}.pnm").write_bytes(names_blob)
        return SeqDB(base)
