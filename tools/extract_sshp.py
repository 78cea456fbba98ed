"""Extract the ssp propensity tables (reference table/sshp.data,
layout src/ssp.h:45-51) into a bundled npz asset.

Usage: python tools/extract_sshp.py [ref_table_dir] [out.npz]
"""
import struct
import sys

import numpy as np

NOSS, SSWIDTH = 3, 17


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/table"
    out = (sys.argv[2] if len(sys.argv) > 2
           else "prrn_aln_tpu/data/sshp.npz")
    raw = open(f"{src}/sshp.data", "rb").read()
    p0, p1 = struct.unpack_from("<2i", raw, 0)
    off = 8
    def take(n, shape):
        nonlocal off
        a = np.frombuffer(raw, np.float32, n, off).reshape(shape).copy()
        off += 4 * n
        return a
    phptbl = take(4 * 20, (4, 20))
    psstbl = take(NOSS * SSWIDTH * 20, (NOSS, SSWIDTH, 20))
    sshpav = take(6, (6,))
    sshpsd = take(6, (6,))
    sincrv = take(10, (2, 5))
    coscrv = take(10, (2, 5))
    np.savez_compressed(out, params=np.array([p0, p1], np.int32),
                        phptbl=phptbl, psstbl=psstbl, sshpav=sshpav,
                        sshpsd=sshpsd, sincrv=sincrv, coscrv=coscrv)
    print(f"wrote {out}: hps={p0} hms={p1}")


if __name__ == "__main__":
    main()
