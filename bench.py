#!/usr/bin/env python3
"""Benchmark: sustained DP cell-update throughput of the production
pairwise engine (the band-packed row-sweep Pallas kernel that
msa/distance.py::all_pairs_scores launches on TPU).

Honest measurement rules (round-2 fix; see PERF.md):
  * N kernel launches are fused into one XLA program via lax.scan and
    timed around a single device->host fetch — `block_until_ready` does
    NOT synchronize through the axon tunnel, so per-launch async timing
    (round 1) over-reported by ~600x.
  * Cell count is the in-band cell count actually requested (the stripe
    of src/aln2.cc:156-174 at the prrn5 distance-pass default sh=-60),
    not the full rectangle.
  * Outputs are checked against the lax.scan oracle before timing.

Prints one JSON line (primary metric first if multiple):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the fraction of the 1 TCUPS/chip target (BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def band_cells(la: int, lb: int, lw: int, up: int) -> int:
    """Number of DP cells inside the stripe lw <= n - m <= up."""
    m = np.arange(la)[:, None]
    n = np.arange(lb)[None, :]
    r = n - m
    return int(((r >= lw) & (r <= up)).sum())


def scaling_main():
    """Scaling-efficiency harness (BASELINE.md >=80% target): runs the
    collective all-pairs distance pass over mesh sizes 1..ndev and
    reports T1 / (k * Tk).  On the single-chip axon setup this
    instruments the harness with ndev=1; run under
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
    to exercise the virtual 8-device mesh (numbers there measure
    sharding overhead, not real ICI scaling)."""
    import os
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the axon plugin ignores JAX_PLATFORMS; force like tests do
        if "--xla_force_host_platform_device_count" not in \
                os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    from jax.sharding import Mesh
    from prrn_aln_tpu import scoring
    from prrn_aln_tpu.config import AlnParams
    from prrn_aln_tpu.msa import distance

    rng = np.random.default_rng(11)
    seqs = [rng.integers(3, 23, size=160).astype(np.int32)
            for _ in range(40)]
    mtx, _ = scoring.protein_matrix(AlnParams(pam=150))
    devs = jax.devices()
    sizes = [k for k in (1, 2, 4, 8) if k <= len(devs)]
    times = {}
    backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    for k in sizes:
        mesh = Mesh(np.array(devs[:k]), axis_names=("pairs",))
        distance.all_pairs_scores(seqs, mtx, 2.0, 9.0, -60, mesh=mesh,
                                  backend=backend)          # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            distance.all_pairs_scores(seqs, mtx, 2.0, 9.0, -60,
                                      mesh=mesh, backend=backend)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    kmax = sizes[-1]
    eff = times[sizes[0]] / (kmax * times[kmax]) if kmax > 1 else 1.0
    print(json.dumps({
        "metric": "distance_scaling_efficiency",
        "value": round(eff, 4), "unit": f"T1/({kmax}*T{kmax})",
        "vs_baseline": round(eff / 0.8, 4),
        "times_s": {str(k): round(v, 4) for k, v in times.items()},
    }))


def main():
    if "--scaling" in sys.argv:
        scaling_main()
        return
    if "--group" in sys.argv or "--spliced" in sys.argv:
        # secondary engine metrics (kept off the default driver run to
        # hold its runtime; see PERF.md "Current state" for recorded
        # numbers and _profgroup.py for the harness)
        import _profgroup
        if "--group" in sys.argv:
            g, t, dev, cells = _profgroup.group_dp_gcups()
            # device-only member-pair cell updates (an*bn=64 per band
            # cell: the unit the refinement engine actually computes)
            gd = cells * 64 / dev / 1e9
            print(json.dumps({"metric": "group_dp_device_throughput",
                              "value": round(gd, 3),
                              "unit": "GCUPS(member-pair)",
                              "vs_baseline": round(gd / 1000.0, 6),
                              "e2e_batch_s": round(t, 3),
                              "device_batch_s": round(dev, 3)}))
        if "--spliced" in sys.argv:
            g, t = _profgroup.spliced_gcups()
            if g is not None:
                print(json.dumps({"metric": "spliced_h_throughput",
                                  "value": round(g, 4), "unit": "GCUPS",
                                  "vs_baseline": round(g / 1000.0, 7)}))
        return

    import jax
    from prrn_aln_tpu import scoring
    from prrn_aln_tpu.config import AlnParams
    from prrn_aln_tpu.ops import pallas_pairwise as pp
    from prrn_aln_tpu.ops.window import stripe

    rng = np.random.default_rng(7)
    # distance-pass scale: one launch = 512 pairs (sl-forest edge
    # batches run thousands); big enough to amortize dispatch latency
    B, L, N = 512, 512, 24
    mtx, _ = scoring.protein_matrix(AlnParams(pam=150))
    w = stripe(L, L, -60)

    la = np.full(B, L, np.int32)
    lb = np.full(B, L, np.int32)
    lw = np.full(B, w.lw, np.int32)
    up = np.full(B, w.up, np.int32)
    lw0 = int(w.lw)
    Wp = pp._pad_to(w.up - w.lw + 1, 128)

    # parameter planes exactly as pallas_pairwise_scores builds them
    planes = np.zeros((B, pp.NPLANE), np.float32)
    planes[:, 0] = la
    planes[:, 1] = lb
    planes[:, 2] = 2.0
    planes[:, 3] = 9.0
    planes[:, 4:8] = 1.0
    planes[:, 8] = lw
    planes[:, 9] = up
    prm = np.broadcast_to(
        planes.reshape(B // pp.GROUP, pp.GROUP, pp.NPLANE, 1)
        .transpose(0, 2, 1, 3),
        (B // pp.GROUP, pp.NPLANE, pp.GROUP, 128)).copy()
    prmd = jax.device_put(prm)
    mtxd = jax.device_put(mtx)

    A = rng.integers(3, 23, size=(N, B, L)).astype(np.int32)
    Bb = rng.integers(3, 23, size=(N, B, L)).astype(np.int32)
    Ad, Bd = jax.device_put(A), jax.device_put(Bb)
    interp = jax.default_backend() != "tpu"
    kw = dict(La_p=L, Wp=Wp, dim=mtx.shape[0], lw0=lw0, interpret=interp)

    import os
    _fused = os.environ.get("PRRN_PW_FUSED", "0") == "1"
    _launch = (pp._prepare_and_launch_fused if _fused
               else pp._prepare_and_launch)

    @jax.jit
    def many(Ad, Bd):
        def body(carry, ab):
            a, b = ab
            out = _launch(a, b, prmd, mtxd, **kw)
            return carry, out[:, :, 0]
        _, outs = jax.lax.scan(body, 0, (Ad, Bd))
        return outs

    outs = np.asarray(many(Ad, Bd))        # warm-up + result capture

    # output check vs the lax.scan oracle on a subset (cells-verified)
    from prrn_aln_tpu.ops.pairwise import wavefront_scores
    nchk = 16
    want = np.asarray(wavefront_scores(
        A[0, :nchk], Bb[0, :nchk], la[:nchk], lb[:nchk],
        lw[:nchk], up[:nchk], mtx,
        np.full(nchk, 2.0, np.float32), np.full(nchk, 9.0, np.float32),
        np.ones(nchk, np.float32), np.zeros((nchk, 4), bool),
        nslot=w.width, nsteps=2 * L - 1, dim=mtx.shape[0], local=False))
    err = float(np.abs(outs[0].reshape(-1)[:nchk] - want).max())
    if err > 1e-2:
        raise SystemExit(f"FAIL: kernel/oracle mismatch {err}")

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(many(Ad, Bd))
        best = min(best, time.perf_counter() - t0)

    cells = N * B * band_cells(L, L, w.lw, w.up)
    gcups = cells / best / 1e9
    print(json.dumps({
        "metric": "pairwise_banded_pallas_throughput",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 1000.0, 6),
    }))


if __name__ == "__main__":
    main()
