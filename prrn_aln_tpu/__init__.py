"""prrn_aln_tpu — TPU-native sequence-alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Osamu Gotoh's
``aln``/``prrn5`` suite (pairwise, group-to-group and multiple sequence
alignment with doubly-nested randomized iterative refinement), built
TPU-first: batched anti-diagonal wavefront DP kernels, MXU profile scoring,
and ``jax.sharding`` data-parallel orchestration instead of pthreads.

Reference behavior studied from ogotoh/prrn_aln (see SURVEY.md); no code is
shared with the reference.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache (opt-in via PRRN_ALN_TPU_CACHE=dir):
# CLI processes are short-lived and repay kernel compiles each run, but
# on tunneled/remote-compile devices the cache round-trips can cost
# more than the compiles, so it is not enabled by default.
try:
    import jax as _jax

    _cache = _os.environ.get("PRRN_ALN_TPU_CACHE", "")
    if _cache and _cache != "0":
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.1)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                           -1)
except Exception:                                    # pragma: no cover
    pass

from . import alphabet, config, scoring  # noqa: F401
