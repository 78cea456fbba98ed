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

from . import alphabet, config, scoring  # noqa: F401
