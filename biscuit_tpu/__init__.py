"""biscuit_tpu — a TPU-native bisulfite sequencing toolkit.

A from-scratch JAX/XLA/Pallas re-realization of the capabilities of
zhou-lab/biscuit (reference layout documented in SURVEY.md): bisulfite-aware
FM-index alignment with asymmetric C>T / G>A scoring, joint methylation +
variant pileup, epiread extraction, and the associated BAM-downstream tools.

Compute path: batched FM-index search and banded affine-gap Smith-Waterman as
JAX/Pallas kernels over read batches; host runtime (index construction, IO,
ordered output) in Python + C++ (ctypes).
"""

import os as _os

# Opt-in backend override for subprocess runs (tests drive CLI subprocesses
# on an 8-virtual-device CPU mesh). The axon TPU plugin force-registers
# itself at interpreter start and ignores JAX_PLATFORMS, so the config update
# must happen before any backend is initialized — which costs a jax import,
# hence opt-in only.
_plat = _os.environ.get("BISCUIT_TPU_PLATFORM")
if _plat:
    _os.environ["JAX_PLATFORMS"] = _plat
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

__version__ = "0.1.0"
# Reference toolchain version whose behavior this framework reproduces
# (/root/reference/src/biscuit.h:10-13).
REFERENCE_VERSION = "1.6.1-dev"
