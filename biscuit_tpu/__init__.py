"""biscuit_tpu — a TPU-native bisulfite sequencing toolkit.

A from-scratch JAX/XLA/Pallas re-realization of the capabilities of
zhou-lab/biscuit (reference layout documented in SURVEY.md): bisulfite-aware
FM-index alignment with asymmetric C>T / G>A scoring, joint methylation +
variant pileup, epiread extraction, and the associated BAM-downstream tools.

Compute path: batched FM-index search and banded affine-gap Smith-Waterman as
JAX/Pallas kernels over read batches; host runtime (index construction, IO,
ordered output) in Python + C++ (ctypes).
"""

__version__ = "0.1.0"
# Reference toolchain version whose behavior this framework reproduces
# (/root/reference/src/biscuit.h:10-13).
REFERENCE_VERSION = "1.6.1-dev"
