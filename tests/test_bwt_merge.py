"""Semi-external blockwise BWT construction (native/bwt_merge.cpp) must
produce artifacts byte-identical to the in-memory SA-IS path: packed words,
occ checkpoints, primary, and SA samples.

The adversarial cases target the block-boundary machinery: periodic texts
(ties that always cross block boundaries exercise the gamma/G fallback),
block sizes that divide / don't divide n, and single-block and remainder
edge geometries.
"""
import numpy as np
import pytest

from biscuit_tpu import native
from biscuit_tpu.index.build import build_strand
from biscuit_tpu.index.fmindex import (build_strand_index,
                                       build_strand_index_from_parts,
                                       default_sa_intv)


def _reference_parts(text: np.ndarray, intv: int):
    sa = native.suffix_array(text)
    bwt, primary = native.bwt_from_sa(text, sa)
    st = build_strand_index(text, sa, bwt, primary)
    # build_strand_index uses default_sa_intv; recompute samples at `intv`
    n = len(text)
    n_sa = (n + intv) // intv
    ranks = np.arange(1, n_sa) * intv
    samples = np.empty(n_sa, dtype=np.int64)
    samples[0] = -1
    samples[1:] = sa[ranks - 1].astype(np.int64)
    return st, primary, samples


def _check(text: np.ndarray, block: int, intv: int = 4):
    words, occ_cp, primary, sa = native.bwt_merge(text, intv, block)
    st, want_primary, want_sa = _reference_parts(text, intv)
    assert primary == want_primary, (len(text), block)
    np.testing.assert_array_equal(words, st.words)
    np.testing.assert_array_equal(occ_cp.astype(np.int64),
                                  st.occ_cp.astype(np.int64))
    np.testing.assert_array_equal(sa, want_sa)


@pytest.mark.parametrize("seed", range(6))
def test_random_texts(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 3000))
    text = rng.integers(0, 4, n).astype(np.uint8)
    for block in (2, 3, 7, 64, max(2, n // 3), n, n + 5):
        _check(text, block)


def test_periodic_adversaries():
    """Ties that extend across many blocks: the gamma fallback and G-bit
    propagation must resolve them exactly."""
    cases = [
        np.zeros(1000, np.uint8),                       # A^1000
        np.tile([0, 1], 700).astype(np.uint8),          # (AC)^700
        np.tile([0, 0, 1], 500).astype(np.uint8),       # (AAC)^500
        np.tile([3, 3, 3, 2], 400).astype(np.uint8),    # (TTTG)^400
        np.concatenate([np.zeros(600, np.uint8),
                        [1], np.zeros(600, np.uint8)]), # A^600 C A^600
    ]
    for text in cases:
        for block in (5, 16, 37, 128, len(text) // 2):
            _check(text, block)


def test_tiny_and_remainder_edges():
    rng = np.random.default_rng(99)
    for n in (2, 3, 4, 5, 16, 17, 127, 128, 129, 255, 256, 257):
        text = rng.integers(0, 4, n).astype(np.uint8)
        for block in (2, n - 1 if n > 2 else 2, n, 8):
            _check(text, max(2, block))


def test_sa_intervals():
    rng = np.random.default_rng(7)
    text = rng.integers(0, 4, 2048).astype(np.uint8)
    for intv in (1, 2, 8, 32):
        _check(text, 100, intv=intv)


def test_build_strand_merge_path_identical():
    """build_strand with BISCUIT_TPU_BWT_MERGE=1 must equal the SA-IS path
    field-for-field (the real integration surface)."""
    import os
    rng = np.random.default_rng(123)
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    ref = build_strand(codes, parent=True)
    os.environ["BISCUIT_TPU_BWT_MERGE"] = "1"
    os.environ["BISCUIT_TPU_BWT_BLOCK"] = "1000"
    try:
        got = build_strand(codes, parent=True)
    finally:
        del os.environ["BISCUIT_TPU_BWT_MERGE"]
        del os.environ["BISCUIT_TPU_BWT_BLOCK"]
    assert got.primary == ref.primary
    assert got.seq_len == ref.seq_len
    assert got.sa_intv == ref.sa_intv
    np.testing.assert_array_equal(got.words, ref.words)
    np.testing.assert_array_equal(got.occ_cp, ref.occ_cp)
    np.testing.assert_array_equal(got.L2, ref.L2)
    assert got.sa_samples.dtype == ref.sa_samples.dtype
    np.testing.assert_array_equal(got.sa_samples, ref.sa_samples)
