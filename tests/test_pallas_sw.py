"""Pallas SW kernel vs the XLA batch kernel (itself oracle-tested against
ksw_extend2 in test_sw_batch.py). Runs in Pallas interpret mode on the CPU
test backend; on TPU the same kernel compiles via Mosaic."""
import numpy as np
import jax.numpy as jnp
import pytest

from biscuit_tpu.config import MemOpt
from biscuit_tpu.ops.sw_batch import sw_extend_batch
from biscuit_tpu.ops.pallas_sw import sw_extend_batch_pallas


def _rand_case(rng, B, Lq, Lt):
    opt = MemOpt()
    query = rng.integers(0, 4, size=(B, Lq)).astype(np.int32)
    target = rng.integers(0, 4, size=(B, Lt)).astype(np.int32)
    # half the lanes extend a planted match so scores are non-trivial
    for b in range(0, B, 2):
        L = min(Lq, Lt) - rng.integers(0, 5)
        target[b, :L] = query[b, :L]
        # sprinkle mismatches/conversion-like edits
        for _ in range(rng.integers(0, 4)):
            p = rng.integers(0, L)
            target[b, p] = rng.integers(0, 4)
    qlens = rng.integers(Lq // 2, Lq + 1, size=B).astype(np.int32)
    tlens = rng.integers(Lt // 2, Lt + 1, size=B).astype(np.int32)
    mats = np.stack([opt.gamat, opt.ctmat]).astype(np.int32)
    matsel = rng.integers(0, 2, size=B).astype(np.int32)
    w = np.full(B, opt.w, np.int32)
    bonus = np.where(rng.random(B) < 0.5, opt.pen_clip5, 0).astype(np.int32)
    h0 = rng.integers(1, 40, size=B).astype(np.int32)
    return opt, query, qlens, target, tlens, mats, matsel, w, bonus, h0


@pytest.mark.parametrize("B,Lq,Lt", [(8, 32, 64), (130, 64, 128)])
def test_pallas_matches_xla(B, Lq, Lt):
    rng = np.random.default_rng(42 + B)
    (opt, query, qlens, target, tlens, mats, matsel, w, bonus, h0) = \
        _rand_case(rng, B, Lq, Lt)
    args = (jnp.asarray(query), jnp.asarray(qlens), jnp.asarray(target),
            jnp.asarray(tlens), jnp.asarray(mats), jnp.asarray(matsel),
            opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
            jnp.asarray(w), jnp.asarray(bonus), opt.zdrop, jnp.asarray(h0))
    ref = np.asarray(sw_extend_batch(*args))
    got = np.asarray(sw_extend_batch_pallas(*args, interpret=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("w_val", [1, 2, 5, 17])
def test_pallas_narrowing_adversarial(w_val):
    """Tiny bands, long targets (collapse via i-w >= end), planted dead
    bands (m==0 rows), and tail death/regrowth — the regimes where the
    oracle's nz-driven beg/end narrowing is observable (reach gating of
    gscore, F truncation at last_nz+2, band collapse)."""
    rng = np.random.default_rng(1000 + w_val)
    opt = MemOpt()
    B, Lq, Lt = 64, 48, 160  # Lt >> Lq + w: forces the collapse path
    query = rng.integers(0, 4, size=(B, Lq)).astype(np.int32)
    target = rng.integers(0, 4, size=(B, Lt)).astype(np.int32)
    for b in range(B):
        k = b % 4
        L = min(Lq, Lt)
        if k == 0:      # full planted match: survives, reach stays
            target[b, :L] = query[b, :L]
        elif k == 1:    # match then garbage: mid-band death
            target[b, :L // 3] = query[b, :L // 3]
        elif k == 2:    # garbage then match: F/tail regrowth attempts
            target[b, L // 2:L] = query[b, :L - L // 2]
        # k == 3: pure random (fast m==0 break)
    qlens = rng.integers(8, Lq + 1, size=B).astype(np.int32)
    tlens = rng.integers(Lt // 2, Lt + 1, size=B).astype(np.int32)
    mats = np.stack([opt.gamat, opt.ctmat]).astype(np.int32)
    matsel = rng.integers(0, 2, size=B).astype(np.int32)
    w = np.full(B, w_val, np.int32)
    bonus = np.where(rng.random(B) < 0.5, opt.pen_clip5, 0).astype(np.int32)
    h0 = rng.integers(1, 60, size=B).astype(np.int32)
    for zdrop in (0, 10, opt.zdrop):
        args = (jnp.asarray(query), jnp.asarray(qlens), jnp.asarray(target),
                jnp.asarray(tlens), jnp.asarray(mats), jnp.asarray(matsel),
                opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                jnp.asarray(w), jnp.asarray(bonus), zdrop, jnp.asarray(h0))
        ref = np.asarray(sw_extend_batch(*args))
        got = np.asarray(sw_extend_batch_pallas(*args, interpret=True))
        np.testing.assert_array_equal(got, ref, err_msg=f"zdrop={zdrop}")
