"""Smith-Waterman kernel parity vs the reference ksw_* via ctypes."""
import numpy as np
import pytest

from biscuit_tpu.config import fill_scmat
import biscuit_tpu.ops.sw as sw

import ref_bindings as rb


@pytest.fixture(scope="module", autouse=True)
def _need_oracle(oracle):
    return oracle


def mutate(rng, seq, sub=0.05, ins=0.02, dele=0.02):
    out = []
    for b in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(rng.integers(0, 4))
        if rng.random() < sub:
            out.append((b + rng.integers(1, 4)) % 4)
        else:
            out.append(b)
    return np.array(out, dtype=np.uint8)


MATS = [fill_scmat(1, 2, "ct"), fill_scmat(1, 2, "ga"), fill_scmat(1, 2, "std"),
        fill_scmat(1, 4, "std")]


def test_extend_parity_random():
    rng = np.random.default_rng(7)
    for trial in range(300):
        tl = int(rng.integers(1, 120))
        target = rng.integers(0, 4, tl).astype(np.uint8)
        if rng.random() < 0.7:
            query = mutate(rng, target[:int(rng.integers(1, tl + 1))])
            if len(query) == 0:
                continue
        else:
            query = rng.integers(0, 4, int(rng.integers(1, 100))).astype(np.uint8)
        mat = MATS[trial % len(MATS)]
        w = int(rng.choice([10, 100]))
        h0 = int(rng.integers(1, 40))
        args = (query, target, mat, 6, 1, 6, 1, w, 10, 100, h0)
        mine = sw.sw_extend(*args)
        ref = rb.ksw_extend2(*args)
        assert mine == tuple(ref), f"trial={trial} q={query.tolist()} t={target.tolist()} h0={h0} w={w}"


def test_global_parity_random():
    rng = np.random.default_rng(8)
    for trial in range(300):
        tl = int(rng.integers(1, 120))
        target = rng.integers(0, 4, tl).astype(np.uint8)
        query = mutate(rng, target)
        if len(query) == 0:
            continue
        mat = MATS[trial % len(MATS)]
        w = int(rng.choice([3, 10, 100]))
        args = (query, target, mat, 6, 1, 6, 1, w)
        my_sc, my_cig = sw.sw_global(*args)
        ref_sc, ref_cig = rb.ksw_global2(*args)
        assert my_sc == ref_sc, f"trial={trial}"
        assert my_cig == ref_cig, f"trial={trial} q={query.tolist()} t={target.tolist()} w={w}"


def test_align_parity_random():
    rng = np.random.default_rng(9)
    for trial in range(300):
        tl = int(rng.integers(5, 150))
        target = rng.integers(0, 4, tl).astype(np.uint8)
        if rng.random() < 0.7:
            core = target[int(rng.integers(0, tl // 2)):]
            query = mutate(rng, core[:int(rng.integers(1, len(core) + 1))])
            if len(query) == 0:
                continue
        else:
            query = rng.integers(0, 4, int(rng.integers(1, 100))).astype(np.uint8)
        mat = MATS[trial % len(MATS)]
        # matesw-style invocation: XSTART (+ sometimes XSUBO threshold)
        if trial % 3 == 0:
            sub = int(rng.integers(1, 30))
            mine = sw.sw_align(query, target, mat, 6, 1, 6, 1, xstart=True, xsubo=sub)
            ref = rb.ksw_align2(query, target, mat, 6, 1, 6, 1,
                                rb.KSW_XSTART | rb.KSW_XSUBO | sub)
        else:
            mine = sw.sw_align(query, target, mat, 6, 1, 6, 1, xstart=True)
            ref = rb.ksw_align2(query, target, mat, 6, 1, 6, 1, rb.KSW_XSTART)
        got = (mine.score, mine.te, mine.qe, mine.score2, mine.te2, mine.tb, mine.qb)
        want = (ref.score, ref.te, ref.qe, ref.score2, ref.te2, ref.tb, ref.qb)
        assert got == want, f"trial={trial} q={query.tolist()} t={target.tolist()}"


def test_align_u8_parity_random():
    """u8 kernel variant (KSW_XBYTE), as used by mate rescue on short reads."""
    rng = np.random.default_rng(10)
    for trial in range(300):
        tl = int(rng.integers(5, 200))
        target = rng.integers(0, 4, tl).astype(np.uint8)
        if rng.random() < 0.7:
            core = target[int(rng.integers(0, tl // 2)):]
            query = mutate(rng, core[:int(rng.integers(1, min(len(core), 120) + 1))])
            if len(query) == 0:
                continue
        else:
            query = rng.integers(0, 4, int(rng.integers(1, 100))).astype(np.uint8)
        mat = MATS[trial % len(MATS)]
        sub = 19  # min_seed_len * a, as in matesw
        mine = sw.sw_align(query, target, mat, 6, 1, 6, 1, xstart=True,
                           xsubo=sub, xbyte=True)
        ref = rb.ksw_align2(query, target, mat, 6, 1, 6, 1,
                            rb.KSW_XSTART | rb.KSW_XSUBO | rb.KSW_XBYTE | sub)
        got = (mine.score, mine.te, mine.qe, mine.score2, mine.te2, mine.tb, mine.qb)
        want = (ref.score, ref.te, ref.qe, ref.score2, ref.te2, ref.tb, ref.qb)
        assert got == want, f"trial={trial} q={query.tolist()} t={target.tolist()}"
