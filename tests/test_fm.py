"""FM-index op parity: FMNumpy and JAX batched ops vs the reference C kernels
(called directly through ctypes on oracle-built .bwt/.sa files)."""
import numpy as np
import pytest

from biscuit_tpu.index.build import build_index
from biscuit_tpu.ops import fm as fmops

from ref_bindings import RefBWT


@pytest.fixture(scope="module")
def setup(small_dataset):
    fa = str(small_dataset / "genome.fa")
    idx = build_index(fa)
    ref_par = RefBWT(fa + ".par.bwt", fa + ".par.sa")
    ref_dau = RefBWT(fa + ".dau.bwt", fa + ".dau.sa")
    return idx, ref_par, ref_dau


def test_occ4_vs_reference(setup):
    idx, ref_par, _ = setup
    fmn = fmops.FMNumpy(idx.par)
    n = idx.par.seq_len
    rng = np.random.default_rng(1)
    ks = np.unique(np.concatenate([
        rng.integers(0, n, 200), [0, 1, n - 1, n, idx.par.primary,
                                  idx.par.primary - 1, idx.par.primary + 1, 127, 128, 129]]))
    mine = fmn.occ4(ks)
    for i, k in enumerate(ks):
        np.testing.assert_array_equal(mine[i], ref_par.occ4(int(k)), err_msg=f"k={k}")


def test_occ4_jax_matches_numpy(setup):
    idx, _, _ = setup
    fmn = fmops.FMNumpy(idx.par)
    fmj = fmops.FMArrays.from_strand(idx.par)
    rng = np.random.default_rng(2)
    ks = rng.integers(-1, idx.par.seq_len + 1, 500).astype(np.int32)
    out_j = np.asarray(fmops.fm_occ4(fmj, ks))
    out_n = fmn.occ4(ks.astype(np.int64))
    np.testing.assert_array_equal(out_j, out_n)


def test_sa_vs_reference(setup):
    idx, ref_par, ref_dau = setup
    for strand, ref in (("par", ref_par), ("dau", ref_dau)):
        s = getattr(idx, strand)
        fmn = fmops.FMNumpy(s)
        fmj = fmops.FMArrays.from_strand(s)
        rng = np.random.default_rng(3)
        # exhaustive low ranks (covers walks that cross the primary/'$' row,
        # where the reference relies on unsigned wrap of sa[0] == -1) plus a
        # random sample
        ks = np.unique(np.concatenate([
            np.arange(1, min(4096, s.seq_len + 1)),
            rng.integers(1, s.seq_len + 1, 200)])).astype(np.int64)
        mine = fmn.sa(ks)
        refv = np.array([ref.sa(int(k)) for k in ks])
        np.testing.assert_array_equal(mine, refv, err_msg=strand)
        jx = np.asarray(fmops.fm_sa(fmj, ks.astype(np.int32)))
        np.testing.assert_array_equal(jx, refv, err_msg=strand + "/jax")


def test_extend_vs_reference(setup):
    idx, ref_par, ref_dau = setup
    par_n = fmops.FMNumpy(idx.par)
    dau_n = fmops.FMNumpy(idx.dau)
    par_j = fmops.FMArrays.from_strand(idx.par)
    rng = np.random.default_rng(4)
    # start from single-base bi-intervals on the parent index and extend both
    # directions on each index a few random steps
    for trial in range(20):
        c = int(rng.integers(0, 4))
        ik = par_n.set_intv(dau_n, c)
        for step in range(6):
            is_back = bool(rng.integers(0, 2))
            # backward extension uses the parent; forward uses the complement
            # (daughter) index, as in bwt_smem1a
            ref = ref_par if is_back else ref_dau
            mine_ref = (par_n if is_back else dau_n).extend(ik, is_back)
            theirs = ref.extend(ik, is_back)
            np.testing.assert_array_equal(mine_ref, theirs,
                                          err_msg=f"trial={trial} step={step} back={is_back}")
            if is_back:
                jx = np.asarray(fmops.fm_extend(par_j, ik.astype(np.int32)[None], True))[0]
                np.testing.assert_array_equal(jx, theirs)
            nxt = int(rng.integers(0, 4))
            cand = mine_ref[nxt]
            if cand[2] == 0:
                break
            ik = cand
