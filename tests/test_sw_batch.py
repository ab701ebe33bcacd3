"""Batched device SW extension vs the exact host kernel."""
import numpy as np
import jax.numpy as jnp

from biscuit_tpu.config import fill_scmat
import biscuit_tpu.ops.sw as sw
from biscuit_tpu.ops.sw_batch import sw_extend_batch


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


def test_extend_batch_parity():
    rng = np.random.default_rng(21)
    mats = np.stack([fill_scmat(1, 2, "ga"), fill_scmat(1, 2, "ct")]).astype(np.int32)
    B = 64
    Lq, Lt = 128, 320
    queries = np.zeros((B, Lq), np.int32)
    targets = np.zeros((B, Lt), np.int32)
    qlens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    matsel = np.zeros(B, np.int32)
    h0 = np.zeros(B, np.int32)
    w = np.zeros(B, np.int32)
    eb = np.zeros(B, np.int32)
    for b in range(B):
        tl = int(rng.integers(5, Lt))
        t = rng.integers(0, 4, tl).astype(np.uint8)
        if rng.random() < 0.8:
            qv = mutate(rng, t[:int(rng.integers(1, min(tl, Lq) + 1))])
            q = qv[:Lq] if len(qv) else np.array([0], np.uint8)
        else:
            q = rng.integers(0, 4, int(rng.integers(1, Lq))).astype(np.uint8)
        queries[b, :len(q)] = q
        qlens[b] = len(q)
        targets[b, :tl] = t
        tlens[b] = tl
        matsel[b] = int(rng.integers(0, 2))
        h0[b] = int(rng.integers(1, 40))
        w[b] = int(rng.choice([10, 100, 200]))
        eb[b] = int(rng.choice([5, 10, 20]))

    out = sw_extend_batch(jnp.asarray(queries), jnp.asarray(qlens),
                          jnp.asarray(targets), jnp.asarray(tlens),
                          jnp.asarray(mats), jnp.asarray(matsel),
                          6, 1, 6, 1, jnp.asarray(w), jnp.asarray(eb),
                          100, jnp.asarray(h0))
    out = np.asarray(out)  # [6, B]
    for b in range(B):
        want = sw.sw_extend(queries[b, :qlens[b]], targets[b, :tlens[b]],
                            mats[matsel[b]], 6, 1, 6, 1, int(w[b]), int(eb[b]),
                            100, int(h0[b]))
        got = tuple(out[:, b])
        assert tuple(int(x) for x in got) == want, \
            f"lane {b}: got {got} want {want} q={queries[b,:qlens[b]].tolist()} t={targets[b,:tlens[b]].tolist()} w={w[b]} h0={h0[b]} eb={eb[b]} mat={matsel[b]}"
