#!/usr/bin/env python3
"""SWAR 2x-packing ablation for the Pallas SW kernel (round-4 VERDICT #4).

The suggestion: pack two i16 DP cells per int32 lane with manual carry
masking — no i16 vectors, dodging the Mosaic legalization failure that
killed the native-int16 attempt in round 3. This tool measures whether the
PRIMITIVES the kernel spends its time on (the ksw row recurrence is a
chain of maxima: M = max(Hdiag+S, 0), H = max(M, E, F), plus masked
selects) get faster per LOGICAL element when 2x-packed.

SWAR op cost on a VPU with native int32 max (v5e):
  * add (15-bit fields, carry guard): (a&M)+(b&M) then MSB restore — ~3
    ops / 2 fields vs 2x1 native = 1.5x the work per field.
  * max: field-wise compare via the borrow trick ((x|H)-(y&~H)) & H, MSB
    smear to a field mask (shift+or), then blend — ~8 ops / 2 fields vs
    2x1 native = ~4x the work per field.
Unlike SSE-era hosts (where 8/16-bit lanes DOUBLE arithmetic throughput,
which is why ksw's striped kernels exist), TPU VPU ops count per 32-bit
lane regardless of how many logical fields ride in it, so packing only
wins if the packed op chain is SHORTER than 2x the native chain. For a
max-dominated recurrence it is LONGER. This tool measures exactly that.

Writes swar_ablate.json: per-logical-element times for the native int32
row chain vs the SWAR-packed row chain, same logical element count.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tools.tpu_regress import _timeit

    Lq, B = 128, 2048          # logical elements per row chain
    ITERS = 64                 # row steps per call (amortize dispatch)
    rng = np.random.default_rng(0)
    M15 = 0x7FFF
    HBIT = jnp.uint32(0x80008000)
    LOW = jnp.uint32(0x7FFF7FFF)

    a32 = jnp.asarray(rng.integers(0, 1 << 14, (Lq, B)), jnp.int32)
    s32 = jnp.asarray(rng.integers(-8, 8, (Lq, B)), jnp.int32)
    e32 = jnp.asarray(rng.integers(0, 1 << 14, (Lq, B)), jnp.int32)
    f32 = jnp.asarray(rng.integers(0, 1 << 14, (Lq, B)), jnp.int32)

    @jax.jit
    def native(a, s, e, f):
        def body(i, st):
            a, e = st
            m = jnp.maximum(a + s, 0)
            h = jnp.maximum(jnp.maximum(m, e), f)
            e2 = jnp.maximum(e - 1, jnp.maximum(m - 7, 0))
            return h, e2
        return jax.lax.fori_loop(0, ITERS, body, (a, e))

    # same LOGICAL elements, 2 fields per int32: [Lq, B//2] packed
    def pack(x):
        xn = np.asarray(x).astype(np.uint32)
        return jnp.asarray((xn[:, 0::2] & M15) | ((xn[:, 1::2] & M15) << 16))

    ap, sp, ep, fp = pack(a32), pack(np.abs(np.asarray(s32))), pack(e32), pack(f32)

    def swar_add(x, y):
        # 15-bit fields with the MSB as carry guard
        return ((x & LOW) + (y & LOW)) ^ ((x ^ y) & HBIT)

    def swar_max(x, y):
        # borrow trick: MSB of each field = (x_field >= y_field)
        ge = (((x | HBIT) - (y & LOW)) & HBIT)      # 0x8000 where x >= y
        mask = ge - (ge >> 15)                      # smear to full field
        return (x & mask) | (y & ~mask)

    @jax.jit
    def swar(a, s, e, f):
        def body(i, st):
            a, e = st
            m = swar_add(a, s)                      # a + s (nonneg fields)
            h = swar_max(swar_max(m, e), f)
            e2 = swar_max(e, m)
            return h, e2
        return jax.lax.fori_loop(0, ITERS, body, (a, e))

    cells = Lq * B * ITERS
    tn = _timeit(lambda: native(a32, s32, e32, f32))
    ts = _timeit(lambda: swar(ap, sp, ep, fp))
    out = {
        "platform": jax.devices()[0].platform,
        "logical_cells_per_call": cells,
        "native_int32": {"s_per_call": tn,
                         "gcells_per_s": round(cells / tn / 1e9, 2)},
        "swar_2x_packed": {"s_per_call": ts,
                           "gcells_per_s": round(cells / ts / 1e9, 2)},
        "swar_speedup": round(tn / ts, 3),
        "note": ("swar chain omits the per-field select/mask costs a real "
                 "kernel adds (band masks, where-blends), so this is an "
                 "UPPER bound on SWAR's potential; <1.0 = packing loses"),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "swar_ablate.json"), "w") as fo:
        json.dump(out, fo, indent=1)


if __name__ == "__main__":
    main()
