"""On-TPU kernel regression tier (VERDICT r1 item 9).

Skipped by default (the suite runs on CPU). Opt in with:

    BISCUIT_TPU_RUN_TPU=1 python -m pytest tests/test_tpu_regress.py -x -q

which runs tools/tpu_regress.py in a subprocess against the real chip
(conftest pins THIS process to CPU, so the check must run out-of-process)
and asserts every kernel is bit-identical on hardware. The JSON artifact
with the measured kernel timings lands at tpu_regress.json in the repo
root, so the Pallas-vs-XLA speedup claims are reproducible by one command.
"""
import json
import os
import subprocess
import sys

import pytest

from conftest import REPO


@pytest.mark.skipif(os.environ.get("BISCUIT_TPU_RUN_TPU") != "1",
                    reason="on-TPU tier: set BISCUIT_TPU_RUN_TPU=1")
def test_tpu_kernel_regression():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = os.path.join(REPO, "tpu_regress.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tpu_regress.py"), out],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    res = json.load(open(out))
    assert res["platform"] != "cpu", "harness must run on the accelerator"
    assert res["all_ok"]
    assert res["pallas_sw"]["bit_identical"]
    assert res["occ4_fused_gather"]["exact"]
    assert res["device_seeding"]["seed_sets_identical"]
