import os
import subprocess
import sys

# Force a deterministic 8-device CPU mesh for sharding tests. The axon TPU
# plugin (if present in this environment) force-sets jax_platforms="axon,cpu"
# at interpreter start, so overriding the env var is not enough — update the
# config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
# CLI subprocesses spawned by tests inherit this and apply the same config
# update in biscuit_tpu/__init__ — without it a device-engine subprocess
# would reach for the real (tunneled, occasionally wedging) TPU.
os.environ["BISCUIT_TPU_PLATFORM"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "tools", "oracle", "build", "oracle_biscuit")
ORACLE_LIB = os.path.join(REPO, "tools", "oracle", "build", "libref_aln.so")


def ensure_oracle():
    """Build the reference test oracle on demand; skip tests if impossible."""
    if not os.path.exists(ORACLE):
        r = subprocess.run(["make", "-j4"], cwd=os.path.join(REPO, "tools", "oracle"),
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("reference oracle unavailable: " + r.stderr.decode()[-500:])
    return ORACLE


@pytest.fixture(scope="session")
def oracle():
    return ensure_oracle()


@pytest.fixture(scope="module")
def monkeypatch_module():
    """Module-scoped monkeypatch (the builtin fixture is function-scoped)."""
    from _pytest.monkeypatch import MonkeyPatch
    mp = MonkeyPatch()
    yield mp
    mp.undo()


@pytest.fixture(scope="session")
def small_dataset(tmp_path_factory, oracle):
    """Small genome + SE reads with reference index + SAM already built."""
    d = tmp_path_factory.mktemp("small")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_testdata.py"), str(d),
         "--genome-size", "60000", "--n-reads", "400", "--n-chroms", "2"],
        check=True, capture_output=True)
    fa = str(d / "genome.fa")
    subprocess.run([oracle, "index", fa], check=True, capture_output=True)
    subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "index", fa],
                   check=True, capture_output=True, cwd=REPO)
    with open(d / "oracle.sam", "w") as f:
        subprocess.run([oracle, "align", fa, str(d / "reads.fq")],
                       check=True, stdout=f, stderr=subprocess.DEVNULL)
    return d
