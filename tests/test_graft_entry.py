"""Driver-hook contract tests for __graft_entry__.

The driver validates multi-chip sharding by calling ``dryrun_multichip(8)``
in an environment whose default JAX backend may be broken (round-1 failure:
a libtpu mismatch made ANY dispatch to the default backend raise). The
dryrun must therefore never touch the default backend — these tests run it
in a subprocess with ``JAX_PLATFORMS=axon`` but the axon plugin
unregistered, so any default-backend dispatch errors out loudly.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_never_touches_default_backend():
    env = dict(os.environ)
    # default platform points at a backend that is NOT registered: any op
    # dispatched to it raises "Backend 'axon' is not in the list of known
    # backends" — the exact shape of the driver's round-1 crash.
    env["JAX_PLATFORMS"] = "axon"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # driver may or may not set the device count
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, text=True, capture_output=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip(8): loss=" in proc.stdout


def test_dryrun_multichip_with_live_backend_falls_back_to_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # 1 CPU device -> must re-exec with 8
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.devices(); "
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, text=True, capture_output=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip(8): loss=" in proc.stdout
