"""Driver-hook coverage: entry() compiles and dryrun_multichip executes a
sharded training step on the virtual mesh (the exact calls the round driver
makes)."""

import numpy as np


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 10)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on sharding/compile failure


def test_dryrun_multichip_odd_count():
    """Non-even device counts fall back to expert=1. The train_step
    workload is enough — this tests the mesh fallback, not the solver
    workloads (which test_dryrun_multichip_8 covers in full)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(3, workload="train_step")


def test_dryrun_multichip_bootstraps_from_single_device():
    """The driver calls dryrun_multichip in an env where jax sees ONE real
    device (no virtual-platform flags). The hook must re-exec itself into a
    forced n-device CPU platform rather than fail (VERDICT r1 item #1)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("IRBFN_DRYRUN_INNER", None)
    # 1 visible CPU device, like the driver's single real chip.
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        p for p in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in p)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p])
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "assert len(jax.devices()) == 1, jax.devices();"
        "import __graft_entry__ as g;"
        "g.dryrun_multichip(8, workload='train_step')"
    )
    proc = subprocess.run([sys.executable, "-u", "-c", code], env=env,
                          cwd=repo, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok" in proc.stdout
    assert "'data': 4" in proc.stdout and "'expert': 2" in proc.stdout
