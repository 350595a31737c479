"""Driver-contract tests: __graft_entry__ and bench.py.

Round-1 postmortem (VERDICT.md Weak #2): nothing in the suite imported
__graft_entry__, so a broken dryrun shipped. These tests pin the exact
surface the round driver exercises:
  * entry() -> (jittable fn, example args), compiles single-device;
  * dryrun_multichip(8) runs inline on the 8-device test mesh;
  * dryrun_multichip self-bootstraps a virtual CPU mesh in a subprocess
    when the ambient backend has too few devices (the driver's env:
    one real TPU chip);
  * bench.py prints exactly one JSON line with the required keys.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 40)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_inline():
    # conftest forces 8 virtual CPU devices -> inline path.
    graft.dryrun_multichip(8)


def test_dryrun_multichip_bootstraps_subprocess():
    """Mimic the driver: a process whose backend has <8 devices.

    JAX_PLATFORMS=cpu without the device-count flag yields 1 CPU device,
    the same shape as the driver's 1-TPU env; dryrun_multichip must
    re-exec itself onto an 8-device virtual mesh and succeed.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import __graft_entry__ as g; g.dryrun_multichip(8); "
            "print('DRIVER_OK')")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "DRIVER_OK" in proc.stdout
    assert "dryrun_multichip(8): OK" in proc.stdout


def test_bench_json_contract_smoke():
    """bench.py must print ONE parseable JSON line with the driver keys."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["HITADV_BENCH_SMOKE"] = "1"
    proc = subprocess.run([sys.executable, "bench.py"], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["value"] > 0
    assert "dgcnn_examples_per_sec" in rec["extra"]
    # the scalar-fetch sync cross-check must be in every record (the
    # relay's block_until_ready can fire before execution — bench.py
    # _bench_canary saga): a missing sync_ok would mean a future edit
    # silently dropped the only guard against fake-fast timings.
    assert rec["extra"]["hitadv_sync_ok"] in (True, False)
    assert rec["extra"]["hitadv_attack_seconds_fetchsync"] > 0


def test_bench_mfu_failure_is_loud():
    """When cost_analysis() yields no FLOPs (jax drift, backend change),
    bench.py must record an explicit ``"mfu": null`` plus a warning in
    the JSON rather than silently dropping the keys (VERDICT r4 Weak
    #6). Simulated by nulling _program_flops on an imported bench
    module (runpy.run_path returns a COPY of the globals — patching
    the copy never reaches main's closure)."""
    import importlib.util
    import io
    from contextlib import redirect_stdout

    import jax

    jax.config.update("jax_platforms", "cpu")
    env_keys = {"HITADV_BENCH_SMOKE": "1"}
    old = {k: os.environ.get(k) for k in env_keys}
    os.environ.update(env_keys)
    try:
        spec = importlib.util.spec_from_file_location(
            "bench_under_test", os.path.join(REPO, "bench.py"))
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        bench._program_flops = lambda *a, **k: None
        buf = io.StringIO()
        with redirect_stdout(buf):
            bench.main()
        rec = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert rec["extra"]["mfu"] is None, rec
        assert "mfu_warning" in rec["extra"], rec
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
