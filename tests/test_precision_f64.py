"""f64 validation anchor (round-4 VERDICT missing #3).

The reference samples in double precision [U]; this rebuild's contract is
f32.  tools/validate_f64.py fits BASELINE configs 1-3 both ways and judges
the pair with the parity harness; this slow test runs the config-1 pair in
subprocesses (enable_x64 is process-global — it must never leak into the
shared f32 test session) and asserts consistency.  Full record:
docs/PARITY.md "f64 validation anchor".
"""
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))


@pytest.mark.slow
class TestF64Anchor:
    def test_config1_f32_consistent_with_f64(self, tmp_path):
        from validate_f64 import run_fit
        from tamcmc_tpu.diagnostics.compare import compare_posteriors
        a, b = tmp_path / "f32.npz", tmp_path / "f64.npz"
        run_fit("single_lorentzian", {}, False, str(a))
        run_fit("single_lorentzian", {}, True, str(b))
        za, zb = np.load(a, allow_pickle=True), np.load(b, allow_pickle=True)
        res = compare_posteriors(za["theta"], [str(n) for n in za["names"]],
                                 zb["theta"], [str(n) for n in zb["names"]],
                                 z_threshold=4.0)
        bad = [r for r in res["params"] if not r["ok"]]
        assert not bad, f"f32 vs f64 posterior inconsistent: {bad}"

    def test_f64_cli_state_is_double(self, tmp_path):
        """`--precision f64` must actually run the sampler in f64 (not
        silently downcast), and record the precision in the checkpoint."""
        import subprocess
        out = tmp_path / "fit"
        root = pathlib.Path(__file__).resolve().parents[1]
        import os
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "tamcmc_tpu.cli", "run",
             "--demo", "single_lorentzian", "--outdir", str(out),
             "--precision", "f64", "--burnin", "40", "--learning", "80",
             "--acquire", "80", "--thin", "4", "--temps", "2",
             "--chains", "4", "--no-report"],
            cwd=root, env=env, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        z = np.load(out / "restore.npz")
        assert z["state_theta"].dtype == np.float64
        assert str(z["meta_precision"]) == "f64"
