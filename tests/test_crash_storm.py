"""Crash-storm soak of the month-long-fit story (round-4 VERDICT #7).

Every resilience piece — intra-phase checkpoints (--ckpt-every), .bin
truncate-on-resume, periodic in-run reports (--report-every), mesh
sharding, the bf16 profile stream — is tested separately; a real
production fit exercises them COMPOSED, under repeated ungraceful kills at
arbitrary points (mid-chunk included).  This soak kills a running CLI fit
with SIGKILL at randomized delays, resumes it each time, and asserts the
final streamed posterior is BITWISE-identical to an uninterrupted run with
the same flags (SURVEY sections 5.3/5.4: recovery must not perturb the
chain).
"""
import os
import pathlib
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]

FLAGS = ["run", "--demo", "ms_global", "--ngrid", "2000", "--n-orders", "2",
         "--temps", "4", "--chains", "4", "--burnin", "400",
         "--learning", "1200", "--acquire", "1600", "--thin", "4",
         "--chunk", "25", "--ckpt-every", "2", "--report-every", "4",
         "--mesh", "2x2", "--precision", "bf16", "--no-report"]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    fl = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in fl:
        env["XLA_FLAGS"] = (fl +
                            " --xla_force_host_platform_device_count=8"
                            ).strip()
    return env


def _run(outdir, resume, timeout=1800):
    cmd = [sys.executable, "-m", "tamcmc_tpu.cli"] + FLAGS + \
        ["--outdir", str(outdir)] + (["--resume"] if resume else [])
    return subprocess.Popen(cmd, cwd=ROOT, env=_env(),
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)


@pytest.mark.slow
class TestCrashStorm:
    def test_storm_resumes_bitwise(self, tmp_path):
        rng = np.random.default_rng(2026)
        storm = tmp_path / "storm"
        clean = tmp_path / "clean"

        # --- the control FIRST: one uninterrupted run, same flags/seed.
        # Doubles as the compile-cache warmer: XLA:CPU compiles of the
        # mesh program take minutes cold on this box, and a storm against
        # cold caches kills every cycle mid-compile with zero progress
        # (observed) — a real month-long fit likewise crashes with warm
        # caches, so warm-cache kills are the story being rehearsed.
        t0 = time.time()
        p = _run(clean, resume=False)
        out = p.communicate(timeout=3000)[0]
        t_clean = time.time() - t0
        assert p.returncode == 0, out[-2000:]

        # --- the storm: kill -9 at randomized delays, resume, repeat.
        # Delays are fractions of the measured clean runtime so kills roam
        # the phases regardless of how fast this host is.
        kills = 0
        last_out = ""
        for cycle in range(12):
            p = _run(storm, resume=cycle > 0)
            delay = max(10.0, float(rng.uniform(0.10, 0.30)) * t_clean)
            try:
                last_out = p.communicate(timeout=delay)[0]
                break                         # fit completed this cycle
            except subprocess.TimeoutExpired:
                p.send_signal(signal.SIGKILL)   # ungraceful, exact PID
                p.wait()
                kills += 1
                time.sleep(0.2)
        else:
            pytest.fail("fit never completed within 12 kill/resume cycles")
        assert kills >= 2, \
            f"storm too gentle ({kills} kills) — lengthen the fit"
        assert "total wall time" in last_out, last_out[-2000:]

        # --- bitwise identity of every streamed artifact ---
        for phase in ("B", "L", "A"):
            a = (storm / f"{phase}_samples.bin").read_bytes()
            b = (clean / f"{phase}_samples.bin").read_bytes()
            assert a == b, \
                f"phase {phase}: storm/clean .bin differ " \
                f"({len(a)} vs {len(b)} bytes)"
            za = np.load(storm / f"{phase}_chains.npz")
            zb = np.load(clean / f"{phase}_chains.npz")
            assert set(za.files) == set(zb.files)
            for k in za.files:
                np.testing.assert_array_equal(
                    za[k], zb[k], err_msg=f"{phase}_chains[{k}]")
        # periodic in-run diagnostics were exercised along the way
        assert (storm / "inrun").exists(), "report-every never fired"

    def test_adapt_ladder_crash_resume_bitwise(self, tmp_path):
        """The adaptive ladder's state (betas, update count, counter
        snapshots) rides the checkpoint meta: a killed --adapt-ladder fit
        must resume to a bitwise-identical posterior AND final ladder."""
        flags = ["run", "--demo", "single_lorentzian", "--temps", "4",
                 "--chains", "4", "--burnin", "200", "--learning", "600",
                 "--acquire", "800", "--thin", "4", "--chunk", "25",
                 "--ckpt-every", "2", "--dn-mixing", "2", "--adapt-ladder",
                 "--no-report"]

        def run(outdir, resume, timeout=None):
            cmd = [sys.executable, "-m", "tamcmc_tpu.cli"] + flags + \
                ["--outdir", str(outdir)] + (["--resume"] if resume else [])
            p = subprocess.Popen(cmd, cwd=ROOT, env=_env(),
                                 stdout=subprocess.PIPE,
                                 stderr=subprocess.STDOUT, text=True)
            if timeout is None:
                out = p.communicate(timeout=1200)[0]
                return p.returncode, out
            try:
                p.communicate(timeout=timeout)
                return p.returncode, "completed-before-kill"
            except subprocess.TimeoutExpired:
                p.send_signal(signal.SIGKILL)
                p.wait()
                return None, "killed"

        t0 = time.time()
        rc, out = run(tmp_path / "clean", resume=False)   # + cache warm
        t_clean = time.time() - t0
        assert rc == 0, out[-2000:]
        # kill mid-run (after startup, before completion), then resume
        rc, status = run(tmp_path / "storm", resume=False,
                         timeout=max(8.0, 0.5 * t_clean))
        if status == "killed":
            rc, out = run(tmp_path / "storm", resume=True)
            assert rc == 0, out[-2000:]
        for phase in ("B", "L", "A"):
            a = (tmp_path / "storm" / f"{phase}_samples.bin").read_bytes()
            b = (tmp_path / "clean" / f"{phase}_samples.bin").read_bytes()
            assert a == b, f"phase {phase} differs after ladder resume"
        np.testing.assert_array_equal(
            np.load(tmp_path / "storm" / "betas.npy"),
            np.load(tmp_path / "clean" / "betas.npy"))
