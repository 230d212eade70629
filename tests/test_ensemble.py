"""Aligned-grid multi-star ensemble (sampler/ensemble.py + batch --stacked).

VERDICT round-1 item 2: the vmapped multi-star path must be tested and
reachable.  The key statistical test: two stars with DIFFERENT injected
truths each recover their own posterior — catching the silent failure mode
where a missed field in the per-star dataclasses.replace makes every star
sample against star 0's data.
"""
import json
import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tamcmc_tpu.models import build_model
from tamcmc_tpu.stats.priors import PriorTable
from tamcmc_tpu.sampler.problem import Problem
from tamcmc_tpu.sampler import MALAHyper, make_beta_ladder
from tamcmc_tpu.sampler.driver import PhasePlan
from tamcmc_tpu.sampler.ensemble import (
    validate_stackable, init_ensemble_state, make_ensemble_phase_runner,
    run_ensemble_phases)


def _star(nu, nu0_truth, seed, priors=None):
    fn, layout = build_model("model_Single_Lorentzian")
    truth = jnp.asarray([10.0, nu0_truth, 2.0, 1.0])
    key = jax.random.PRNGKey(seed)
    spec = fn(truth, nu) * jax.random.exponential(key, nu.shape)
    priors = priors or PriorTable.from_rows([
        ("H", "jeffreys", 0.5, 100.0),
        ("nu0", "uniform", 20.0, 80.0),
        ("width", "jeffreys", 0.2, 20.0),
        ("white", "jeffreys", 0.05, 10.0)])
    p0 = jnp.asarray([8.0, nu0_truth + 1.0, 3.0, 1.2])
    return Problem(model_fn=fn, layout=layout, priors=priors, nu=nu,
                   spec=spec, params0=p0)


@pytest.fixture(scope="module")
def nu():
    return jnp.linspace(10.0, 90.0, 4096)


class TestValidateStackable:
    def test_accepts_aligned(self, nu):
        validate_stackable([_star(nu, 40.0, 0), _star(nu, 60.0, 1)])

    def test_rejects_different_model(self, nu):
        a = _star(nu, 40.0, 0)
        fn, layout = build_model("model_Test_Gaussian")
        b = Problem(model_fn=fn, layout=layout,
                    priors=PriorTable.from_rows(
                        [(f"p{i}", "uniform", 0, 1) for i in range(layout.ndim)]),
                    nu=nu, spec=a.spec,
                    params0=jnp.zeros(layout.ndim))
        with pytest.raises(ValueError, match="star 1"):
            validate_stackable([a, b])

    def test_rejects_different_prior_kinds(self, nu):
        a = _star(nu, 40.0, 0)
        pri = PriorTable.from_rows([
            ("H", "jeffreys", 0.5, 100.0),
            ("nu0", "gaussian", 50.0, 5.0),      # kind differs
            ("width", "jeffreys", 0.2, 20.0),
            ("white", "jeffreys", 0.05, 10.0)])
        b = _star(nu, 60.0, 1, priors=pri)
        with pytest.raises(ValueError, match="prior kinds"):
            validate_stackable([a, b])

    def test_rejects_unaligned_grid(self, nu):
        a = _star(nu, 40.0, 0)
        b = _star(jnp.linspace(10.0, 90.0, 2048), 60.0, 1)
        with pytest.raises(ValueError, match="grid"):
            validate_stackable([a, b])

    def test_rejects_mixed_likelihood(self, nu):
        import dataclasses
        a = _star(nu, 40.0, 0)
        b = dataclasses.replace(_star(nu, 60.0, 1), likelihood="chi_square",
                                sigma_spec=jnp.ones_like(nu))
        with pytest.raises(ValueError, match="likelihood"):
            validate_stackable([a, b])


class TestEnsembleSampling:
    def test_each_star_recovers_own_truth(self, nu):
        """THE anti-bleed test: injected nu0 = 40 vs 60, separated by ~300
        posterior sigmas — if any per-star field leaks from star 0, star 1's
        median lands at 40 and this fails loudly."""
        problems = [_star(nu, 40.0, 0), _star(nu, 60.0, 1)]
        hp = MALAHyper(use_drift=True, dN_mixing=10, lambda_temp=1.6)
        plan = PhasePlan(burnin=300, learning=800, acquire=800, thin=4)
        betas = make_beta_ladder(2, hp.lambda_temp)
        states = init_ensemble_state(problems, hp, 2, 6, jax.random.PRNGKey(3))
        states, results = run_ensemble_phases(
            problems, hp, betas, states, jax.random.PRNGKey(4), plan)
        th = results["A"]["theta0"]          # (E, S, C, Df)
        assert th.shape[1] == 2
        med = np.median(th.reshape(th.shape[0], 2, -1, th.shape[-1]),
                        axis=(0, 2))         # (S, Df)
        # free param order: H, nu0, width, white
        assert abs(med[0, 1] - 40.0) < 0.5, med[0]
        assert abs(med[1, 1] - 60.0) < 0.5, med[1]
        # heights also land near truth (loose: H/width anticorrelate and the
        # run is CI-short — the sharp discriminator is nu0 above)
        assert abs(med[0, 0] - 10.0) < 6.0
        assert abs(med[1, 0] - 10.0) < 6.0

    def test_runner_shapes_and_determinism(self, nu):
        problems = [_star(nu, 40.0, 0), _star(nu, 60.0, 1)]
        hp = MALAHyper(use_drift=False)
        betas = make_beta_ladder(2, hp.lambda_temp)
        states = init_ensemble_state(problems, hp, 2, 4, jax.random.PRNGKey(0))
        runner = make_ensemble_phase_runner(problems, hp, betas, adapt=True,
                                            thin=2, n_emit=3)
        s1, r1 = runner(states, jax.random.PRNGKey(9))
        states2 = init_ensemble_state(problems, hp, 2, 4, jax.random.PRNGKey(0))
        s2, r2 = runner(states2, jax.random.PRNGKey(9))
        assert r1["theta0"].shape == (3, 2, 4, 4)   # (E, S, C, Df)
        np.testing.assert_array_equal(np.asarray(s1.theta),
                                      np.asarray(s2.theta))


class TestStackedCLI:
    def test_batch_stacked(self, tmp_path):
        """batch --stacked end-to-end: per-star outdirs with samples +
        summaries."""
        from tamcmc_tpu.cli import main
        presets = tmp_path / "presets.toml"
        presets.write_text(
            '[[star]]\ndemo = "single_lorentzian"\nseed = 0\n'
            'outdir = "s0"\ntemps = 2\nchains = 4\n'
            'burnin = 100\nlearning = 200\nacquire = 200\nthin = 5\n\n'
            '[[star]]\ndemo = "single_lorentzian"\nseed = 7\n'
            'outdir = "s1"\n')
        main(["batch", "--presets", str(presets), "--stacked"])
        for s in ("s0", "s1"):
            d = tmp_path / s
            assert (d / "A_samples.bin").exists()
            assert (d / "summary.json").exists()
            rows = json.loads((d / "summary.json").read_text())
            assert len(rows) == 4
            assert all(np.isfinite(r["median"]) for r in rows)
        # different noise realizations -> different posteriors
        j0 = json.loads((tmp_path / "s0" / "summary.json").read_text())
        j1 = json.loads((tmp_path / "s1" / "summary.json").read_text())
        assert j0 != j1

    def test_batch_stacked_rejects_heterogeneous(self, tmp_path):
        from tamcmc_tpu.cli import main
        presets = tmp_path / "presets.toml"
        presets.write_text(
            '[[star]]\ndemo = "single_lorentzian"\noutdir = "s0"\n\n'
            '[[star]]\ndemo = "harvey_background"\noutdir = "s1"\n')
        with pytest.raises(SystemExit, match="not stackable"):
            main(["batch", "--presets", str(presets), "--stacked"])


class TestStackedResume:
    PRESETS = ('[[star]]\ndemo = "single_lorentzian"\nseed = 0\n'
               'outdir = "s0"\ntemps = 2\nchains = 4\n'
               'burnin = 100\nlearning = 200\nacquire = 200\nthin = 5\n\n'
               '[[star]]\ndemo = "single_lorentzian"\nseed = 7\n'
               'outdir = "s1"\n')

    def _patch_chunks(self, monkeypatch):
        import dataclasses
        from tamcmc_tpu import demos
        orig = demos.make_demo

        def small(name, seed=0, ngrid=None):
            p, hp, plan, meta = orig(name, seed=seed, ngrid=ngrid)
            return p, hp, dataclasses.replace(plan, chunk=10), meta
        monkeypatch.setattr(demos, "make_demo", small)

    def test_stacked_crash_resume_bitwise(self, tmp_path, monkeypatch):
        """Kill a stacked ensemble mid-Learning; --resume matches the
        uninterrupted run exactly for EVERY star."""
        from tamcmc_tpu.cli import main
        from tamcmc_tpu.io.outputs import OutputWriter, read_bin_samples
        self._patch_chunks(monkeypatch)

        ref = tmp_path / "ref"
        ref.mkdir()
        (ref / "presets.toml").write_text(self.PRESETS)
        main(["batch", "--presets", str(ref / "presets.toml"),
              "--stacked", "--ckpt-every", "1"])

        out = tmp_path / "crashy"
        out.mkdir()
        (out / "presets.toml").write_text(self.PRESETS)
        orig = OutputWriter.append_chunk
        n = {"v": 0}

        def crashing(self_w, phase, outs):
            orig(self_w, phase, outs)
            if phase == "L":
                n["v"] += 1
                if n["v"] > 4:       # 2 writers x 2 chunks, die on the 3rd
                    raise RuntimeError("injected crash")
        monkeypatch.setattr(OutputWriter, "append_chunk", crashing)
        with pytest.raises(RuntimeError, match="injected crash"):
            main(["batch", "--presets", str(out / "presets.toml"),
                  "--stacked", "--ckpt-every", "1"])
        monkeypatch.setattr(OutputWriter, "append_chunk", orig)
        assert (out / "stacked_restore.npz").exists()
        main(["batch", "--presets", str(out / "presets.toml"),
              "--stacked", "--ckpt-every", "1", "--resume"])

        for star in ("s0", "s1"):
            for phase in ("B", "L", "A"):
                a, _ = read_bin_samples(str(out / star), phase)
                b, _ = read_bin_samples(str(ref / star), phase)
                np.testing.assert_array_equal(
                    a, b, err_msg=f"{star} phase {phase}")
