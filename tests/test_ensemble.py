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


@pytest.mark.slow
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

        def small(name, seed=0, ngrid=None, n_orders=None):
            p, hp, plan, meta = orig(name, seed=seed, ngrid=ngrid,
                                     n_orders=n_orders)
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


def _ms_star(nu0_comb, seed, nu_start=1800.0, nu_step=0.1, n_bins=8000):
    """Tiny ms_global star (2 orders, l=0 only) with static truncation
    windows anchored at ITS OWN params0 — the round-2 wrong-answer setup:
    every star's closure bakes different window groups."""
    import dataclasses as dc
    from tamcmc_tpu.models.ms_global import MSGlobalSpec

    nu = jnp.asarray(nu_start + nu_step * np.arange(n_bins), jnp.float32)
    spec_obj = MSGlobalSpec(n_per_l=(2, 0, 0, 0), n_harvey=1)
    fn_d, layout = build_model("model_MS_Global_a1etaa3_HarveyLike", spec_obj)
    truth = np.zeros(layout.ndim, dtype=np.float64)
    truth[layout.offset("heights"):layout.offset("heights") + 2] = [12.0, 10.0]
    fo = layout.offset("freq_l0")
    truth[fo:fo + 2] = [nu0_comb, nu0_comb + 90.0]
    truth[layout.offset("rot"):layout.offset("rot") + 4] = [0, 0, 0, 0]
    truth[layout.offset("widths"):layout.offset("widths") + 2] = [1.5, 1.5]
    truth[layout.offset("noise"):layout.offset("noise") + 4] = [-1, -1, 2, 0.5]
    truth[layout.offset("trunc")] = 40.0
    p0 = truth.copy()
    p0[fo:fo + 2] += 0.5
    hint = (tuple(float(v) for v in p0), float(nu_start), float(nu_step),
            int(n_bins), 10.0)
    spec_win = dc.replace(spec_obj, window_hint=hint)
    fn, layout = build_model("model_MS_Global_a1etaa3_HarveyLike", spec_win)
    tj = jnp.asarray(truth, jnp.float32)
    key = jax.random.PRNGKey(seed)
    data = jax.jit(lambda t, n, k: fn_d(t, n) *
                   jax.random.exponential(k, n.shape))(tj, nu, key)
    rows = [("H_0", "jeffreys", 0.5, 100.0), ("H_1", "jeffreys", 0.5, 100.0),
            ("f0_0", "gaussian", float(p0[fo]), 1.0),
            ("f0_1", "gaussian", float(p0[fo + 1]), 1.0),
            ("a1", "fix"), ("eta_sw", "fix"), ("a3", "fix"), ("asym", "fix"),
            ("W_0", "jeffreys", 0.2, 10.0), ("W_1", "jeffreys", 0.2, 10.0),
            ("A1", "fix"), ("B1", "fix"), ("p1", "fix"), ("N0", "jeffreys",
                                                          0.05, 10.0),
            ("inc", "fix"), ("trunc", "fix")]
    priors = PriorTable.from_rows(rows)
    assert priors.ndim == layout.ndim
    problem = Problem(
        model_fn=fn, layout=layout, priors=priors, nu=nu, spec=data,
        params0=jnp.asarray(p0, jnp.float32),
        model_meta={"name": "model_MS_Global_a1etaa3_HarveyLike",
                    "spec": spec_win})
    return problem, truth, layout


class TestWindowedEnsembleAntiBleed:
    """VERDICT round-2 weak #4: two ms_global stars with OFFSET frequency
    combs and per-star static truncation windows.  The round-2 runner reused
    star 0's closure — star 1's modes fell outside star 0's baked windows and
    were silently truncated to background.  The fix merges the window groups
    (per-component union) into ONE closure correct for every star."""

    def test_merged_windows_cover_every_star(self):
        from tamcmc_tpu.sampler.ensemble import _shared_model_problem
        a, truth_a, layout = _ms_star(2000.0, seed=0)
        b, truth_b, _ = _ms_star(2400.0, seed=1)     # comb offset 400 uHz
        validate_stackable([a, b])                   # must be accepted
        shared = _shared_model_problem([a, b])
        tb = jnp.asarray(truth_b, jnp.float32)
        dense_fn, _ = build_model("model_MS_Global_a1etaa3_HarveyLike",
                                  n_per_l=(2, 0, 0, 0), n_harvey=1)
        m_dense = np.asarray(jax.jit(dense_fn)(tb, b.nu))
        m_shared = np.asarray(jax.jit(shared.model_fn)(tb, b.nu))
        m_star0 = np.asarray(jax.jit(a.model_fn)(tb, b.nu))
        # merged closure reproduces star b's spectrum (windows cover it) ...
        np.testing.assert_allclose(m_shared, m_dense, rtol=1e-3, atol=1e-3)
        # ... while star 0's closure (the round-2 behaviour) truncates star
        # b's modes away: its peak power is background-level
        assert m_star0.max() < 0.25 * m_dense.max(), \
            (m_star0.max(), m_dense.max())

    def test_offset_comb_stars_recover_own_truth(self):
        a, truth_a, layout = _ms_star(2000.0, seed=0)
        b, truth_b, _ = _ms_star(2400.0, seed=1)
        problems = [a, b]
        hp = MALAHyper(use_drift=True, dN_mixing=10, lambda_temp=1.6)
        plan = PhasePlan(burnin=200, learning=600, acquire=600, thin=4)
        betas = make_beta_ladder(2, hp.lambda_temp)
        states = init_ensemble_state(problems, hp, 2, 4, jax.random.PRNGKey(5))
        states, results = run_ensemble_phases(
            problems, hp, betas, states, jax.random.PRNGKey(6), plan)
        th = results["A"]["theta0"]                  # (E, S, C, Df)
        med = np.median(th.reshape(th.shape[0], 2, -1, th.shape[-1]),
                        axis=(0, 2))                 # (S, Df)
        fo = layout.offset("freq_l0")
        i_f0 = int(np.nonzero(problems[0].free_idx == fo)[0][0])
        for s, truth in enumerate((truth_a, truth_b)):
            for k in range(2):
                assert abs(med[s, i_f0 + k] - truth[fo + k]) < 1.0, \
                    (s, k, med[s, i_f0 + k], truth[fo + k])
