"""Sampler-core tests (SURVEY.md section 4 rungs 1-2): step mechanics,
detailed-balance-level invariants, statistical correctness on analytic
targets, tempering swap correctness, adaptation convergence, determinism."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tamcmc_tpu.sampler import (
    SamplerState, MALAHyper, mala_step, init_state, tempering_swap,
    make_beta_ladder, run_phase, run_phases, PhasePlan,
)
from tamcmc_tpu.sampler.analytic import std_gaussian, correlated_gaussian, bimodal_1d


HP_RW = MALAHyper(use_drift=False, dN_mixing=10)
HP_MALA = MALAHyper(use_drift=True, dN_mixing=10)


def make(problem, hp, T=2, C=4, seed=0):
    key = jax.random.PRNGKey(seed)
    betas = make_beta_ladder(T, hp.lambda_temp)
    state = init_state(problem, hp, T, C, key)
    return betas, state


class TestStepMechanics:
    def test_shapes_and_counters(self):
        p = std_gaussian(3)
        betas, s = make(p, HP_RW, T=2, C=4)
        s2 = mala_step(p, HP_RW, betas, s, jax.random.PRNGKey(1))
        assert s2.theta.shape == (2, 4, 3)
        assert int(s2.step) == 1
        assert float(s2.nprop) == 1.0
        assert np.all(np.isfinite(np.asarray(s2.logL)))

    def test_cached_gradients_consistent(self):
        """After a step, cached logL/grad must equal fresh evaluation at theta."""
        p = std_gaussian(3)
        betas, s = make(p, HP_MALA, T=2, C=4)
        for i in range(5):
            s = mala_step(p, HP_MALA, betas, s, jax.random.PRNGKey(i), adapt=True)
        (logL, _), (gL, _) = p.batched_logparts_and_grad(s.theta)
        np.testing.assert_allclose(np.asarray(s.logL), np.asarray(logL),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s.gradL), np.asarray(gL),
                                   rtol=1e-5, atol=1e-5)

    def test_determinism(self):
        p = std_gaussian(2)
        betas, s = make(p, HP_RW)
        a = mala_step(p, HP_RW, betas, s, jax.random.PRNGKey(7))
        b = mala_step(p, HP_RW, betas, s, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(a.theta), np.asarray(b.theta))

    def test_adapt_false_freezes_proposal(self):
        p = std_gaussian(2)
        betas, s = make(p, HP_RW)
        s2 = mala_step(p, HP_RW, betas, s, jax.random.PRNGKey(3), adapt=False)
        np.testing.assert_array_equal(np.asarray(s2.cov), np.asarray(s.cov))
        np.testing.assert_array_equal(np.asarray(s2.log_sigma),
                                      np.asarray(s.log_sigma))


class TestTempering:
    def test_swap_preserves_theta_logL_pairing(self):
        """After swaps, each walker's stored logL must match its theta."""
        p = std_gaussian(2)
        betas, s = make(p, HP_RW, T=4, C=4)
        for i in range(3):
            s = mala_step(p, HP_RW, betas, s, jax.random.PRNGKey(i))
        s = tempering_swap(betas, s, jax.random.PRNGKey(99), parity=jnp.asarray(0))
        (logL, _), _ = p.batched_logparts_and_grad(s.theta)
        np.testing.assert_allclose(np.asarray(s.logL), np.asarray(logL),
                                   rtol=1e-5, atol=1e-5)

    def test_swap_bookkeeping(self):
        p = std_gaussian(2)
        betas, s = make(p, HP_RW, T=4, C=4)
        s = tempering_swap(betas, s, jax.random.PRNGKey(0), parity=jnp.asarray(0))
        att = np.asarray(s.nswap_att)
        assert att[0] == 1 and att[2] == 1 and att[1] == 0 and att[3] == 0
        s = tempering_swap(betas, s, jax.random.PRNGKey(1), parity=jnp.asarray(1))
        att = np.asarray(s.nswap_att)
        assert att[1] == 1

    def test_identical_logL_always_swaps(self):
        """delta == 0 -> acceptance probability 1 (log u < 0 a.s.)."""
        p = std_gaussian(2)
        betas, s = make(p, HP_RW, T=2, C=8)
        s = s.replace(logL=jnp.zeros_like(s.logL))
        s2 = tempering_swap(betas, s, jax.random.PRNGKey(0), parity=jnp.asarray(0))
        assert float(np.asarray(s2.nswap_acc)[0]) == pytest.approx(1.0)

    def test_beta_ladder(self):
        b = np.asarray(make_beta_ladder(4, 2.0))
        np.testing.assert_allclose(b, [1.0, 0.5, 0.25, 0.125], rtol=1e-6)


class TestStatistical:
    """Posterior-moment recovery on analytic targets within MC error."""

    @pytest.mark.parametrize("hp", [HP_RW, HP_MALA], ids=["rw", "mala"])
    def test_std_gaussian_moments(self, hp):
        """Moments measured on a FROZEN acquire phase after adaptation —
        the reference's B/L -> A protocol.  (Measuring while adaptation is
        live carries the standard finite-gain adaptive-MCMC bias: the
        trajectory-adapted covariance tracks each walker's own excursions,
        inflating sampled variance by ~5-10% until the Robbins-Monro gain
        decays; the Acquire phase exists precisely to avoid this.)"""
        p = std_gaussian(2)
        betas, s = make(p, hp, T=2, C=8, seed=42)
        s, _ = run_phase(p, hp, betas, s, jax.random.PRNGKey(1),
                         n_steps=4000, adapt=True, thin=2, chunk=500)
        s, outs = run_phase(p, hp, betas, s, jax.random.PRNGKey(7),
                            n_steps=16000, adapt=False, thin=2, chunk=1000)
        flat = outs["theta0"][2000:].reshape(-1, 2)
        mean = flat.mean(axis=0)
        std = flat.std(axis=0)
        assert np.all(np.abs(mean) < 0.15), mean
        assert np.all(np.abs(std - 1.0) < 0.15), std

    def test_correlated_gaussian_covariance_adaptation(self):
        cov = np.array([[1.0, 0.9], [0.9, 1.0]])
        p = correlated_gaussian(cov)
        hp = HP_RW
        betas, s = make(p, hp, T=1, C=8, seed=3)
        s, _ = run_phase(p, hp, betas, s, jax.random.PRNGKey(2),
                         n_steps=6000, adapt=True, thin=2, chunk=500)
        s, outs = run_phase(p, hp, betas, s, jax.random.PRNGKey(9),
                            n_steps=4000, adapt=False, thin=2, chunk=500)
        flat = outs["theta0"].reshape(-1, 2)
        emp = np.corrcoef(flat.T)[0, 1]
        assert emp > 0.75, emp
        # learned per-walker proposal covariances should pick up the
        # correlation (check the cold rung's walker average)
        learned = np.asarray(s.cov[0]).mean(axis=0)
        corr = learned[0, 1] / np.sqrt(learned[0, 0] * learned[1, 1])
        assert corr > 0.6, corr

    def test_acceptance_converges_to_target(self):
        p = std_gaussian(4)
        hp = HP_RW
        betas, s = make(p, hp, T=1, C=8, seed=5)
        s, outs = run_phase(p, hp, betas, s, jax.random.PRNGKey(3),
                            n_steps=4000, adapt=True, thin=4, chunk=250)
        acc_tail = outs["acc_rate"][-100:, 0].mean()
        assert abs(acc_tail - 0.234) < 0.12, acc_tail

    def test_tempering_mixes_bimodal(self):
        """Cold chain must visit both modes of a separated bimodal —
        the textbook tempering win."""
        p = bimodal_1d(sep=7.0)
        hp = MALAHyper(use_drift=False, dN_mixing=5, lambda_temp=2.2)
        betas, s = make(p, hp, T=4, C=8, seed=11)
        # start all walkers in the right mode
        s = s.replace(theta=s.theta + 3.5)
        (logL, logP), (gL, gP) = p.batched_logparts_and_grad(s.theta)
        s = s.replace(logL=logL, logP=logP, gradL=gL, gradP=gP)
        s, outs = run_phase(p, hp, betas, s, jax.random.PRNGKey(4),
                            n_steps=6000, adapt=True, thin=3, chunk=500)
        flat = outs["theta0"][500:].reshape(-1)
        frac_left = float(np.mean(flat < 0))
        assert 0.15 < frac_left < 0.85, frac_left
        # swap attempts happened and some were accepted
        assert float(np.asarray(s.nswap_att)[0]) > 0
        assert float(np.asarray(s.nswap_acc).sum()) > 0


class TestPhases:
    def test_run_phases_full_plan(self):
        p = std_gaussian(2)
        hp = HP_RW
        betas, s = make(p, hp, T=2, C=4)
        plan = PhasePlan(burnin=100, learning=200, acquire=200, thin=5, chunk=20)
        s, results = run_phases(p, hp, betas, s, jax.random.PRNGKey(0), plan)
        assert set(results) == {"B", "L", "A"}
        assert results["A"]["theta0"].shape[0] == 40
        assert int(s.step) == 500


class TestSigmaEstimatorSwitch:
    """The sigma-adaptation drive is a documented parity switch
    (MALAHyper.sigma_acc_estimator, docs/PARITY.md): 'expected' uses the
    Rao-Blackwellised min(1, exp(dlog)), 'realized' the 0/1 accept indicator
    (Atchade 2006 as written — presumed reference scheme [U])."""

    def test_estimators_differ_but_both_adapt(self):
        p = std_gaussian(3)
        hp_e = MALAHyper(use_drift=False, sigma_acc_estimator="expected")
        hp_r = MALAHyper(use_drift=False, sigma_acc_estimator="realized")
        betas, s0 = make(p, hp_e, T=2, C=4)
        se, sr = s0, s0
        for i in range(20):
            k = jax.random.PRNGKey(i)
            se = mala_step(p, hp_e, betas, se, k, adapt=True)
            sr = mala_step(p, hp_r, betas, sr, k, adapt=True)
        assert np.all(np.isfinite(np.asarray(se.log_sigma)))
        assert np.all(np.isfinite(np.asarray(sr.log_sigma)))
        # different sigma trajectories (the estimators differ; sigma feeds
        # back into proposals so theta also diverges — by design)
        assert not np.allclose(np.asarray(se.log_sigma),
                               np.asarray(sr.log_sigma))

    def test_realized_converges_to_target(self):
        p = std_gaussian(2)
        hp = MALAHyper(use_drift=False, sigma_acc_estimator="realized",
                       gain_c0=2.0)
        betas, s = make(p, hp, T=1, C=16, seed=3)
        s, _ = run_phase(p, hp, betas, s, jax.random.PRNGKey(5),
                         n_steps=3000, adapt=True, thin=10, chunk=100)
        acc = float(np.asarray(s.acc_rate).mean())
        assert abs(acc - hp.resolved_target()) < 0.12, acc


class TestPhaseOvershoot:
    def test_overshoot_logged_and_counted(self, capsys):
        """run_phase rounds a final partial chunk up to a full chunk; the
        overshoot must be LOGGED (round-3 VERDICT weak #6: `--acquire 2100
        --thin 10` silently emitted 400 records / 4000 raw steps)."""
        p = std_gaussian(2)
        hp = HP_RW
        betas, s = make(p, hp, T=2, C=2, seed=0)
        # 210 steps / thin 10 = 21 emits; chunk 20 -> rounds up to 40 emits
        s, outs = run_phase(p, hp, betas, s, jax.random.PRNGKey(1),
                            n_steps=210, adapt=False, thin=10, chunk=20)
        err = capsys.readouterr().err
        assert "rounds up to 400" in err
        assert outs["theta0"].shape[0] == 40

    def test_exact_multiple_not_logged(self, capsys):
        p = std_gaussian(2)
        hp = HP_RW
        betas, s = make(p, hp, T=2, C=2, seed=0)
        s, outs = run_phase(p, hp, betas, s, jax.random.PRNGKey(1),
                            n_steps=200, adapt=False, thin=10, chunk=10)
        assert "rounds up" not in capsys.readouterr().err
        assert outs["theta0"].shape[0] == 20
