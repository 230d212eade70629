"""Thermodynamic-integration evidence (diagnostics/evidence.py + CLI).

Validation on an analytic conjugate case with exact answers at every level:
target logL(x) = -x^2/2, prior N(0,1) =>
  E_beta[lnL] = -0.5 / (1 + beta)        (tempered posterior is N(0, 1/(1+b)))
  ln Z        = int_0^1 E_beta dbeta = -0.5 ln 2 ~= -0.34657
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tamcmc_tpu.diagnostics.evidence import thermodynamic_evidence
from tamcmc_tpu.sampler import MALAHyper, init_state, make_beta_ladder, \
    run_phase
from tamcmc_tpu.sampler.analytic import AnalyticProblem


LN_Z_TRUE = -0.5 * np.log(2.0)


def _gauss_gauss_problem():
    return AnalyticProblem(
        logpdf=lambda x: -0.5 * jnp.sum(x**2),
        ndim=1, x0=np.zeros(1),
        log_prior=lambda x: -0.5 * jnp.sum(x**2)
        - 0.5 * np.log(2 * np.pi))


def test_estimator_on_exact_expectations():
    """Feed the estimator the EXACT per-rung expectations — the quadrature
    error alone must be small and the prior-end extension controlled."""
    T = 12
    betas = 1.0 / 1.8 ** np.arange(T)
    m = -0.5 / (1.0 + betas)          # exact E_beta[lnL]
    logL = np.broadcast_to(m[None, :, None], (400, T, 4)).copy()
    res = thermodynamic_evidence(logL, betas)
    # trapezoid + flat-tail error on this ladder is ~1e-3
    assert abs(res["logZ"] - LN_Z_TRUE) < 5e-3, res["logZ"]
    assert res["mc_err"] < 1e-6       # zero-variance input
    assert res["beta_min"] == pytest.approx(betas.min())


def test_sampled_evidence_recovers_analytic():
    p = _gauss_gauss_problem()
    hp = MALAHyper(use_drift=False, dN_mixing=5, lambda_temp=1.8)
    T, C = 12, 8
    betas = make_beta_ladder(T, hp.lambda_temp)
    key = jax.random.PRNGKey(0)
    state = init_state(p, hp, T, C, key)
    state, _ = run_phase(p, hp, betas, state, jax.random.PRNGKey(1),
                         n_steps=3000, adapt=True, thin=3, chunk=250)
    state, outs = run_phase(p, hp, betas, state, jax.random.PRNGKey(2),
                            n_steps=6000, adapt=False, thin=3, chunk=500)
    res = thermodynamic_evidence(outs["logL"], np.asarray(betas),
                                 burn_frac=0.1)
    # MC + quadrature error budget: a few times the reported mc_err
    tol = max(5 * res["mc_err"], 0.03)
    assert abs(res["logZ"] - LN_Z_TRUE) < tol, (res["logZ"], LN_Z_TRUE, tol)
    # per-rung means track the analytic curve
    want = -0.5 / (1.0 + res["betas_sorted"])
    np.testing.assert_allclose(res["mean_logL"], want, atol=0.05)


def test_cli_evidence(tmp_path):
    from tamcmc_tpu.cli import main
    out = tmp_path / "fit"
    main(["run", "--demo", "single_lorentzian", "--outdir", str(out),
          "--burnin", "100", "--learning", "200", "--acquire", "300",
          "--thin", "5", "--temps", "6", "--no-report"])
    assert (out / "betas.npy").exists()
    j = tmp_path / "ev.json"
    main(["evidence", "--outdir", str(out), "--json", str(j)])
    import json
    res = json.loads(j.read_text())
    assert np.isfinite(res["logZ"])
    assert res["logZ_partial"] >= res["logZ"] - abs(res["logZ"])  # sane
    assert len(res["betas_sorted"]) == 6
