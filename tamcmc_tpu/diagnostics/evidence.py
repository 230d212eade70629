"""Thermodynamic-integration evidence from the tempered logL chains.

The parallel-tempering ladder the sampler already runs makes the marginal
likelihood (Bayesian evidence) nearly free: by thermodynamic integration,

    ln Z = \\int_0^1 E_beta[ ln L ] d beta,

where E_beta is the expectation under the tempered posterior at inverse
temperature beta — exactly what each rung samples.  The per-rung logL
trajectories are already streamed to {phase}_chains.npz, so the estimator is
pure post-processing (`tamcmc evidence`).

The geometric ladder covers [beta_min, 1], not [0, 1]; the integral below
beta_min (the prior end) is NOT sampled.  We report the partial integral
plus an optional prior-end extension that assumes E_beta[lnL] is flat below
the coldest-prior rung (exact when the ladder's hottest rung is already
prior-dominated; the `tail_slack` diagnostic — the spread of E[lnL] across
the two hottest rungs — tells you whether that assumption held).

Reference status [U]: SURVEY.md section 2 lists stats/quantile tools only;
whether cpptamcmc computes evidence could not be verified against the empty
mount.  The estimator is standard (Lartillot & Philippe 2006) and uses only
reference-equivalent outputs.
"""

from __future__ import annotations

import numpy as np


def thermodynamic_evidence(logL, betas, burn_frac: float = 0.0):
    """TI evidence estimate from tempered logL chains.

    logL: (E, T, C) per-emit, per-rung, per-walker log-likelihoods
    betas: (T,) inverse temperatures (any order; beta[i] matches logL[:, i])
    burn_frac: fraction of emits to drop from the front

    Returns a dict:
      logZ            — partial TI integral over [beta_min, 1] plus the
                        flat prior-end extension beta_min * E_min[lnL]
      logZ_partial    — integral over the sampled ladder only
      beta_min        — hottest sampled rung
      mean_logL       — (T,) E_beta[lnL] per rung (sorted by beta)
      betas_sorted    — (T,)
      mc_err          — MC standard error of logZ via per-rung standard
                        errors propagated through the trapezoid weights
      tail_slack      — |E[lnL]| difference between the two hottest rungs,
                        times beta_min: bound on the prior-end extension
                        error IF E[lnL] keeps its local slope
    """
    logL = np.asarray(logL, dtype=np.float64)
    betas = np.asarray(betas, dtype=np.float64)
    E, T, C = logL.shape
    drop = int(burn_frac * E)
    x = logL[drop:]                                  # (E', T, C)
    order = np.argsort(betas)
    b = betas[order]
    m = x.mean(axis=(0, 2))[order]                   # (T,)
    # per-rung standard error with a crude ESS correction (lag-1 rho)
    flat = x.transpose(1, 0, 2).reshape(T, -1)[order]
    n = flat.shape[1]
    var = flat.var(axis=1)
    if flat.shape[1] > 2:
        a0 = flat[:, :-1] - flat.mean(1, keepdims=True)
        a1 = flat[:, 1:] - flat.mean(1, keepdims=True)
        rho = np.clip((a0 * a1).mean(1) / np.maximum(var, 1e-30), 0.0, 0.99)
        neff = n * (1 - rho) / (1 + rho)
    else:
        neff = np.full(T, n)
    se = np.sqrt(var / np.maximum(neff, 1.0))

    # trapezoid over the sampled ladder
    w = np.zeros(T)
    dw = np.diff(b)
    w[:-1] += 0.5 * dw
    w[1:] += 0.5 * dw
    logZ_partial = float(np.sum(w * m))
    # flat extension to beta = 0 from the hottest rung
    logZ = logZ_partial + float(b[0] * m[0])
    mc_err = float(np.sqrt(np.sum(((w + np.where(
        np.arange(T) == 0, b[0], 0.0)) * se) ** 2)))
    tail_slack = float(abs(m[1] - m[0]) * b[0]) if T > 1 else float("nan")
    return {
        "logZ": logZ, "logZ_partial": logZ_partial,
        "beta_min": float(b[0]), "mean_logL": m, "betas_sorted": b,
        "mc_err": mc_err, "tail_slack": tail_slack,
    }
