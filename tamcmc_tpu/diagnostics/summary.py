"""Posterior summaries (median, credible intervals, ESS per parameter).

Reference equivalent: the stats/quantile extraction tools (SURVEY.md
section 2 "Tool: stats/quantiles" — partially in the companion TAMCMC-tools
repo).  This module is also the parity harness: posterior-moment comparison
per BASELINE.json's metric.
"""

from __future__ import annotations

import numpy as np

from tamcmc_tpu.diagnostics.ess import (effective_sample_size, autocorr_time,
                                        split_rhat)


def posterior_summary(samples: np.ndarray, names=None,
                      quantiles=(0.025, 0.16, 0.5, 0.84, 0.975)):
    """samples: (N, D) flat posterior draws (walkers already flattened) or
    (E, C, D).  Returns list of per-parameter dicts.

    f64 cast first — f32 axis reductions accumulate sequentially and bias
    large-scale means (see diagnostics/ess.py autocorr_time docstring)."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 3:
        E, C, D = samples.shape
        per_walker = samples            # (E, C, D) for ESS
        flat = samples.reshape(E * C, D)
    else:
        flat = samples
        per_walker = samples[:, None, :]
    D = flat.shape[1]
    names = list(names) if names else [f"p{i}" for i in range(D)]
    out = []
    for i in range(D):
        qs = np.quantile(flat[:, i], quantiles)
        out.append({
            "name": names[i],
            "mean": float(flat[:, i].mean()),
            "std": float(flat[:, i].std()),
            "quantiles": {f"q{int(q*1000)/10}": float(v)
                          for q, v in zip(quantiles, qs)},
            "median": float(qs[len(qs) // 2]),
            "ess": float(effective_sample_size(per_walker[:, :, i])),
            "tau": float(autocorr_time(per_walker[:, :, i])),
            "rhat": float(split_rhat(per_walker[:, :, i])),
        })
    return out


def format_summary(rows, max_rows=None) -> str:
    lines = [f"{'param':<18}{'median':>12}{'mean':>12}{'std':>11}"
             f"{'q16':>12}{'q84':>12}{'ESS':>9}{'Rhat':>8}"]
    for r in rows[:max_rows]:
        rhat = r.get("rhat")
        if rhat is not None and np.isfinite(rhat):
            rtxt = f"{rhat:>8.3f}"
        elif rhat is not None and np.isposinf(rhat):
            # split_rhat returns +inf for frozen sub-chains with disagreeing
            # means — the STRONGEST divergence signal; render it as such,
            # '-' stays reserved for statistic-unavailable (NaN/short chain)
            rtxt = f"{'inf':>8}"
        else:
            rtxt = f"{'-':>8}"
        lines.append(f"{r['name']:<18}{r['median']:>12.5g}{r['mean']:>12.5g}"
                     f"{r['std']:>11.4g}{r['quantiles']['q16.0']:>12.5g}"
                     f"{r['quantiles']['q84.0']:>12.5g}{r['ess']:>9.0f}"
                     + rtxt)
    return "\n".join(lines)
