"""Convergence/efficiency diagnostics: multi-chain ESS and split-R-hat.

The reference eyeballs convergence from trace plots (SURVEY.md section 4);
these are the automated companion-tools-grade statistics run by
`tamcmc stats` / summary.json.
"""
import numpy as np

from tamcmc_tpu.diagnostics.ess import (autocorr_time,
                                        effective_sample_size, split_rhat)
from tamcmc_tpu.diagnostics.summary import posterior_summary, format_summary


class TestSplitRhat:
    def test_iid_chains_converged(self):
        rng = np.random.default_rng(0)
        chain = rng.standard_normal((2000, 8))
        r = split_rhat(chain)
        assert 0.99 < r < 1.01, r

    def test_disjoint_walkers_flagged(self):
        rng = np.random.default_rng(1)
        chain = rng.standard_normal((1000, 4)) * 0.1
        chain[:, 2:] += 5.0                      # two walkers stuck elsewhere
        assert split_rhat(chain) > 1.5

    def test_scale_disagreement_caught_by_folded_term(self):
        # same means, wildly different variances: the location-only
        # statistic is blind to this; the folded rank-normalized term isn't
        rng = np.random.default_rng(2)
        chain = np.concatenate(
            [rng.standard_normal((1500, 4)) * 0.05,
             rng.standard_normal((1500, 4)) * 3.0], axis=1)
        assert split_rhat(chain) > 1.2

    def test_nonstationary_trend_flagged(self):
        # a still-drifting chain: first half differs from second half
        rng = np.random.default_rng(3)
        n = 2000
        chain = rng.standard_normal((n, 4)) + \
            np.linspace(0, 4, n)[:, None]
        assert split_rhat(chain) > 1.2

    def test_heavy_tails_do_not_false_alarm(self):
        # rank-normalization: converged Cauchy chains must still read ~1
        rng = np.random.default_rng(4)
        chain = rng.standard_cauchy((4000, 8))
        assert split_rhat(chain) < 1.02

    def test_short_chain_returns_nan(self):
        assert np.isnan(split_rhat(np.zeros((3, 2))))


class TestESS:
    def test_iid_ess_near_n(self):
        rng = np.random.default_rng(0)
        chain = rng.standard_normal((4000, 4))
        ess = effective_sample_size(chain)
        assert 0.5 * 16000 < ess <= 16000 * 1.2

    def test_correlated_chain_tau_grows(self):
        rng = np.random.default_rng(1)
        n, rho = 8000, 0.95
        x = np.zeros((n, 2))
        for i in range(1, n):
            x[i] = rho * x[i - 1] + np.sqrt(1 - rho**2) * \
                rng.standard_normal(2)
        tau = autocorr_time(x)
        # AR(1) theory: tau = (1+rho)/(1-rho) = 39
        assert 15 < tau < 90, tau


class TestSummary:
    def test_summary_includes_rhat_and_formats(self):
        rng = np.random.default_rng(5)
        samples = rng.standard_normal((500, 4, 3))   # (E, C, D)
        rows = posterior_summary(samples, names=["a", "b", "c"])
        assert all("rhat" in r for r in rows)
        assert all(0.9 < r["rhat"] < 1.1 for r in rows)
        txt = format_summary(rows)
        assert "Rhat" in txt.splitlines()[0]
        assert len(txt.splitlines()) == 4
