"""BASELINE configs 4-5 sampled END-TO-END in CI-sized form
(VERDICT round-1 item 7; BASELINE.json configs kepler_full /
subgiant_mixed).  Round 1 only unit-tested the model builds; these tests
run the full pipeline — synthetic data from the model, B/L/A phases,
posterior recovery of the physically interesting parameters within MC
error — on CPU in minutes (scaled-down orders/grid via make_demo's
ngrid/n_orders knobs; the physics, parameter blocks, and sampler path are
the production ones)."""
import numpy as np
import jax
import pytest

from tamcmc_tpu.demos import make_demo
from tamcmc_tpu.sampler import init_state, make_beta_ladder, run_phases
from tamcmc_tpu.sampler.driver import PhasePlan


def _fit(problem, hp, truth, n_temps, n_chains, plan, seed=0):
    betas = make_beta_ladder(n_temps, hp.lambda_temp)
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    state = init_state(problem, hp, n_temps, n_chains, sub)
    state, results = run_phases(problem, hp, betas, state, key, plan)
    th = results["A"]["theta0"]                  # (E, C, Df)
    med = np.median(th.reshape(-1, th.shape[-1]), axis=0)
    std = np.std(th.reshape(-1, th.shape[-1]), axis=0)
    return state, med, std, results


def _free_index(problem, full_index):
    where = np.nonzero(problem.free_idx == full_index)[0]
    assert where.size == 1, f"param {full_index} is not free"
    return int(where[0])


@pytest.mark.slow
class TestKeplerFullE2E:
    """Config 4: dozens of modes, l up to 3, 10+ temperatures — CI-scaled to
    5 orders x l<=3 on a 6k grid with 4 rungs."""

    def test_recovers_rotation_and_inclination(self):
        problem, hp, plan, meta = make_demo("kepler_full", seed=1,
                                            ngrid=6000, n_orders=5)
        truth = meta["truth"]
        layout = problem.layout
        plan = PhasePlan(burnin=400, learning=1200, acquire=1200, thin=4)
        state, med, std, results = _fit(problem, hp, truth, 4, 4, plan)

        ro = layout.offset("rot")
        io_ = layout.offset("inclination")
        i_a1 = _free_index(problem, ro)          # a1 splitting
        i_inc = _free_index(problem, io_)
        a1_t = truth[ro]
        inc_t = truth[io_]
        # a1 and i sit on the classic a1-i degeneracy ridge, and at THIS
        # CI scale (5 orders, 6k bins, chi2-2dof noise) the likelihood is
        # measured FLAT along it (logL difference < 1 between truth and the
        # sampled median) — the posterior median along the ridge is
        # prior-volume driven, so sharp recovery assertions would test the
        # noise realization, not the sampler.  Assert instead what the
        # config does constrain:
        #  (1) the chain found the likelihood optimum region,
        #  (2) the projected splitting lands in the ridge neighbourhood,
        #  (3) both params stay far from their U(0,8)/U(0,pi/2) prior bulk.
        import jax.numpy as jnp
        import jax as _jax
        logL_t, _ = _jax.jit(problem.log_parts)(
            problem.extract(jnp.asarray(truth, jnp.float32)))
        logL_m, _ = _jax.jit(problem.log_parts)(jnp.asarray(med))
        assert float(logL_m) > float(logL_t) - 10.0, \
            (float(logL_m), float(logL_t))
        th = results["A"]["theta0"].reshape(-1, med.shape[0])
        proj = th[:, i_a1] * np.sin(th[:, i_inc])
        proj_t = a1_t * np.sin(inc_t)
        assert abs(np.median(proj) - proj_t) < 0.5, (np.median(proj), proj_t)
        assert abs(med[i_a1] - a1_t) < 1.0, (med[i_a1], a1_t)
        assert abs(med[i_inc] - inc_t) < 0.6, (med[i_inc], inc_t)
        # cold-chain frequencies: every free l=0 frequency within 5 sigma
        fo = layout.offset("freq_l0")
        for k in range(layout.size("freq_l0")):
            i = _free_index(problem, fo + k)
            assert abs(med[i] - truth[fo + k]) < max(5 * std[i], 1.0)
        # sane sampler health
        acc = float(np.asarray(state.acc_rate)[0].mean())
        assert 0.05 < acc < 0.95
        att = np.asarray(state.nswap_att)
        assert np.all(att[:-1] > 0)


@pytest.mark.slow
class TestSubgiantMixedE2E:
    """Config 5: ARMM l=1 mixed-mode forest — the declared hardest model
    port, here sampled end-to-end with DPi1/q/a1_core free."""

    def test_recovers_mixed_mode_parameters(self):
        problem, hp, plan, meta = make_demo("subgiant_mixed", seed=2,
                                            ngrid=6000)
        truth = meta["truth"]
        layout = problem.layout
        plan = PhasePlan(burnin=400, learning=1200, acquire=1200, thin=4)
        state, med, std, results = _fit(problem, hp, truth, 4, 4, plan)

        mo = layout.offset("mixed")
        i_dpi = _free_index(problem, mo)         # DPi1
        i_q = _free_index(problem, mo + 2)       # coupling q
        dpi_t, q_t = truth[mo], truth[mo + 2]
        assert abs(med[i_dpi] - dpi_t) < max(5 * std[i_dpi], 2.0), \
            (med[i_dpi], dpi_t, std[i_dpi])
        assert abs(med[i_q] - q_t) < max(5 * std[i_q], 0.08), \
            (med[i_q], q_t, std[i_q])
        # inclination: prior is U(0, pi/2); must be pulled toward 60 deg
        io_ = layout.offset("inclination")
        i_inc = _free_index(problem, io_)
        assert abs(med[i_inc] - truth[io_]) < max(5 * std[i_inc], 0.35)
        assert np.all(np.isfinite(np.asarray(results["A"]["logL"])))
