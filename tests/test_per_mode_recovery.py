"""Per-mode mixed-mode freedom: a forest that DEVIATES from the clean
asymptotic relation is fittable (round-3 VERDICT missing #5 "done"
criterion).  Synthetic truth perturbs individual mixed modes (frequency
scatter + height factor); the fit frees ONLY those per-mode entries and
must recover them starting from the neutral (clean-relation) values.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tamcmc_tpu.models.registry import build_model
from tamcmc_tpu.models.asymptotic import RGBAsymptSpec
from tamcmc_tpu.ops.armm import mixed_mode_frequencies, count_poles
from tamcmc_tpu.stats.priors import PriorTable
from tamcmc_tpu.sampler.problem import Problem
from tamcmc_tpu.sampler import init_state, make_beta_ladder, run_phases
from tamcmc_tpu.sampler.driver import PhasePlan

DNU, DPI1, EPSG, Q = 10.0, 80.0, 0.0, 0.15
NUMIN, NUMAX = 100.0, 160.0


def _base_params(lay, n0):
    p = np.zeros(lay.ndim, dtype=np.float32)
    f0 = 100.0 + DNU * (np.arange(n0) + 0.4)
    o = lay.offset
    p[o("heights"):o("heights") + n0] = 6.0
    p[o("visibilities"):o("visibilities") + 2] = [1.5, 0.53]
    p[o("freq_l0"):o("freq_l0") + n0] = f0
    p[o("freq_l2"):o("freq_l2") + n0] = f0 - 1.2
    p[o("mixed"):o("mixed") + 6] = [DPI1, EPSG, Q, 0.0, 0.0, 0.0]
    p[o("rot"):o("rot") + 3] = [0.05, 0.4, 0.0]
    p[o("widths"):o("widths") + n0] = 0.15
    p[o("noise"):o("noise") + 4] = [20.0, 0.05, 2.0, 0.1]
    p[o("inclination")] = np.deg2rad(60.0)
    p[o("mix_hfact"):o("mix_hfact") + lay.size("mix_hfact")] = 1.0
    p[o("mix_wfact"):o("mix_wfact") + lay.size("mix_wfact")] = 1.0
    # mix_fshift already 0
    return p


@pytest.mark.slow
class TestPerturbedForestRecovery:
    def test_recovers_scatter_and_height_factor(self):
        n0 = 5
        n_p, n_g = count_poles(DNU, DPI1, 0.4, EPSG, NUMIN, NUMAX)
        spec_obj = RGBAsymptSpec(n_orders=n0, numin=NUMIN, numax_win=NUMAX,
                                 n_p_poles=n_p, n_g_poles=n_g, n_harvey=1,
                                 per_mode="hw_scatter")
        fn, lay = build_model(
            "model_RGB_asympt_a1etaa3_HarveyLike_v3", spec_obj)
        truth = _base_params(lay, n0)

        # choose VALID mixed modes to perturb.  The scatter target must be
        # a p-DOMINATED (small-zeta, wide) mode displaced by ~1 linewidth:
        # displacing a narrow g-dominated mode by many linewidths creates a
        # likelihood desert no local sampler crosses (first cut of this
        # test did exactly that and the scatter pinned at 0) — and real
        # forest irregularity is at the linewidth scale anyway.
        f1, zeta, valid = jax.jit(
            lambda: mixed_mode_frequencies(
                DNU, 0.4, DPI1, EPSG, Q, NUMIN, NUMAX, n_p, n_g))()
        zeta_np = np.asarray(zeta)
        vi = np.nonzero(np.asarray(valid) > 0)[0]
        m_a = int(vi[np.argmin(zeta_np[vi])])       # widest mixed mode
        width_a = 0.15 * (1.0 - zeta_np[m_a])
        others = [i for i in vi if i != m_a]
        m_b = int(others[len(others) // 2])
        fs_o, hf_o = lay.offset("mix_fshift"), lay.offset("mix_hfact")
        shift_a = float(1.2 * width_a)              # ~1 linewidth off
        truth[fs_o + m_a] = shift_a
        truth[hf_o + m_b] = 2.5           # an anomalously tall mixed mode

        nu = jnp.linspace(NUMIN + 2.0, NUMAX - 2.0, 20000)
        clean = np.asarray(jax.jit(fn)(jnp.asarray(truth), nu))
        noise = np.asarray(jax.random.exponential(
            jax.random.PRNGKey(0), clean.shape))
        data = jnp.asarray(clean * noise, jnp.float32)

        # free ONLY the three perturbed-entry candidates; everything else
        # fixed at truth (the surgical workflow: free the deviant modes)
        rows = []
        for i in range(lay.ndim):
            if i == fs_o + m_a:
                rows.append((f"p{i}", "uniform", -1.2, 1.2))
            elif i == hf_o + m_b:
                rows.append((f"p{i}", "uniform", 0.2, 6.0))
            elif i == fs_o + m_b:          # a control: truly zero scatter
                rows.append((f"p{i}", "uniform", -1.2, 1.2))
            else:
                rows.append((f"p{i}", "fix"))
        priors = PriorTable.from_rows(rows)

        start = truth.copy()               # start from the CLEAN relation
        start[fs_o + m_a] = 0.0
        start[hf_o + m_b] = 1.0
        problem = Problem(model_fn=fn, layout=lay, priors=priors,
                          nu=nu, spec=data,
                          params0=jnp.asarray(start))
        from tamcmc_tpu.sampler.state import MALAHyper
        hp = MALAHyper(use_drift=True)
        T, C = 3, 6
        betas = make_beta_ladder(T, hp.lambda_temp)
        key = jax.random.PRNGKey(2)
        key, sub = jax.random.split(key)
        state = init_state(problem, hp, T, C, sub)
        plan = PhasePlan(burnin=200, learning=800, acquire=1200, thin=4,
                         chunk=100)
        state, results = run_phases(problem, hp, betas, state, key, plan)
        th = results["A"]["theta0"].reshape(-1, problem.ndim_free)
        med = np.median(th, axis=0)
        by = dict(zip(problem.free_names, med))
        tol = max(0.5 * shift_a, 0.05)
        assert abs(by[f"p{fs_o + m_a}"] - shift_a) < tol, (by, shift_a)
        assert abs(by[f"p{fs_o + m_b}"] - 0.0) < tol, (by, shift_a)
        assert abs(by[f"p{hf_o + m_b}"] - 2.5) / 2.5 < 0.35, by
