"""ajfit family: a-coefficient table fit (io_ajfit / model_ajfit [U]).

Unit tests pin the model to its closed form (Ritzwoller-Lavely splitting +
Alm activity shift), the assembler's physicality constraints, and an
end-to-end sampled recovery of a1 and the activity latitude from a
synthetic nu_nlm table.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tamcmc_tpu.models import build_model
from tamcmc_tpu.models.ajfit import AjFitSpec
from tamcmc_tpu.ops.rotation import rl_polynomials
from tamcmc_tpu.ops.alm import alm
from tamcmc_tpu.stats.assemblers import build_family_constraints
from tamcmc_tpu.stats.priors import NEG_BIG


class TestAjFitModel:
    def test_shape_and_ordering(self):
        spec = AjFitSpec(l_per_multiplet=(1, 2, 3), include_activity=False)
        fn, layout = build_model("model_ajfit", spec)
        assert layout.ndim == 3 + 6
        p = jnp.zeros(layout.ndim).at[0].set(100.0).at[1].set(200.0) \
            .at[2].set(300.0)
        out = fn(p, None)
        assert out.shape == (spec.n_points,) == (3 + 5 + 7,)
        # zero aj: every m-component equals its multiplet's nu_nl
        np.testing.assert_allclose(np.asarray(out[:3]), 100.0)
        np.testing.assert_allclose(np.asarray(out[3:8]), 200.0)
        np.testing.assert_allclose(np.asarray(out[8:]), 300.0)

    def test_a1_only_splitting_is_m_a1(self):
        spec = AjFitSpec(l_per_multiplet=(1, 2), include_activity=False)
        fn, layout = build_model("model_ajfit", spec)
        a1 = 0.7
        p = jnp.asarray([1000.0, 2000.0, a1, 0, 0, 0, 0, 0])
        out = np.asarray(fn(p, None))
        # P_1(m) = m exactly
        np.testing.assert_allclose(out[:3], 1000.0 + a1 * np.arange(-1, 2),
                                   rtol=1e-6)
        np.testing.assert_allclose(out[3:], 2000.0 + a1 * np.arange(-2, 3),
                                   rtol=1e-6)

    def test_full_aj_matches_polynomial_table(self):
        spec = AjFitSpec(l_per_multiplet=(2,), include_activity=False)
        fn, layout = build_model("model_ajfit", spec)
        aj = np.asarray([0.5, 0.1, 0.05, 0.02, 0.01, 0.005])
        p = jnp.asarray(np.concatenate([[1500.0], aj]), jnp.float32)
        out = np.asarray(fn(p, None))
        polys = rl_polynomials(2, 6)                      # (6, 5)
        expect = 1500.0 + aj @ polys
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_activity_shift_matches_alm(self):
        spec = AjFitSpec(l_per_multiplet=(1,), include_activity=True)
        fn, layout = build_model("model_ajfit", spec)
        eps, th0, dl = 1e-3, np.deg2rad(30.0), np.deg2rad(10.0)
        nu0 = 3000.0
        p = jnp.asarray([nu0, 0, 0, 0, 0, 0, 0, eps, th0, dl], jnp.float32)
        out = np.asarray(fn(p, None))
        expect = nu0 + eps * nu0 * np.asarray(
            [float(alm(1, m, th0, dl)) for m in (-1, 0, 1)])
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_gradients_flow_through_all_blocks(self):
        spec = AjFitSpec(l_per_multiplet=(1, 2))
        fn, layout = build_model("model_ajfit", spec)
        p = jnp.asarray([1000.0, 2000.0, 0.5, 0.02, 0.01, 0.0, 0.0, 0.0,
                         1e-3, 0.5, 0.2], jnp.float32)
        g = jax.grad(lambda q: jnp.sum(fn(q, None) ** 2))(p)
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        # nu_nl, a1, epsilon, theta0 all carry signal
        for i in (0, 1, 2, 8, 9):
            assert abs(g[i]) > 0, (i, g)

    def test_registry_lists_ajfit(self):
        from tamcmc_tpu.models.registry import list_models
        assert "model_ajfit" in list_models()


class TestAjFitConstraints:
    def test_crossed_centroids_rejected(self):
        spec = AjFitSpec(l_per_multiplet=(1, 1))
        fn, layout = build_model("model_ajfit", spec)
        extra = build_family_constraints("model_ajfit", layout)
        ok = jnp.zeros(layout.ndim).at[0].set(100.0).at[1].set(200.0) \
            .at[layout.offset("activity") + 2].set(0.1)
        bad = ok.at[0].set(300.0)
        assert float(extra(ok)) == 0.0
        assert float(extra(bad)) <= NEG_BIG / 2

    def test_unphysical_activity_rejected(self):
        spec = AjFitSpec(l_per_multiplet=(1, 1))
        _, layout = build_model("model_ajfit", spec)
        extra = build_family_constraints("model_ajfit", layout)
        base = jnp.zeros(layout.ndim).at[0].set(100.0).at[1].set(200.0) \
            .at[layout.offset("activity") + 2].set(0.1)
        o = layout.offset("activity")
        assert float(extra(base.at[o].set(-1e-3))) <= NEG_BIG / 2
        assert float(extra(base.at[o + 1].set(2.0))) <= NEG_BIG / 2
        assert float(extra(base.at[o + 2].set(0.0))) <= NEG_BIG / 2


@pytest.mark.slow
class TestAjFitE2E:
    def test_recovers_a1_and_activity_latitude(self):
        from tamcmc_tpu.demos import make_demo
        from tamcmc_tpu.sampler import init_state, make_beta_ladder, \
            run_phases
        from tamcmc_tpu.sampler.driver import PhasePlan

        problem, hp, plan, meta = make_demo("ajfit", seed=3)
        truth = meta["truth"]
        layout = problem.layout
        plan = PhasePlan(burnin=500, learning=2000, acquire=3000, thin=4)
        betas = make_beta_ladder(4, hp.lambda_temp)
        key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        state = init_state(problem, hp, 4, 8, sub)
        state, results = run_phases(problem, hp, betas, state, key, plan)
        th = np.asarray(results["A"]["theta0"])
        th = th.reshape(-1, th.shape[-1])
        med = np.median(th, axis=0)
        std = np.std(th, axis=0)

        def fidx(full_i):
            w = np.nonzero(problem.free_idx == full_i)[0]
            assert w.size == 1
            return int(w[0])

        ao = layout.offset("aj")
        i_a1 = fidx(ao)
        assert abs(med[i_a1] - truth[ao]) < max(5 * std[i_a1], 0.05), \
            (med[i_a1], truth[ao], std[i_a1])
        # nuisance centroids recovered to the data precision
        for k in range(layout.size("nu_nl")):
            i = fidx(layout.offset("nu_nl") + k)
            assert abs(med[i] - truth[k]) < max(5 * std[i], 0.1)
        assert np.all(np.isfinite(np.asarray(results["A"]["logL"])))
        acc = float(np.asarray(state.acc_rate)[0].mean())
        assert 0.05 < acc < 0.95
