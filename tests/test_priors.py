"""Unit tests: prior table vs closed forms."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tamcmc_tpu.stats.priors import PriorTable, PriorKind, NEG_BIG


def table(rows):
    return PriorTable.from_rows(rows)


class TestPriorKinds:
    def test_uniform(self):
        t = table([("x", "uniform", 0.0, 2.0)])
        assert float(t.log_prior(jnp.asarray([1.0]))) == pytest.approx(-np.log(2.0))
        assert float(t.log_prior(jnp.asarray([3.0]))) <= NEG_BIG / 2

    def test_gaussian(self):
        t = table([("x", "gaussian", 1.0, 0.5)])
        want = -0.5 * ((2.0 - 1.0) / 0.5) ** 2 - np.log(0.5 * np.sqrt(2 * np.pi))
        assert float(t.log_prior(jnp.asarray([2.0]))) == pytest.approx(want, rel=1e-5)

    def test_jeffreys_normalised(self):
        # integral of 1/((x+knee) ln(1+hi/knee)) over [0,hi] == 1
        knee, hi = 0.1, 10.0
        t = table([("x", "jeffreys", knee, hi)])
        xs = np.linspace(1e-4, hi - 1e-4, 20001)
        ps = np.exp([float(t.log_prior(jnp.asarray([float(x)]))) for x in xs[::500]])
        # spot-check density formula instead of full quadrature
        x0 = 1.0
        want = 1.0 / ((x0 + knee) * np.log(1 + hi / knee))
        got = np.exp(float(t.log_prior(jnp.asarray([x0]))))
        assert got == pytest.approx(want, rel=1e-4)
        assert np.all(np.isfinite(ps))

    def test_uniform_gaussian_continuous_at_edge(self):
        t = table([("x", "uniform_gaussian", 0.0, 1.0, 0.2)])
        inside = float(t.log_prior(jnp.asarray([0.999999])))
        edge = float(t.log_prior(jnp.asarray([1.000001])))
        assert inside == pytest.approx(edge, abs=1e-3)

    def test_gug_shape(self):
        t = table([("x", "gug", 0.0, 1.0, 0.1, 0.3)])
        mid = float(t.log_prior(jnp.asarray([0.5])))
        below = float(t.log_prior(jnp.asarray([-0.2])))
        above = float(t.log_prior(jnp.asarray([1.2])))
        assert mid > below and mid > above
        # asymmetric tails: sigma_hi wider -> higher logp at same distance
        assert above > below

    def test_fix_contributes_zero(self):
        t = table([("x", "fix"), ("y", "uniform", 0.0, 1.0)])
        got = float(t.log_prior(jnp.asarray([123.0, 0.5])))
        assert got == pytest.approx(0.0, abs=1e-6)  # -log(1) = 0

    def test_free_mask(self):
        t = table([("a", "fix"), ("b", "uniform", 0, 1), ("c", "auto"),
                   ("d", "gaussian", 0, 1)])
        np.testing.assert_array_equal(t.free_mask, [False, True, False, True])

    def test_gradient_finite_everywhere(self):
        t = table([("a", "uniform", 0, 1), ("b", "gaussian", 0, 1),
                   ("c", "jeffreys", 0.1, 10), ("d", "gug", 0, 1, 0.1, 0.1)])
        for x in ([0.5, 0.0, 1.0, 0.5], [2.0, 5.0, -3.0, 9.0]):
            g = jax.grad(t.log_prior)(jnp.asarray(x, dtype=jnp.float32))
            assert np.all(np.isfinite(np.asarray(g)))

    def test_vmap_over_chains(self):
        t = table([("a", "uniform", 0, 1), ("b", "gaussian", 0, 1)])
        thetas = jnp.asarray([[0.5, 0.0], [0.2, 1.0], [5.0, 0.0]])
        out = jax.vmap(t.log_prior)(thetas)
        assert out.shape == (3,)
        assert float(out[2]) <= NEG_BIG / 2
