"""Alm activity-perturbation tests: quadrature limits, symmetry, physics
pattern, differentiability, ajAlm model integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tamcmc_tpu.ops.alm import alm, alm_shifts, activity_filter, _plm2, _THETA


class TestKernels:
    @pytest.mark.parametrize("l", [1, 2, 3])
    def test_kernel_normalisation_ratios(self, l):
        """int |Y_lm|^2 sin dtheta is m-independent after the factorial
        normalisation (all m share the same total over the sphere)."""
        x = np.cos(_THETA)
        w = np.sin(_THETA)
        from tamcmc_tpu.ops.alm import _W_TH
        tots = []
        for m in range(0, l + 1):
            k = np.asarray(_plm2(l, m, jnp.asarray(x)))
            tots.append(np.sum(_W_TH * k * w))
        np.testing.assert_allclose(tots, tots[0], rtol=1e-6)


class TestAlm:
    def test_full_sphere_filter_gives_one(self):
        # delta wide enough to cover all latitudes -> A_lm ~ 1
        for l in (1, 2):
            for m in range(-l, l + 1):
                a = float(alm(l, m, 0.0, np.pi * 2, kind="triangle"))
                assert a == pytest.approx(1.0, abs=0.02), (l, m, a)

    def test_m_symmetry(self):
        a_p = float(alm(2, 1, 0.35, 0.2))
        a_m = float(alm(2, -1, 0.35, 0.2))
        assert a_p == pytest.approx(a_m, rel=1e-6)

    def test_equatorial_band_pattern_l1(self):
        """Equatorial activity: |Y_1,+-1|^2 peaks at the equator, |Y_10|^2
        vanishes there -> A_11 >> A_10."""
        a11 = float(alm(1, 1, 0.0, 0.3))
        a10 = float(alm(1, 0, 0.0, 0.3))
        assert a11 > 5 * a10

    def test_polar_band_pattern_l1(self):
        """Polar activity reverses the pattern."""
        a11 = float(alm(1, 1, np.deg2rad(75), 0.3))
        a10 = float(alm(1, 0, np.deg2rad(75), 0.3))
        assert a10 > a11

    def test_range(self):
        for th0 in (0.0, 0.5, 1.2):
            for l in (1, 2, 3):
                for m in range(-l, l + 1):
                    a = float(alm(l, m, th0, 0.4))
                    assert 0.0 <= a <= 1.0

    def test_differentiable_in_theta0_delta(self):
        g = jax.grad(lambda t: alm(2, 2, t, 0.3))(0.4)
        h = jax.grad(lambda d: alm(2, 2, 0.4, d))(0.3)
        assert np.isfinite(float(g)) and np.isfinite(float(h))
        assert abs(float(h)) > 0  # widening the band changes the average

    def test_shift_scaling(self):
        s = np.asarray(alm_shifts(1, 3000.0, 5e-4, 0.0, 0.3))
        assert s.shape == (3,)
        assert np.all(s >= 0) and s.max() < 3000.0 * 5e-4 + 1e-9


class TestFilters:
    def test_gate_vs_triangle_support(self):
        th = jnp.asarray(_THETA, dtype=jnp.float32)
        g = np.asarray(activity_filter(th, 0.3, 0.2, kind="gate"))
        t = np.asarray(activity_filter(th, 0.3, 0.2, kind="triangle"))
        # gate plateau ~1; triangle peak lands between quadrature nodes
        assert g.max() > 0.9 and t.max() > 0.7
        # both vanish far from the bands (e.g. at the poles)
        assert g[0] < 1e-3 and t[0] < 1e-3

    def test_gauss_band(self):
        th = jnp.asarray(_THETA, dtype=jnp.float32)
        f = np.asarray(activity_filter(th, 0.3, 0.2, kind="gauss"))
        lat = np.pi / 2 - np.asarray(_THETA)
        # peaks at the band centers in both hemispheres, decays at poles
        assert f[np.argmin(np.abs(lat - 0.3))] > 0.9
        assert f[np.argmin(np.abs(lat + 0.3))] > 0.9
        assert f[0] < 1e-3
        # FWHM convention: half max at lat = theta0 +- delta/2
        i_half = np.argmin(np.abs(lat - 0.4))
        assert 0.3 < f[i_half] < 0.7

    def test_gauss_alm_differentiable_and_bounded(self):
        a = float(alm(2, 1, 0.35, 0.25, kind="gauss"))
        assert 0.0 <= a <= 1.0
        g = jax.grad(lambda t: alm(2, 1, t, 0.25, kind="gauss"))(0.35)
        assert np.isfinite(float(g)) and abs(float(g)) > 0


class TestAjAlmModel:
    def test_build_and_shift_direction(self):
        from tamcmc_tpu.models import build_model
        from tamcmc_tpu.models.ms_global import MSGlobalSpec
        spec = MSGlobalSpec(n_per_l=(2, 2, 0, 0), rotation="ajAlm")
        fn, layout = build_model("model_MS_Global_ajAlm_HarveyLike",
                                 MSGlobalSpec(n_per_l=(2, 2, 0, 0)))
        p = np.zeros(layout.ndim, dtype=np.float32)
        p[layout.offset("heights"):layout.offset("heights") + 2] = 5.0
        p[layout.offset("visibilities")] = 1.5
        p[layout.offset("freq_l0"):layout.offset("freq_l0") + 2] = [2000.0, 2100.0]
        p[layout.offset("freq_l1"):layout.offset("freq_l1") + 2] = [2050.0, 2150.0]
        ro = layout.offset("rot")
        p[ro:ro + 8] = [0.5, 0.0, 0.0, 0.0, 1e-3, 0.0, 0.3, 0.0]
        p[layout.offset("widths"):layout.offset("widths") + 2] = 1.0
        no = layout.offset("noise")
        p[no:no + 10] = [-1, -1, 2, -1, -1, 2, -1, -1, 2, 0.3]
        p[layout.offset("inclination")] = np.deg2rad(90.0)
        nu = jnp.linspace(1980.0, 2180.0, 8192)
        m = np.asarray(jax.jit(fn)(jnp.asarray(p), nu))
        assert np.all(np.isfinite(m)) and m.max() > 4.0

    def test_grad_through_activity(self):
        from tamcmc_tpu.models import build_model
        from tamcmc_tpu.models.ms_global import MSGlobalSpec
        fn, layout = build_model("model_MS_Global_ajAlm_HarveyLike",
                                 MSGlobalSpec(n_per_l=(2, 2, 0, 0)))
        p = jnp.asarray(np.random.default_rng(0).uniform(0.5, 1.0,
                                                         layout.ndim),
                        jnp.float32)
        p = p.at[layout.offset("freq_l0"):layout.offset("freq_l0") + 2].set(
            jnp.asarray([2000.0, 2100.0]))
        p = p.at[layout.offset("freq_l1"):layout.offset("freq_l1") + 2].set(
            jnp.asarray([2050.0, 2150.0]))
        nu = jnp.linspace(1980.0, 2180.0, 1024)
        g = jax.grad(lambda q: jnp.sum(fn(q, nu)))(p)
        assert np.all(np.isfinite(np.asarray(g)))
