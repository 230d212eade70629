"""Unit tests: model library (L2) — shapes, physics sanity, differentiability,
vmap-over-chains batching."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tamcmc_tpu.models import build_model, list_models
from tamcmc_tpu.models.ms_global import MSGlobalSpec
from tamcmc_tpu.models.local import MSLocalSpec
from tamcmc_tpu.utils.blocks import BlockLayout


def make_ms_global_params(layout, n_per_l, seed=0):
    rng = np.random.default_rng(seed)
    p = np.zeros(layout.ndim, dtype=np.float64)
    n0 = n_per_l[0]
    f0 = np.linspace(2000.0, 2000.0 + 100.0 * (n0 - 1), n0)
    lay = dict(zip(layout.names, layout.sizes))
    p[layout.offset("heights"):layout.offset("heights") + n0] = rng.uniform(3, 8, n0)
    vis_sz = layout.size("visibilities")
    p[layout.offset("visibilities"):layout.offset("visibilities") + vis_sz] = \
        [1.5, 0.53, 0.07][:vis_sz]
    for l in range(4):
        nl = layout.size(f"freq_l{l}")
        if nl == 0:
            continue
        # standard asymptotic offsets: l=1 at +Dnu/2, l=2 at -small sep
        off = {0: 0.0, 1: 50.0, 2: -8.0, 3: 42.0}[l]
        p[layout.offset(f"freq_l{l}"):layout.offset(f"freq_l{l}") + nl] = \
            (f0[:nl] + off)
    ro = layout.offset("rot")
    if layout.size("rot") == 4:
        p[ro:ro + 4] = [1.0, 1.0, 0.01, 0.02]       # a1, eta_sw, a3, asym
    else:
        p[ro:ro + 8] = [1.0, 0, 0.01, 0, 0, 0, 1.0, 0.02]
    p[layout.offset("widths"):layout.offset("widths") + n0] = rng.uniform(1, 3, n0)
    p[layout.offset("noise"):layout.offset("noise") + layout.size("noise")] = \
        [10.0, 5e-4, 4.0, 3.0, 2e-4, 2.0, -1, -1, 2.0, 0.4]
    p[layout.offset("inclination")] = np.deg2rad(45.0)
    p[layout.offset("trunc")] = 40.0
    return jnp.asarray(p, dtype=jnp.float32)


class TestBlockLayout:
    def test_offsets_and_names(self):
        lay = BlockLayout.make([("a", 2), ("b", 1), ("c", 3)])
        assert lay.ndim == 6
        assert lay.offset("c") == 3
        assert lay.param_names() == ["a_0", "a_1", "b", "c_0", "c_1", "c_2"]

    def test_get_slices_batched(self):
        lay = BlockLayout.make([("a", 2), ("b", 1)])
        x = jnp.arange(12.0).reshape(4, 3)
        np.testing.assert_array_equal(np.asarray(lay.get(x, "b")),
                                      np.asarray(x[:, 2:3]))


class TestRegistry:
    def test_lists_reference_families(self):
        names = list_models()
        assert "model_MS_Global_a1etaa3_HarveyLike" in names
        assert "model_Test_Gaussian" in names

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            build_model("model_not_a_thing")


class TestMSGlobal:
    spec = MSGlobalSpec(n_per_l=(3, 3, 3, 0))

    def test_spectrum_positive_and_peaky(self):
        fn, layout = build_model("model_MS_Global_a1etaa3_HarveyLike", self.spec)
        p = make_ms_global_params(layout, self.spec.n_per_l)
        nu = jnp.linspace(1900.0, 2350.0, 2048)
        m = np.asarray(jax.jit(fn)(p, nu))
        assert np.all(m > 0)
        # peak near each l=0 frequency
        for f in (2000.0, 2100.0, 2200.0):
            i = np.argmin(np.abs(np.asarray(nu) - f))
            assert m[i] > 3.0  # height >> background

    def test_visibility_scaling_of_l1(self):
        fn, layout = build_model("model_MS_Global_a1etaa3_HarveyLike", self.spec)
        p = make_ms_global_params(layout, self.spec.n_per_l)
        nu = jnp.linspace(2040.0, 2060.0, 512)
        m1 = np.asarray(fn(p, nu)).max()
        p2 = p.at[layout.offset("visibilities")].set(0.0)  # kill l=1
        m2 = np.asarray(fn(p2, nu)).max()
        # killing V^2_l1 removes the l=1 peak; l=0 wings remain underneath
        assert m1 > m2 + 2.0

    def test_grad_finite_wrt_all_params(self):
        fn, layout = build_model("model_MS_Global_a1etaa3_HarveyLike", self.spec)
        p = make_ms_global_params(layout, self.spec.n_per_l)
        nu = jnp.linspace(1900.0, 2350.0, 512)
        g = jax.grad(lambda q: jnp.sum(fn(q, nu)))(p)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_vmap_over_chains(self):
        fn, layout = build_model("model_MS_Global_a1etaa3_HarveyLike", self.spec)
        p = make_ms_global_params(layout, self.spec.n_per_l)
        batch = jnp.stack([p, p * 1.01, p * 0.99])
        nu = jnp.linspace(1900.0, 2350.0, 256)
        out = jax.vmap(lambda q: fn(q, nu))(batch)
        assert out.shape == (3, 256)

    def test_aj_family_consistent_with_a1etaa3(self):
        """a1-only aj model == a1etaa3 with a3=0, same eta switch."""
        fn_a, lay_a = build_model("model_MS_Global_a1etaa3_HarveyLike", self.spec)
        fn_j, lay_j = build_model("model_MS_Global_aj_HarveyLike", self.spec)
        pa = make_ms_global_params(lay_a, self.spec.n_per_l)
        ra = lay_a.offset("rot")
        pa = pa.at[ra + 2].set(0.0).at[ra + 3].set(0.0)  # a3=0, asym=0
        pj = make_ms_global_params(lay_j, self.spec.n_per_l)
        rj = lay_j.offset("rot")
        pj = pj.at[rj:rj + 8].set(jnp.asarray([1.0, 0, 0, 0, 0, 0, 1.0, 0.0]))
        nu = jnp.linspace(1900.0, 2350.0, 1024)
        np.testing.assert_allclose(np.asarray(fn_a(pa, nu)),
                                   np.asarray(fn_j(pj, nu)), rtol=2e-4)


class TestA1Variants:
    """Per-degree / per-order splitting families (reference a1l/a1n/a1nl)."""
    spec = MSGlobalSpec(n_per_l=(3, 3, 3, 0))
    nu = jnp.linspace(1900.0, 2350.0, 2048)

    def _equal_a1_params(self, name, a1=1.0):
        fn, lay = build_model(name, self.spec)
        p = make_ms_global_params(lay, self.spec.n_per_l)
        ro, rs = lay.offset("rot"), lay.size("rot")
        n0 = self.spec.n_per_l[0]
        if name.endswith("a1l_etaa3_HarveyLike"):
            rot = [a1, a1, 1.0, 0.01, 0.02]
        elif name.endswith("a1n_etaa3_HarveyLike"):
            rot = [a1] * n0 + [1.0, 0.01, 0.02]
        elif name.endswith("a1nl_etaa3_HarveyLike"):
            rot = [a1] * (2 * n0) + [1.0, 0.01, 0.02]
        else:
            rot = [a1, 1.0, 0.01, 0.02]
        assert len(rot) == rs, (name, len(rot), rs)
        p = p.at[ro:ro + rs].set(jnp.asarray(rot, jnp.float32))
        return fn, lay, p

    @pytest.mark.parametrize("name", [
        "model_MS_Global_a1l_etaa3_HarveyLike",
        "model_MS_Global_a1n_etaa3_HarveyLike",
        "model_MS_Global_a1nl_etaa3_HarveyLike",
        "model_MS_Global_a1etaa3_HarveyLike_Classic",
    ])
    def test_collapses_to_a1etaa3_when_uniform(self, name):
        """With every splitting entry equal, all families reduce to the
        shared-a1 model."""
        fn_ref, lay_ref, p_ref = self._equal_a1_params(
            "model_MS_Global_a1etaa3_HarveyLike")
        fn, lay, p = self._equal_a1_params(name)
        np.testing.assert_allclose(np.asarray(fn(p, self.nu)),
                                   np.asarray(fn_ref(p_ref, self.nu)),
                                   rtol=2e-4, atol=1e-5)

    def test_a1l_splits_degrees_independently(self):
        fn, lay, p = self._equal_a1_params(
            "model_MS_Global_a1l_etaa3_HarveyLike")
        ro = lay.offset("rot")
        p2 = p.at[ro + 1].set(2.5)          # change only a1(l=2)
        m1 = np.asarray(fn(p, self.nu))
        m2 = np.asarray(fn(p2, self.nu))
        # l=1 region (near +50 uHz offsets) unchanged; l=2 region changes
        f0 = 2000.0
        l1_bins = np.abs(np.asarray(self.nu) - (f0 + 50.0)) < 5.0
        l2_bins = np.abs(np.asarray(self.nu) - (f0 - 8.0)) < 5.0
        np.testing.assert_allclose(m1[l1_bins], m2[l1_bins], rtol=1e-5)
        assert np.max(np.abs(m1[l2_bins] - m2[l2_bins])) > 1e-3

    def test_a1n_splits_orders_independently(self):
        fn, lay, p = self._equal_a1_params(
            "model_MS_Global_a1n_etaa3_HarveyLike")
        ro = lay.offset("rot")
        p2 = p.at[ro + 0].set(3.0)          # change a1 of the first order only
        m1 = np.asarray(fn(p, self.nu))
        m2 = np.asarray(fn(p2, self.nu))
        # last order's l=1 multiplet untouched
        lastl1 = np.abs(np.asarray(self.nu) - (2200.0 + 50.0)) < 5.0
        firstl1 = np.abs(np.asarray(self.nu) - (2000.0 + 50.0)) < 5.0
        np.testing.assert_allclose(m1[lastl1], m2[lastl1], rtol=1e-5)
        assert np.max(np.abs(m1[firstl1] - m2[firstl1])) > 1e-3

    def test_harvey1985_variant_differs_only_in_background(self):
        fn_a, lay = build_model("model_MS_Global_a1etaa3_HarveyLike",
                                self.spec)
        fn_b, _ = build_model("model_MS_Global_a1etaa3_Harvey1985", self.spec)
        p = make_ms_global_params(lay, self.spec.n_per_l)
        ma, mb = np.asarray(fn_a(p, self.nu)), np.asarray(fn_b(p, self.nu))
        assert ma.shape == mb.shape and np.all(mb > 0)
        assert np.max(np.abs(ma - mb)) > 1e-6   # different noise law

    def test_grad_finite_all_variants(self):
        for name in ("model_MS_Global_a1l_etaa3_HarveyLike",
                     "model_MS_Global_a1n_etaa3_HarveyLike",
                     "model_MS_Global_a1nl_etaa3_HarveyLike"):
            fn, lay, p = self._equal_a1_params(name)
            g = jax.grad(lambda q: jnp.sum(fn(q, self.nu)))(p)
            assert np.all(np.isfinite(np.asarray(g))), name


class TestMSLocal:
    def test_local_modes(self):
        spec = MSLocalSpec(n_per_l=(1, 1, 0, 0))
        fn, layout = build_model("model_MS_local_basic", spec)
        p = np.zeros(layout.ndim, dtype=np.float32)
        p[layout.offset("height_l0")] = 5.0
        p[layout.offset("height_l1")] = 4.0
        p[layout.offset("freq_l0")] = 2000.0
        p[layout.offset("freq_l1")] = 2050.0
        p[layout.offset("width_l0")] = 1.0
        p[layout.offset("width_l1")] = 1.0
        p[layout.offset("rot")] = 0.8          # a1
        p[layout.offset("noise")] = 0.3
        p[layout.offset("inclination")] = np.deg2rad(90.0)
        nu = jnp.linspace(1990.0, 2060.0, 4096)
        m = np.asarray(fn(jnp.asarray(p), nu))
        i0 = np.argmin(np.abs(np.asarray(nu) - 2000.0))
        assert m[i0] == pytest.approx(5.3, rel=0.01)
        # i=90deg: l=1 m=0 invisible, +-1 split by a1
        ip = np.argmin(np.abs(np.asarray(nu) - 2050.8))
        im = np.argmin(np.abs(np.asarray(nu) - 2050.0))
        assert m[ip] > m[im]


class TestSmokeModels:
    def test_single_lorentzian(self):
        fn, layout = build_model("model_Single_Lorentzian")
        p = jnp.asarray([10.0, 500.0, 2.0, 1.0])
        nu = jnp.linspace(490.0, 510.0, 101)
        m = np.asarray(fn(p, nu))
        assert m.max() == pytest.approx(11.0, rel=1e-3)
        assert m[0] < 1.2

    def test_harvey_gaussian(self):
        fn, layout = build_model("model_Harvey_Gaussian")
        p = jnp.asarray([100.0, 0.01, 2.0, 0.5, 10.0, 300.0, 30.0])
        nu = jnp.linspace(1.0, 600.0, 600)
        m = np.asarray(fn(p, nu))
        i = np.argmin(np.abs(np.asarray(nu) - 300.0))
        assert m[i] > 10.0  # bump on top of background

    def test_harvey_background(self):
        fn, layout = build_model("model_Harvey_Background")
        assert layout.ndim == 10


class TestAppWidthAndA1A2A3:
    """New-in-round families: Appourchaux+2016 width relation and direct-a2
    splitting (reference model_MS_Global_*_AppWidth_* / _a1a2a3_* [U])."""
    spec = MSGlobalSpec(n_per_l=(3, 3, 3, 0))
    nu = jnp.linspace(1900.0, 2350.0, 2048)

    def test_appwidth_layout_has_6_width_params(self):
        fn, lay = build_model("model_MS_Global_a1etaa3_AppWidth_HarveyLike",
                              self.spec)
        assert lay.size("widths") == 6
        # free-width layout for the same star has N0 widths
        _, lay_free = build_model("model_MS_Global_a1etaa3_HarveyLike",
                                  self.spec)
        assert lay_free.size("widths") == 3

    def _appwidth_params(self, lay):
        # start from the free-width template offsets, then fill the 6-wide
        # relation block: numax, alpha, Gamma_alpha, dGamma_dip, nu_dip, W_dip
        p = np.zeros(lay.ndim, dtype=np.float32)
        rng = np.random.default_rng(0)
        n0 = 3
        f0 = np.array([2000.0, 2100.0, 2200.0])
        p[lay.offset("heights"):lay.offset("heights") + n0] = rng.uniform(3, 8, n0)
        p[lay.offset("visibilities"):lay.offset("visibilities") + 3] = \
            [1.5, 0.53, 0.07]
        for l, off in ((0, 0.0), (1, 50.0), (2, -8.0)):
            p[lay.offset(f"freq_l{l}"):lay.offset(f"freq_l{l}") + n0] = f0 + off
        p[lay.offset("rot"):lay.offset("rot") + 4] = [1.0, 1.0, 0.01, 0.02]
        p[lay.offset("widths"):lay.offset("widths") + 6] = \
            [2100.0, 4.0, 2.0, 3.0, 2100.0, 4000.0]
        p[lay.offset("noise"):lay.offset("noise") + lay.size("noise")] = \
            [10.0, 5e-4, 4.0, 3.0, 2e-4, 2.0, -1, -1, 2.0, 0.4]
        p[lay.offset("inclination")] = np.deg2rad(45.0)
        p[lay.offset("trunc")] = 40.0
        return jnp.asarray(p)

    def test_appwidth_spectrum_and_grad(self):
        fn, lay = build_model("model_MS_Global_a1etaa3_AppWidth_HarveyLike",
                              self.spec)
        p = self._appwidth_params(lay)
        m = np.asarray(jax.jit(fn)(p, self.nu))
        assert np.all(np.isfinite(m)) and np.all(m > 0)
        # Peaks survive the width relation.  The dip narrows the modes below
        # the grid spacing, so probe exact centers vs off-resonance points
        # instead of nearest grid bins.
        centers = jnp.asarray([2000.0, 2100.0, 2200.0])
        m_on = np.asarray(fn(p, centers))
        m_off = np.asarray(fn(p, centers + 20.0))
        assert np.all(m_on > m_off + 2.0)   # mode height >> local background
        g = jax.grad(lambda q: jnp.sum(fn(q, self.nu)))(p)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_appwidth_dip_suppresses_width(self):
        from tamcmc_tpu.ops.widths import appourchaux2016_width
        nu = jnp.asarray([1500.0, 2100.0, 2800.0])
        # no dip (dGamma_dip=1): pure power law
        w0 = np.asarray(appourchaux2016_width(nu, 2100.0, 4.0, 2.0,
                                              1.0, 2100.0, 4000.0))
        np.testing.assert_allclose(
            w0, 2.0 * (np.asarray(nu) / 2100.0) ** 4.0, rtol=1e-5)
        # dip of depth 3 at nu_dip=2100: width there reduced by exactly 3
        w1 = np.asarray(appourchaux2016_width(nu, 2100.0, 4.0, 2.0,
                                              3.0, 2100.0, 4000.0))
        assert w1[1] == pytest.approx(w0[1] / 3.0, rel=1e-5)
        assert w1[0] > w1[1] * 0.9 / 3.0    # dip localized: wings less affected

    def test_a1a2a3_matches_aj_with_truncated_coeffs(self):
        fn_a, lay_a = build_model("model_MS_Global_a1a2a3_HarveyLike", self.spec)
        fn_j, lay_j = build_model("model_MS_Global_aj_HarveyLike", self.spec)
        p_a = make_ms_global_params(lay_a, self.spec.n_per_l)
        ro = lay_a.offset("rot")
        p_a = p_a.at[ro:ro + 4].set(jnp.asarray([1.0, 0.05, 0.01, 0.02]))
        # same physics through the aj family: a1..a3 set, a4..a6 = 0, eta off
        p_j = make_ms_global_params(lay_j, self.spec.n_per_l)
        rj = lay_j.offset("rot")
        p_j = p_j.at[rj:rj + 8].set(
            jnp.asarray([1.0, 0.05, 0.01, 0.0, 0.0, 0.0, 0.0, 0.02]))
        m_a = np.asarray(fn_a(p_a, self.nu))
        m_j = np.asarray(fn_j(p_j, self.nu))
        np.testing.assert_allclose(m_a, m_j, rtol=1e-5)

    def test_a1a2a3_a2_moves_only_aspherical_components(self):
        fn, lay = build_model("model_MS_Global_a1a2a3_HarveyLike", self.spec)
        p0 = make_ms_global_params(lay, self.spec.n_per_l)
        ro = lay.offset("rot")
        p0 = p0.at[ro:ro + 4].set(jnp.asarray([1.0, 0.0, 0.0, 0.0]))
        p1 = p0.at[ro + 1].set(0.3)          # turn on a2
        m0 = np.asarray(fn(p0, self.nu))
        m1 = np.asarray(fn(p1, self.nu))
        assert np.max(np.abs(m0 - m1)) > 1e-4
        # l=0 modes carry no splitting: spectrum near 2000 (pure l=0) moves
        # much less than near the l=2 ridge (1992)
        i0 = np.abs(np.asarray(self.nu) - 2000.0) < 1.0
        i2 = np.abs(np.asarray(self.nu) - 1992.0) < 1.0
        assert np.max(np.abs(m0[i2] - m1[i2])) > np.max(np.abs(m0[i0] - m1[i0]))


class TestLocalHnlm:
    def test_free_m_heights_break_visibility_law(self):
        from tamcmc_tpu.models.local import MSLocalHnlmSpec
        spec = MSLocalHnlmSpec(n_per_l=(1, 1, 0, 0))
        fn, lay = build_model("model_MS_local_Hnlm", spec)
        p = np.zeros(lay.ndim, dtype=np.float32)
        p[lay.offset("height_l0")] = 5.0
        p[lay.offset("height_l1")] = 4.0
        p[lay.offset("freq_l0")] = 2000.0
        p[lay.offset("freq_l1")] = 2050.0
        p[lay.offset("width_l0")] = 0.5
        p[lay.offset("width_l1")] = 0.5
        # m=0 component on, |m|=1 off — impossible under any inclination
        # with a1 != 0 splitting visible... the point: arbitrary ratios
        p[lay.offset("hfactor_l1"):lay.offset("hfactor_l1") + 2] = [1.0, 0.0]
        p[lay.offset("rot")] = 2.0        # a1
        p[lay.offset("noise")] = 0.1
        nu = jnp.linspace(1990.0, 2060.0, 4096)
        m = np.asarray(fn(jnp.asarray(p), nu))
        i0 = np.argmin(np.abs(np.asarray(nu) - 2050.0))   # m=0 position
        ip = np.argmin(np.abs(np.asarray(nu) - 2052.0))   # m=+1 position
        assert m[i0] > 3.0            # m=0 fully visible
        assert m[ip] < m[i0] / 3.0    # |m|=1 suppressed
        g = jax.grad(lambda q: jnp.sum(fn(q, nu)))(jnp.asarray(p))
        assert np.all(np.isfinite(np.asarray(g)))


class TestKallinger2014:
    def test_background_shape(self):
        from tamcmc_tpu.ops.noise import kallinger2014
        nu = jnp.linspace(1.0, 280.0, 1024)
        params = jnp.asarray([50.0, 20.0, 30.0, 80.0, 0.5])
        n = np.asarray(kallinger2014(nu, params, 283.2))
        assert np.all(n > 0) and np.all(np.isfinite(n))
        # super-Lorentzian: falls off ~nu^-4 well above both knees
        i1 = np.argmin(np.abs(np.asarray(nu) - 160.0))
        i2 = np.argmin(np.abs(np.asarray(nu) - 260.0))
        # white floor is 0.5; subtract before slope check
        s = np.log((n[i1] - 0.5) / (n[i2] - 0.5)) / np.log(260.0 / 160.0)
        assert 2.5 < s < 5.5   # ~nu^-4 steepened by sinc^2 apodisation
        # zero-amplitude component contributes nothing
        p2 = jnp.asarray([50.0, 20.0, -1.0, 80.0, 0.5])
        n2 = np.asarray(kallinger2014(nu, p2, 283.2))
        assert np.all(n2 <= n + 1e-6)

    def test_model_family_with_envelope(self):
        fn, lay = build_model("model_Kallinger2014_Gaussian")
        p = jnp.asarray([50.0, 20.0, 30.0, 80.0, 0.5, 5.0, 150.0, 20.0])
        nu = jnp.linspace(1.0, 280.0, 1024)
        m = np.asarray(fn(p, nu))
        i = np.argmin(np.abs(np.asarray(nu) - 150.0))
        base = np.asarray(fn(p.at[5].set(0.0), nu))
        assert m[i] == pytest.approx(base[i] + 5.0, rel=1e-3)


class TestRGBAppWidth:
    def test_appwidth_variant_compiles_and_matches_layout(self):
        from tamcmc_tpu.models.asymptotic import RGBAsymptSpec
        spec = RGBAsymptSpec(n_orders=4, numin=500.0, numax_win=700.0,
                             n_p_poles=6, n_g_poles=40, n_harvey=2)
        fn, lay = build_model("model_RGB_asympt_a1etaa3_AppWidth_HarveyLike",
                              spec)
        assert lay.size("widths") == 6
        p = np.zeros(lay.ndim, dtype=np.float32)
        f0 = np.linspace(520.0, 680.0, 4)
        p[lay.offset("heights"):lay.offset("heights") + 4] = 5.0
        p[lay.offset("visibilities"):lay.offset("visibilities") + 2] = [1.5, 0.5]
        p[lay.offset("freq_l0"):lay.offset("freq_l0") + 4] = f0
        p[lay.offset("freq_l2"):lay.offset("freq_l2") + 4] = f0 - 6.0
        p[lay.offset("mixed"):lay.offset("mixed") + 3] = [80.0, 0.0, 0.15]
        p[lay.offset("rot"):lay.offset("rot") + 3] = [0.1, 0.4, 0.0]
        p[lay.offset("widths"):lay.offset("widths") + 6] = \
            [600.0, 3.0, 0.3, 2.0, 600.0, 1200.0]
        p[lay.offset("noise"):lay.offset("noise") + 7] = \
            [100.0, 2e-3, 4.0, 30.0, 1e-3, 2.0, 0.2]
        p[lay.offset("inclination")] = np.deg2rad(60.0)
        nu = jnp.linspace(505.0, 695.0, 4096)
        m = np.asarray(jax.jit(fn)(jnp.asarray(p), nu))
        assert np.all(np.isfinite(m)) and np.all(m > 0)
