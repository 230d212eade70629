"""Model-name combinator: every member of the reference's combinatorial
model dictionary (rotation x width x noise x variant; `models.cpp` [U],
SURVEY.md section 2 "Model dictionary") builds, differentiates, and takes
one sampled MALA step — without hand-registering each name.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tamcmc_tpu.models.registry import (build_model, list_models,
                                        parse_model_name)
from tamcmc_tpu.models.ms_global import MSGlobalSpec
from tamcmc_tpu.models.asymptotic import RGBAsymptSpec


MS_NAMES = [n for n in list_models() if n.startswith("model_MS_Global_")]
RGB_NAMES = [n for n in list_models() if n.startswith("model_RGB_asympt_")]

N0 = 3
MS_SPEC = MSGlobalSpec(n_per_l=(N0, N0, N0, 0), n_harvey=1)
RGB_SPEC = RGBAsymptSpec(n_orders=3, numin=100.0, numax_win=140.0,
                         n_p_poles=5, n_g_poles=12, n_harvey=1)


def generic_params0(lay, nu_lo=100.0, nu_hi=140.0):
    """Fill a plausible parameter vector for ANY layout by block name."""
    p = np.zeros(lay.ndim, dtype=np.float32)
    dnu = (nu_hi - nu_lo) / (N0 + 1)
    f0 = nu_lo + dnu * (np.arange(N0) + 0.6)
    for name in lay.names:
        o, s = lay.offset(name), lay.size(name)
        if name == "heights":
            p[o:o + s] = 5.0
        elif name == "visibilities":
            p[o:o + s] = [1.5, 0.53, 0.08][:s]
        elif name.startswith("freq_l"):
            l = int(name[-1])
            p[o:o + s] = (f0 - 0.12 * dnu * l)[:s]
        elif name == "rot":
            p[o] = 0.4                      # a1-like leading entry
        elif name == "mixed":
            p[o:o + s] = [80.0, 0.0, 0.15, 0.0, 0.0, 0.0][:s]
        elif name == "widths":
            if s == 6:                      # app2016 relation params
                p[o:o + s] = [0.5 * (nu_lo + nu_hi), 3.0, 0.3, 2.0,
                              0.5 * (nu_lo + nu_hi), nu_hi - nu_lo]
            else:
                p[o:o + s] = 0.3
        elif name == "noise":
            # one harvey-like/1985 component + white (both conventions
            # accept (A, B/tc, p) triples with A,B>0)
            p[o:o + s] = ([2.0, 0.05, 2.0] * ((s - 1) // 3) + [0.1])[:s]
        elif name == "inclination":
            p[o] = 1.0
        elif name == "trunc":
            p[o] = 40.0
        elif name in ("mix_hfact", "mix_wfact"):
            p[o:o + s] = 1.0                # neutral factor tables
        elif name == "mix_fshift":
            p[o:o + s] = 0.0                # neutral scatter
        else:
            raise AssertionError(f"generic_params0: unknown block {name}")
    return p


class TestGrammar:
    def test_product_enumerated(self):
        # 7 rotations x 2 widths x 2 noises for MS_Global
        assert len(MS_NAMES) >= 28
        # a1etaa3 x 3 width segments x 2 noises x 3 variants for RGB
        assert len(RGB_NAMES) >= 18

    def test_parse_segments(self):
        fam, over, var = parse_model_name(
            "model_MS_Global_a1nl_etaa3_AppWidth_Harvey1985")
        assert fam == "ms_global"
        assert over == {"rotation": "a1nl", "width_kind": "app2016",
                        "noise_kind": "harvey_1985"}
        fam, over, var = parse_model_name(
            "model_RGB_asympt_a1etaa3_freeWidth_HarveyLike_v3")
        assert fam == "rgb_asympt"
        assert over["per_mode"] == "hw_scatter"
        assert var == "v3"

    def test_variant_suffix_is_alias_for_ms(self):
        a, la = build_model("model_MS_Global_aj_Harvey1985", MS_SPEC)
        b, lb = build_model("model_MS_Global_aj_Harvey1985_Classic", MS_SPEC)
        assert la.names == lb.names
        nu = jnp.linspace(100.0, 140.0, 128)
        p = jnp.asarray(generic_params0(la))
        np.testing.assert_array_equal(np.asarray(a(p, nu)),
                                      np.asarray(b(p, nu)))

    def test_variant_alias_emits_provenance_warning(self, capsys):
        # aliasing a _Classic/_vN suffix away is an [U]-grade assumption;
        # the user must SEE it happen (round-4 VERDICT weak #3), once per
        # name, on stderr (the .model-reader banner channel)
        from tamcmc_tpu.models import registry
        registry._WARNED_VARIANTS.clear()
        build_model("model_MS_Global_aj_Harvey1985_v2", MS_SPEC)
        err = capsys.readouterr().err
        assert "ALIAS" in err and "_v2" in err
        build_model("model_MS_Global_aj_Harvey1985_v2", MS_SPEC)
        assert "ALIAS" not in capsys.readouterr().err   # once per name
        # RGB v2/v3 are REAL per-mode switches, not aliases: no warning
        registry._WARNED_VARIANTS.clear()
        build_model("model_RGB_asympt_a1etaa3_HarveyLike_v2", RGB_SPEC)
        assert "ALIAS" not in capsys.readouterr().err

    def test_non_grammar_name_raises(self):
        with pytest.raises(KeyError):
            build_model("model_MS_Global_bogus_HarveyLike", MS_SPEC)
        assert parse_model_name("model_MS_Global_a1etaa3_Lorentz") is None

    def test_name_overrides_spec_fields(self):
        # the NAME is authoritative over the passed spec's law fields
        fn, lay = build_model("model_MS_Global_aj_HarveyLike",
                              dataclasses.replace(MS_SPEC,
                                                  rotation="a1etaa3"))
        assert lay.size("rot") == 8          # aj block, not a1etaa3's 4


@pytest.mark.parametrize("name", MS_NAMES)
def test_every_ms_member_builds_and_differentiates(name):
    fn, lay = build_model(name, MS_SPEC)
    nu = jnp.linspace(100.0, 140.0, 256)
    p = jnp.asarray(generic_params0(lay))
    m = np.asarray(jax.jit(fn)(p, nu))
    assert np.all(np.isfinite(m)) and np.all(m > 0), name

    def logl(x):
        mm = jnp.maximum(fn(x, nu), 1e-12)
        return -jnp.sum(jnp.log(mm) + 1.0 / mm)

    g = np.asarray(jax.jit(jax.grad(logl))(p))
    assert np.all(np.isfinite(g)), name
    # height gradient must be live (the model actually uses its params)
    assert np.any(g[lay.offset("heights"):lay.offset("heights") + N0] != 0)


@pytest.mark.parametrize("name", RGB_NAMES)
def test_every_rgb_member_builds_and_differentiates(name):
    fn, lay = build_model(name, RGB_SPEC)
    nu = jnp.linspace(100.0, 140.0, 256)
    p = jnp.asarray(generic_params0(lay))
    m = np.asarray(jax.jit(fn)(p, nu))
    assert np.all(np.isfinite(m)) and np.all(m > 0), name

    def logl(x):
        mm = jnp.maximum(fn(x, nu), 1e-12)
        return -jnp.sum(jnp.log(mm) + 1.0 / mm)

    g = np.asarray(jax.jit(jax.grad(logl))(p))
    assert np.all(np.isfinite(g)), name


@pytest.mark.parametrize("name", [
    # one sampled step per distinct BUILDER PATH through the combinator
    # (rotation laws, width laws, noise laws, RGB per-mode variants); the
    # full product's per-member build+grad is covered above — the sampler
    # step adds proposal/acceptance plumbing that is identical across
    # members of a path, so stepping every one would only re-test mala_step
    "model_MS_Global_a1etaa3_HarveyLike",
    "model_MS_Global_a1nl_etaa3_AppWidth_Harvey1985",
    "model_MS_Global_ajAlm_HarveyLike",
    "model_RGB_asympt_a1etaa3_HarveyLike",
    "model_RGB_asympt_a1etaa3_AppWidth_Harvey1985_v2",
    "model_RGB_asympt_a1etaa3_HarveyLike_v3",
])
def test_member_takes_one_sampled_step(name):
    from tamcmc_tpu.sampler import (init_state, MALAHyper, mala_step,
                                    make_beta_ladder)
    from tamcmc_tpu.sampler.problem import Problem
    from tamcmc_tpu.stats.priors import PriorTable

    spec = RGB_SPEC if name.startswith("model_RGB") else MS_SPEC
    fn, lay = build_model(name, spec)
    nu = jnp.linspace(100.0, 140.0, 256)
    p0 = generic_params0(lay)
    data = np.asarray(fn(jnp.asarray(p0), nu))
    rows = [(f"p{i}", "uniform", float(v - 0.5), float(v + 0.5))
            for i, v in enumerate(p0)]
    problem = Problem(model_fn=fn, layout=lay,
                      priors=PriorTable.from_rows(rows),
                      nu=nu, spec=jnp.asarray(data),
                      params0=jnp.asarray(p0))
    hp = MALAHyper(use_drift=True)
    betas = make_beta_ladder(2, hp.lambda_temp)
    s = init_state(problem, hp, 2, 2, jax.random.PRNGKey(0))
    s2 = mala_step(problem, hp, betas, s, jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(s2.logL)))
    assert np.all(np.isfinite(np.asarray(s2.theta)))


class TestPerModeNeutrality:
    """per_mode variants with NEUTRAL tables reproduce the plain asymptotic
    forest bit-for-bit (the freedom is a pure superset — VERDICT item 5)."""

    def test_hw_neutral_bitwise(self):
        base_fn, base_lay = build_model(
            "model_RGB_asympt_a1etaa3_HarveyLike", RGB_SPEC)
        v2_fn, v2_lay = build_model(
            "model_RGB_asympt_a1etaa3_HarveyLike_v2", RGB_SPEC)
        assert v2_lay.ndim == base_lay.ndim + 2 * RGB_SPEC.n_mixed
        nu = jnp.linspace(100.0, 140.0, 512)
        p_base = generic_params0(base_lay)
        p_v2 = generic_params0(v2_lay)
        np.testing.assert_array_equal(p_v2[:base_lay.ndim], p_base)
        a = np.asarray(jax.jit(base_fn)(jnp.asarray(p_base), nu))
        b = np.asarray(jax.jit(v2_fn)(jnp.asarray(p_v2), nu))
        np.testing.assert_array_equal(a, b)

    def test_scatter_neutral_bitwise(self):
        base_fn, base_lay = build_model(
            "model_RGB_asympt_a1etaa3_HarveyLike", RGB_SPEC)
        v3_fn, v3_lay = build_model(
            "model_RGB_asympt_a1etaa3_HarveyLike_v3", RGB_SPEC)
        assert v3_lay.ndim == base_lay.ndim + 3 * RGB_SPEC.n_mixed
        nu = jnp.linspace(100.0, 140.0, 512)
        a = np.asarray(jax.jit(base_fn)(
            jnp.asarray(generic_params0(base_lay)), nu))
        b = np.asarray(jax.jit(v3_fn)(
            jnp.asarray(generic_params0(v3_lay)), nu))
        np.testing.assert_array_equal(a, b)

    def test_factors_and_scatter_act(self):
        """Non-neutral tables visibly move the forest: height factor scales
        a mode's peak, scatter moves its frequency."""
        fn, lay = build_model("model_RGB_asympt_a1etaa3_HarveyLike_v3",
                              RGB_SPEC)
        nu = jnp.linspace(100.0, 140.0, 4096)
        p = generic_params0(lay)
        base = np.asarray(jax.jit(fn)(jnp.asarray(p), nu))
        # double every mixed-mode height factor
        o = lay.offset("mix_hfact")
        p2 = p.copy()
        p2[o:o + RGB_SPEC.n_mixed] = 2.0
        up = np.asarray(jax.jit(fn)(jnp.asarray(p2), nu))
        assert np.max(up - base) > 0.5          # forest got taller
        # shift every mixed mode by +0.8 uHz: spectrum changes, total mode
        # power is (approximately) conserved
        o = lay.offset("mix_fshift")
        p3 = p.copy()
        p3[o:o + RGB_SPEC.n_mixed] = 0.8
        sh = np.asarray(jax.jit(fn)(jnp.asarray(p3), nu))
        assert np.max(np.abs(sh - base)) > 0.5
        assert abs(sh.sum() - base.sum()) / base.sum() < 0.05
