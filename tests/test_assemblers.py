"""Family prior assemblers: cross-parameter constraints (stats/assemblers.py).

Reference equivalent: priors_calc.cpp — priors_MS_Global etc. [U]
(SURVEY.md section 2 "Priors"): a proposal with crossed mode frequencies or
an out-of-range inclination must be rejected with probability ~1 even when
every per-parameter prior is individually satisfied.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tamcmc_tpu.models import build_model
from tamcmc_tpu.models.ms_global import MSGlobalSpec
from tamcmc_tpu.stats.assemblers import (
    ordering, bounded, compose, build_family_constraints)
from tamcmc_tpu.stats.priors import PriorTable, NEG_BIG
from tamcmc_tpu.sampler.problem import Problem


@pytest.fixture(scope="module")
def ms_layout():
    fn, layout = build_model("model_MS_Global_a1etaa3_HarveyLike",
                             MSGlobalSpec(n_per_l=(3, 3, 3, 0)))
    return fn, layout


def _valid_params(layout):
    p = np.zeros(layout.ndim, dtype=np.float32)
    p[layout.offset("heights"):layout.offset("heights") + 3] = [5.0, 8.0, 6.0]
    vo = layout.offset("visibilities")
    p[vo:vo + 2] = [1.5, 0.53]
    for l, off in ((0, 0.0), (1, 50.0), (2, -12.0)):
        o = layout.offset(f"freq_l{l}")
        p[o:o + 3] = np.array([2000.0, 2100.0, 2200.0]) + off
    ro = layout.offset("rot")
    p[ro:ro + 4] = [1.0, 1.0, 0.01, 0.0]
    p[layout.offset("widths"):layout.offset("widths") + 3] = [1.0, 2.0, 2.5]
    no = layout.offset("noise")
    p[no:no + 10] = [50.0, 2e-3, 4.0, -1, -1, 2, -1, -1, 2, 0.2]
    p[layout.offset("inclination")] = 0.9
    p[layout.offset("trunc")] = 40.0
    return p


def test_ordering_detects_crossed_frequencies(ms_layout):
    _, layout = ms_layout
    fn = ordering(layout, "freq_l0")
    p = jnp.asarray(_valid_params(layout))
    assert float(fn(p)) == 0.0
    o = layout.offset("freq_l0")
    crossed = p.at[o].set(2150.0)        # now f0[0] > f0[1]
    assert float(fn(crossed)) <= NEG_BIG / 2


def test_family_constraints_ms_global(ms_layout):
    _, layout = ms_layout
    extra = build_family_constraints("model_MS_Global_a1etaa3_HarveyLike",
                                     layout)
    assert extra is not None
    p = jnp.asarray(_valid_params(layout))
    assert float(extra(p)) == 0.0

    # crossed l=1 frequencies
    o = layout.offset("freq_l1")
    assert float(extra(p.at[o + 1].set(1000.0))) <= NEG_BIG / 2
    # inclination beyond pi/2
    assert float(extra(p.at[layout.offset("inclination")].set(2.0))) \
        <= NEG_BIG / 2
    # negative height / width / a1
    assert float(extra(p.at[layout.offset("heights")].set(-1.0))) \
        <= NEG_BIG / 2
    assert float(extra(p.at[layout.offset("widths")].set(-0.1))) \
        <= NEG_BIG / 2
    assert float(extra(p.at[layout.offset("rot")].set(-0.5))) <= NEG_BIG / 2


def test_multiple_violations_stay_finite(ms_layout):
    """Many simultaneous violations must clamp at NEG_BIG, not overflow."""
    _, layout = ms_layout
    extra = build_family_constraints("model_MS_Global_a1etaa3_HarveyLike",
                                     layout)
    p = jnp.asarray(np.full(layout.ndim, -5.0, dtype=np.float32))
    v = float(extra(p))
    assert np.isfinite(v) and v <= NEG_BIG / 2


def test_constraint_gradient_is_finite(ms_layout):
    """Autodiff through a violated constraint: zero gradient, never NaN
    (the NEG_BIG finite -inf convention of stats/priors.py)."""
    _, layout = ms_layout
    extra = build_family_constraints("model_MS_Global_a1etaa3_HarveyLike",
                                     layout)
    p = jnp.asarray(_valid_params(layout))
    o = layout.offset("freq_l0")
    g = jax.grad(extra)(p.at[o].set(2150.0))
    assert np.all(np.isfinite(np.asarray(g)))


def test_crossed_proposal_rejected_in_mh(ms_layout):
    """VERDICT round-1 'done' criterion: an MH proposal with crossed
    frequencies is rejected with probability ~1 — the log-posterior drop is
    NEG_BIG-sized, dwarfing any likelihood gain."""
    fn, layout = ms_layout
    extra = build_family_constraints("model_MS_Global_a1etaa3_HarveyLike",
                                     layout)
    p = _valid_params(layout)
    nu = jnp.linspace(1900.0, 2350.0, 2048)
    spec = fn(jnp.asarray(p), nu) + 0.1
    rows = [(f"p{i}", "uniform", -1e4, 1e4) for i in range(layout.ndim)]
    priors = PriorTable.from_rows(rows)
    problem = Problem(model_fn=fn, layout=layout, priors=priors, nu=nu,
                      spec=spec, params0=jnp.asarray(p), extra_logp=extra)
    x_ok = problem.extract(jnp.asarray(p))
    _, logP_ok = problem.log_parts(x_ok)
    o = layout.offset("freq_l0")
    crossed = jnp.asarray(p).at[o].set(2150.0)
    _, logP_bad = problem.log_parts(problem.extract(crossed))
    # MH: log accept ratio <= logP_bad - logP_ok <= NEG_BIG/2
    assert float(logP_bad - logP_ok) <= NEG_BIG / 2


def test_rgb_family_constraints():
    from tamcmc_tpu.models.asymptotic import RGBAsymptSpec
    from tamcmc_tpu.ops.armm import count_poles
    n_p, n_g = count_poles(10.0, 80.0, 0.4, 0.0, 100.0, 160.0)
    fn, layout = build_model(
        "model_RGB_asympt_a1etaa3_HarveyLike",
        RGBAsymptSpec(n_orders=3, numin=100.0, numax_win=160.0,
                      n_p_poles=n_p, n_g_poles=n_g))
    extra = build_family_constraints("model_RGB_asympt_a1etaa3_HarveyLike",
                                     layout)
    assert extra is not None
    p = np.zeros(layout.ndim, dtype=np.float32)
    o = layout.offset("freq_l0")
    p[o:o + 3] = [105.0, 115.0, 125.0]
    o2 = layout.offset("freq_l2")
    p[o2:o2 + 3] = [103.8, 113.8, 123.8]
    p[layout.offset("heights"):layout.offset("heights") + 3] = 5.0
    p[layout.offset("widths"):layout.offset("widths") + 3] = 0.2
    mo = layout.offset("mixed")
    p[mo:mo + 3] = [80.0, 0.0, 0.15]
    p[layout.offset("inclination")] = 1.0
    pj = jnp.asarray(p)
    assert float(extra(pj)) == 0.0
    # non-positive period spacing breaks the ARMM domain
    assert float(extra(pj.at[mo].set(0.0))) <= NEG_BIG / 2
    # non-positive coupling
    assert float(extra(pj.at[mo + 2].set(0.0))) <= NEG_BIG / 2


def test_no_constraints_for_test_families():
    fn, layout = build_model("model_Single_Lorentzian")
    assert build_family_constraints("model_Single_Lorentzian", layout) is None


def test_compose_none():
    assert compose() is None
    assert compose(None, None) is None
