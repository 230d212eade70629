"""Model registry: reference model names -> builder functions.

Replaces the reference's string dispatch inside the sampler loop
(`Model_def::call_model`, `models.cpp` [U]) with *trace-time* resolution:
`build_model(name, spec)` returns a pure jnp `model_fn(params, nu)` plus its
BlockLayout; nothing stringly-typed survives into jit.
"""

from __future__ import annotations

import dataclasses

from tamcmc_tpu.models.ms_global import MSGlobalSpec, build_ms_global
from tamcmc_tpu.models.local import (
    MSLocalSpec, build_ms_local, MSLocalHnlmSpec, build_ms_local_hnlm,
)
from tamcmc_tpu.models.asymptotic import RGBAsymptSpec, build_rgb_asympt
from tamcmc_tpu.models.ajfit import AjFitSpec, build_ajfit
from tamcmc_tpu.models.test_models import (
    TestGaussianSpec, build_test_gaussian,
    HarveyGaussianSpec, build_harvey_gaussian,
    SingleLorentzianSpec, build_single_lorentzian,
    HarveyBackgroundSpec, build_harvey_background,
    Kallinger2014Spec, build_kallinger2014,
)


@dataclasses.dataclass(frozen=True)
class ModelFamily:
    name: str
    spec_cls: type
    builder: object
    doc: str = ""


_FAMILIES = {}


def _register(name, spec_cls, builder, doc=""):
    _FAMILIES[name.lower()] = ModelFamily(name, spec_cls, builder, doc)


_register("model_MS_Global_a1etaa3_HarveyLike", MSGlobalSpec,
          lambda spec: build_ms_global(spec),
          "global p-mode fit, a1/eta0/a3 rotation, Harvey-like background")
_register("model_MS_Global_a1etaa3_HarveyLike_Classic", MSGlobalSpec,
          lambda spec: build_ms_global(spec),
          "alias of a1etaa3_HarveyLike (the reference's _Classic differs "
          "only in .model-file IO conventions [U])")
_register("model_MS_Global_a1etaa3_Harvey1985", MSGlobalSpec,
          lambda spec: build_ms_global(
              dataclasses.replace(spec, noise_kind="harvey_1985")),
          "a1etaa3 rotation with the classic Harvey (1985) noise profile")
_register("model_MS_Global_a1l_etaa3_HarveyLike", MSGlobalSpec,
          lambda spec: build_ms_global(dataclasses.replace(spec, rotation="a1l")),
          "per-degree splittings a1(l=1), a1(l=2); l=3 uses their mean")
_register("model_MS_Global_a1n_etaa3_HarveyLike", MSGlobalSpec,
          lambda spec: build_ms_global(dataclasses.replace(spec, rotation="a1n")),
          "per-radial-order splittings a1(n), shared across degrees")
_register("model_MS_Global_a1nl_etaa3_HarveyLike", MSGlobalSpec,
          lambda spec: build_ms_global(dataclasses.replace(spec, rotation="a1nl")),
          "per-(order, degree) splittings: a1(n, l=1) and a1(n, l=2) tables")
_register("model_MS_Global_a1a2a3_HarveyLike", MSGlobalSpec,
          lambda spec: build_ms_global(
              dataclasses.replace(spec, rotation="a1a2a3")),
          "a2 asphericity fitted directly instead of the centrifugal eta term")
_register("model_MS_Global_a1etaa3_AppWidth_HarveyLike", MSGlobalSpec,
          lambda spec: build_ms_global(
              dataclasses.replace(spec, width_kind="app2016")),
          "a1etaa3 rotation with the Appourchaux+2016 width relation "
          "(6 relation params replace the N0 free widths)")
_register("model_MS_Global_aj_AppWidth_HarveyLike", MSGlobalSpec,
          lambda spec: build_ms_global(
              dataclasses.replace(spec, rotation="aj", width_kind="app2016")),
          "a1..a6 a-coefficients with the Appourchaux+2016 width relation")
_register("model_MS_Global_aj_HarveyLike", MSGlobalSpec,
          lambda spec: build_ms_global(dataclasses.replace(spec, rotation="aj")),
          "global p-mode fit, a1..a6 a-coefficients, Harvey-like background")
_register("model_MS_Global_ajAlm_HarveyLike", MSGlobalSpec,
          lambda spec: build_ms_global(dataclasses.replace(spec, rotation="ajAlm")),
          "global p-mode fit, odd aj + Alm activity asphericity")
_register("model_RGB_asympt_a1etaa3_HarveyLike", RGBAsymptSpec,
          build_rgb_asympt,
          "RGB/subgiant fit: individual l=0/2 + ARMM l=1 mixed-mode forest")
_register("model_RGB_asympt_a1etaa3_freeWidth_HarveyLike", RGBAsymptSpec,
          build_rgb_asympt,
          "alias: per-order free widths are this implementation's default")
_register("model_RGB_asympt_a1etaa3_AppWidth_HarveyLike", RGBAsymptSpec,
          lambda spec: build_rgb_asympt(
              dataclasses.replace(spec, width_kind="app2016")),
          "RGB/subgiant mixed-mode fit with the Appourchaux+2016 width "
          "relation on the p-mode ridge")
_register("model_ajfit", AjFitSpec, build_ajfit,
          "a-coefficient table fit: aj (j=1..6) + optional Alm activity "
          "asphericity to measured nu_nlm frequencies (io_ajfit [U]); "
          "Gaussian chi_square likelihood over the mode table, no spectrum")
_register("model_MS_local_basic", MSLocalSpec, build_ms_local,
          "windowed local fit, per-mode free parameters")
_register("model_MS_local_Hnlm", MSLocalHnlmSpec, build_ms_local_hnlm,
          "local fit with free azimuthal height ratios (magnetic stars)")
_register("model_Test_Gaussian", TestGaussianSpec, build_test_gaussian,
          "Gaussian bump + white noise (sampler smoke test)")
_register("model_Harvey_Gaussian", HarveyGaussianSpec, build_harvey_gaussian,
          "Harvey profile + Gaussian envelope")
_register("model_Single_Lorentzian", SingleLorentzianSpec,
          build_single_lorentzian, "BASELINE config 1")
_register("model_Harvey_Background", HarveyBackgroundSpec,
          build_harvey_background, "BASELINE config 2 noise-background fit")
_register("model_Kallinger2014_Gaussian", Kallinger2014Spec,
          build_kallinger2014,
          "Kallinger+2014 two-component granulation background + Gaussian "
          "p-mode envelope, sinc^2-apodised")


def list_models():
    return sorted(f.name for f in _FAMILIES.values())


def build_model(name: str, spec=None, **spec_kwargs):
    """Build (model_fn, layout) for a named family.

    Either pass a ready spec dataclass, or kwargs for the family's spec class.
    """
    key = name.strip().lower()
    if key not in _FAMILIES:
        raise KeyError(f"unknown model '{name}'; have {list_models()}")
    fam = _FAMILIES[key]
    if spec is None:
        spec = fam.spec_cls(**spec_kwargs)
    fn, layout = fam.builder(spec)
    # introspection for ensemble stacking / tooling (sampler/ensemble.py
    # model_meta); harmless on plain closures
    try:
        fn._family_name = name
        fn._family_spec = spec
    except AttributeError:
        pass
    return fn, layout
