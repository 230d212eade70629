"""Aligned-grid multi-star ensemble: vmap the tempered sampler over stars.

SURVEY.md section 2 (parallelism table, "Ensemble/data parallelism"): the
reference runs its presets table of stars strictly SERIALLY (one process per
star); the rebuild owes a first-class batched path — "multiple stars =
batched problems where grids align".  This module is that path: S problems
sharing one model family, layout, prior KINDS, likelihood and frequency grid
(only the observed spectra, prior hyperparameters and initial/fixed values
differ) are advanced by ONE jitted program with a leading star axis vmapped
over the full (T temperatures x C walkers) sampler step — S independent
posteriors, zero Python-loop overhead, one XLA fusion.

For stars whose grids do NOT align, use the serial `tamcmc batch` workflow.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tamcmc_tpu.sampler.problem import Problem
from tamcmc_tpu.sampler.state import MALAHyper
from tamcmc_tpu.sampler.driver import _raw_step
from tamcmc_tpu.sampler import mala


def _spec_sans_window(spec):
    if spec is not None and hasattr(spec, "window_hint"):
        return dataclasses.replace(spec, window_hint=None)
    return spec


def _model_meta(p):
    """Problem.model_meta, falling back to the introspection attrs
    build_model stamps on every registry closure."""
    if p.model_meta is not None:
        return p.model_meta
    name = getattr(p.model_fn, "_family_name", None)
    if name is None:
        return None
    return {"name": name, "spec": getattr(p.model_fn, "_family_spec", None)}


def validate_stackable(problems):
    """All problems must share the static structure; returns nothing, raises
    ValueError with the offending star index otherwise.  A silently mixed
    ensemble would sample every star against star 0's model.

    Model identity: the vmapped runner traces ONE model closure for all
    stars, so stars must verifiably share the model family.  Distinct
    closure objects are accepted only when both carry `model_meta` with the
    same family name and the same spec (window hints aside — those are
    merged by make_ensemble_phase_runner); a bare closure that differs from
    star 0's is rejected rather than silently evaluated with star 0's model
    (the round-2 wrong-answer hole)."""
    base = problems[0]
    meta0 = _model_meta(base)
    for i, p in enumerate(problems[1:], start=1):
        if p.layout.ndim != base.layout.ndim:
            raise ValueError(f"star {i}: layout ndim {p.layout.ndim} != "
                             f"{base.layout.ndim}")
        if p.model_fn is not base.model_fn:
            meta_i = _model_meta(p)
            if meta0 is None or meta_i is None:
                raise ValueError(
                    f"star {i}: model closure differs from star 0 and "
                    "model_meta is missing — cannot prove the stars share a "
                    "model family; build problems via build_model/the CLI "
                    "(which stamp family metadata) or share one model_fn")
            if meta_i["name"] != meta0["name"]:
                raise ValueError(f"star {i}: model family "
                                 f"{meta_i['name']!r} != {meta0['name']!r}")
            if _spec_sans_window(meta_i.get("spec")) != \
                    _spec_sans_window(meta0.get("spec")):
                raise ValueError(f"star {i}: model spec differs from star 0 "
                                 "(beyond window hints)")
        if not np.array_equal(np.asarray(p.priors.kinds),
                              np.asarray(base.priors.kinds)):
            raise ValueError(f"star {i}: prior kinds differ")
        if p.likelihood != base.likelihood:
            raise ValueError(f"star {i}: likelihood {p.likelihood!r} != "
                             f"{base.likelihood!r}")
        if p.nu.shape != base.nu.shape or \
                not np.allclose(np.asarray(p.nu), np.asarray(base.nu)):
            raise ValueError(f"star {i}: frequency grid not aligned")
        if (p.mask is None) != (base.mask is None):
            raise ValueError(f"star {i}: mask presence differs")
        if (p.sigma_spec is None) != (base.sigma_spec is None):
            raise ValueError(f"star {i}: sigma_spec presence differs")


def _shared_model_problem(problems):
    """Return star 0's problem, with the model closure rebuilt so it is
    CORRECT for every star.

    The only per-star constants baked into a model closure are the static
    truncation window groups (anchored at each star's params0 —
    models/ms_global.py).  If any star uses them, rebuild one closure whose
    windows are the per-component UNION across stars (conservative, hence
    correct for all); with no windows anywhere, star 0's closure is already
    star-independent."""
    base = problems[0]
    hints = []
    for p in problems:
        spec = (_model_meta(p) or {}).get("spec")
        hints.append(getattr(spec, "window_hint", None) if spec is not None
                     else None)
    if not any(h is not None for h in hints):
        return base
    with_hints = [h for h in hints if h is not None]
    grid0 = with_hints[0][1:4]
    for h in with_hints[1:]:
        if h[1:4] != grid0:
            raise ValueError("window hints disagree on the grid; grids were "
                             "validated aligned — rebuild the problems")
    merged = (tuple(tuple(h[0]) for h in with_hints), grid0[0], grid0[1],
              grid0[2], max(h[4] for h in with_hints))
    from tamcmc_tpu.models import build_model
    meta = _model_meta(base)
    spec = dataclasses.replace(meta["spec"], window_hint=merged)
    fn, _ = build_model(meta["name"], spec=spec)
    return dataclasses.replace(base, model_fn=fn,
                               model_meta={**meta, "spec": spec})


def _per_star_problems(problems):
    """(shared_base, per-star problems): every star rebuilt around the ONE
    ensemble-safe model closure (see _shared_model_problem), differing only
    in the vmappable per-star data fields."""
    validate_stackable(problems)
    base = _shared_model_problem(problems)
    stars = [dataclasses.replace(
        base, spec=p.spec, priors=p.priors, params0=p.params0,
        sigma_spec=p.sigma_spec, mask=p.mask) for p in problems]
    return base, stars


def init_ensemble_state(problems, hp: MALAHyper, n_temps: int, n_chains: int,
                        key):
    """Per-star init_state, tree-stacked on a leading star axis.  Uses the
    same shared model closure as the phase runner, so the cached logL/grad
    are consistent with every subsequent step."""
    _, stars = _per_star_problems(problems)
    keys = jax.random.split(key, len(stars))
    states = [mala.init_state(p, hp, n_temps, n_chains, k)
              for p, k in zip(stars, keys)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_ensemble_phase_runner(problems, hp: MALAHyper, betas, adapt: bool,
                               thin: int, n_emit: int):
    """Jitted (states, key) -> (states, records): the single-problem phase
    runner (driver.make_phase_runner) vmapped over the star axis.  All
    record arrays gain a leading S axis after the emit axis is scanned:
    shapes are (n_emit, S, ...)."""
    base, _ = _per_star_problems(problems)
    specs = jnp.stack([jnp.asarray(p.spec, jnp.float32) for p in problems])
    hypers = jnp.stack([jnp.asarray(p.priors.hypers, jnp.float32)
                        for p in problems])
    params0 = jnp.stack([jnp.asarray(p.params0, jnp.float32)
                         for p in problems])
    has_sigma = base.sigma_spec is not None
    sigmas = (jnp.stack([jnp.asarray(p.sigma_spec, jnp.float32)
                         for p in problems])
              if has_sigma else jnp.zeros((len(problems), 1)))
    has_mask = base.mask is not None
    masks = (jnp.stack([jnp.asarray(p.mask, jnp.float32) for p in problems])
             if has_mask else jnp.zeros((len(problems), 1)))

    def star_super_step(spec, hyp, p0, sigma, mask, state, key):
        pri = dataclasses.replace(base.priors, hypers=hyp)
        prob = dataclasses.replace(
            base, spec=spec, priors=pri, params0=p0,
            sigma_spec=sigma if has_sigma else None,
            mask=mask if has_mask else None)
        raw = _raw_step(prob, hp, betas, adapt)
        keys = jax.random.split(key, thin)
        state, _ = jax.lax.scan(raw, state, keys)
        from tamcmc_tpu.sampler.driver import make_record
        return state, make_record(state)

    v_super = jax.vmap(star_super_step, in_axes=(0, 0, 0, 0, 0, 0, 0))
    S = len(problems)

    def run(states, key):
        def emit_step(states, k):
            return v_super(specs, hypers, params0, sigmas, masks, states,
                           jax.random.split(k, S))
        keys = jax.random.split(key, n_emit)
        return jax.lax.scan(emit_step, states, keys)

    return jax.jit(run, donate_argnums=(0,))


def run_ensemble_phase(problems, hp, betas, states, key, n_steps, adapt=True,
                       thin=1, chunk=200, on_chunk=None, on_state=None,
                       already_emitted: int = 0):
    """One phase over the star ensemble, CHUNKED like sampler.driver.run_phase
    (bounded host buffering, streaming writers, mid-phase checkpoints).

    on_chunk(outs): records with (chunk, S, ...) shapes per chunk.
    on_state(states, key, emitted): carry + continuation key at each chunk
    boundary — checkpoint exactly this pair for bitwise resume."""
    from tamcmc_tpu.sampler.driver import resolve_emit_plan
    n_emit_total, chunk = resolve_emit_plan(n_steps, thin, chunk)
    if already_emitted % chunk != 0:
        raise ValueError(f"already_emitted={already_emitted} not a multiple "
                         f"of chunk={chunk}")
    runner = make_ensemble_phase_runner(problems, hp, betas, adapt, thin,
                                        chunk)
    collected = []
    remaining = n_emit_total - already_emitted
    emitted = already_emitted
    while remaining > 0:
        key, sub = jax.random.split(key)
        states, outs = runner(states, sub)
        emitted += chunk
        if on_chunk is not None:
            on_chunk(outs)
        if on_state is not None:
            on_state(states, key, emitted)
        collected.append(jax.device_get(outs))
        remaining -= chunk
    if not collected:
        return states, {}
    stacked = {k: np.concatenate([c[k] for c in collected], axis=0)
               for k in collected[0]}
    return states, stacked


def run_ensemble_phases(problems, hp, betas, states, key, plan,
                        on_phase_end=None, on_chunk=None, on_state=None):
    """B -> L -> A over the whole star ensemble.  Returns
    (states, {phase: stacked host records with (E, S, ...) shapes})."""
    results = {}
    for name, n_steps, adapt in plan.phases():
        if n_steps <= 0:
            continue
        key, sub = jax.random.split(key)
        states, outs = run_ensemble_phase(
            problems, hp, betas, states, sub, n_steps, adapt=adapt,
            thin=plan.thin, chunk=plan.chunk,
            on_chunk=(None if on_chunk is None
                      else (lambda o, _n=name: on_chunk(_n, o))),
            on_state=(None if on_state is None
                      else (lambda s, k, e, _n=name: on_state(_n, s, k, e))))
        results[name] = outs
        if on_phase_end is not None:
            on_phase_end(name, states, results[name])
    return states, results
