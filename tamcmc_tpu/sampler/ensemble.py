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


def validate_stackable(problems):
    """All problems must share the static structure; returns nothing, raises
    ValueError with the offending star index otherwise.  A silently mixed
    ensemble would sample every star against star 0's model."""
    base = problems[0]
    for i, p in enumerate(problems[1:], start=1):
        if p.layout.ndim != base.layout.ndim:
            raise ValueError(f"star {i}: layout ndim {p.layout.ndim} != "
                             f"{base.layout.ndim}")
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


def init_ensemble_state(problems, hp: MALAHyper, n_temps: int, n_chains: int,
                        key):
    """Per-star init_state, tree-stacked on a leading star axis."""
    keys = jax.random.split(key, len(problems))
    states = [mala.init_state(p, hp, n_temps, n_chains, k)
              for p, k in zip(problems, keys)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_ensemble_phase_runner(problems, hp: MALAHyper, betas, adapt: bool,
                               thin: int, n_emit: int):
    """Jitted (states, key) -> (states, records): the single-problem phase
    runner (driver.make_phase_runner) vmapped over the star axis.  All
    record arrays gain a leading S axis after the emit axis is scanned:
    shapes are (n_emit, S, ...)."""
    validate_stackable(problems)
    base = problems[0]
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
        record = {
            "theta0": state.theta[0],
            "logL": state.logL,
            "logP0": state.logP[0],
            "log_sigma": jnp.mean(state.log_sigma, 1),
            "acc_rate": jnp.mean(state.acc_rate, 1),
            "mu0": jnp.mean(state.mu[0], 0),
            "cov_diag0": jnp.mean(jnp.diagonal(
                state.cov[0], axis1=-2, axis2=-1), 0),
            "swap_att": state.nswap_att,
            "swap_acc": state.nswap_acc,
        }
        return state, record

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
    n_emit_total = max(n_steps // thin, 1)
    chunk = min(chunk, n_emit_total)
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
