"""Spectral likelihoods.

Reference equivalent: `likelihoods.cpp — likelihood_chi22p,
likelihood_chi_square`; name dispatch in `stats_dictionary.cpp` [U]
(SURVEY.md section 2 "Likelihoods").

chi^2 with 2 d.o.f. (raw periodogram, exponentially distributed bins):
    logL = -sum_i [ ln M_i + S_i / M_i ]
Gaussian chi^2 (averaged spectra with per-bin sigma):
    logL = -0.5 * sum_i ((S_i - M_i)/sigma_i)^2

TPU notes: this is THE hot reduction; it is kept as a pure jnp one-liner so
XLA fuses it with the model evaluation into a single kernel (SURVEY.md
section 2 called for exactly this fusion).  Reductions are chunked pairwise
by XLA (tree reduction), keeping f32 accumulation error ~sqrt(log N)*eps.
A `mask` lets callers restrict the fit window without dynamic shapes.
"""

import jax.numpy as jnp


def likelihood_chi22p(spec, model, mask=None):
    """chi^2(2 d.o.f.) log-likelihood of data `spec` under model spectrum
    `model` (same shape).  Model is floored at a tiny positive value to keep
    log/grad finite when a proposal wanders to zero power."""
    m = jnp.maximum(model, 1e-12)
    terms = jnp.log(m) + spec / m
    if mask is not None:
        terms = terms * mask
    return -jnp.sum(terms)


def likelihood_chi_square(spec, model, sigma, mask=None):
    """Gaussian log-likelihood for averaged spectra with per-bin sigma."""
    s = jnp.maximum(sigma, 1e-12)
    terms = ((spec - model) / s) ** 2
    if mask is not None:
        terms = terms * mask
    return -0.5 * jnp.sum(terms)


_REGISTRY = {
    "chi22p": likelihood_chi22p,
    "chi(2,2p)": likelihood_chi22p,      # reference spelling variant [U]
    "chi_square": likelihood_chi_square,
}


def get_likelihood(name: str):
    """Name -> function dispatch (resolved at trace time, never inside jit —
    replaces the reference's string dispatch in stats_dictionary.cpp [U])."""
    key = name.strip().lower()
    if key not in _REGISTRY:
        raise KeyError(f"unknown likelihood '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[key]
