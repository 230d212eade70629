"""Lorentzian mode-profile builders — the hot kernel of the whole engine.

Reference equivalent: `build_lorentzian.cpp — optimum_lorentzian_calc_*` [U]
(SURVEY.md section 2).  The reference evaluates each Lorentzian only inside a
truncation window c*Gamma around its centre (data-dependent loop bounds).
TPU-first redesign: every azimuthal component is evaluated *densely* on the
full static frequency grid and all components are accumulated in one
contraction — no data-dependent shapes, fully fusable by XLA, batched over
(temperature, chain) by vmap.  An optional Pallas kernel fuses the
(components x grid) accumulation with the chi^2(2dof) likelihood reduction
(ops/pallas/spectrum.py).

Profile (with Nigam & Kosovichev 1998-style asymmetry `b`):
    x = 2 (nu - nu0) / Gamma
    L(nu) = H * [(1 + b*x)^2 + b^2] / (1 + x^2)
b = 0 recovers the symmetric Lorentzian H / (1 + x^2).
"""

import jax.numpy as jnp


def lorentzian_profile(nu, height, nu0, width, asym=0.0):
    """Single (possibly asymmetric) Lorentzian on grid `nu`.

    All of (height, nu0, width, asym) may broadcast; width is clamped to a
    small positive floor for differentiability safety.
    """
    w = jnp.maximum(width, 1e-6)
    x = 2.0 * (nu - nu0) / w
    num = (1.0 + asym * x) ** 2 + asym**2
    return height * num / (1.0 + x * x)


def sum_lorentzians(nu, heights, nu0s, widths, asyms):
    """Accumulate ncomp Lorentzian components on the grid.

    nu: (N,); heights/nu0s/widths/asyms: (ncomp,) -> returns (N,).
    Dense masked evaluation: components with height == 0 contribute exactly 0
    (used for static padding of variable mode counts).
    """
    w = jnp.maximum(widths, 1e-6)[:, None]           # (ncomp, 1)
    x = 2.0 * (nu[None, :] - nu0s[:, None]) / w       # (ncomp, N)
    num = (1.0 + asyms[:, None] * x) ** 2 + (asyms[:, None]) ** 2
    prof = heights[:, None] * num / (1.0 + x * x)
    return jnp.sum(prof, axis=0)
