"""Alm — activity-induced (l, m) frequency perturbation.

Reference equivalent: `external/Alm/*.cpp` [U] (SURVEY.md section 2
"Activity perturbation"): the frequency shift of an (l, m) mode caused by a
magnetic-activity band at latitude theta0 with width delta is the
latitudinal average of the mode's sensitivity kernel |Y_lm|^2 over an
activity filter, times a magnitude parameter epsilon:

    dnu_lm = epsilon * nu_nl * A_lm(theta0, delta)
    A_lm   = int |Y_lm(theta)|^2 W(theta) sin(theta) dtheta
             / int |Y_lm(theta)|^2 sin(theta) dtheta          in [0, 1]

with W a hemisphere-symmetric Gate or Triangle filter centred on colatitudes
pi/2 -+ theta0.  The reference integrates with GSL; here the integral is a
fixed-order Gauss-Legendre quadrature precomputed at trace time — static,
jit-safe, differentiable in (theta0, delta) through the (smoothed) filter.

Conventions [U]: re-ground the normalisation and the filter shapes against
external/Alm when the reference tree is readable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_QUAD_ORDER = 96
_NODES, _WEIGHTS = np.polynomial.legendre.leggauss(_QUAD_ORDER)
# map x in [-1, 1] -> theta in [0, pi]
_THETA = (np.pi / 2) * (_NODES + 1.0)
_W_TH = (np.pi / 2) * _WEIGHTS


def _plm2(l: int, m: int, x):
    """[P_l^|m|(x)]^2 * (l-|m|)!/(l+|m|)! — the phi-averaged |Y_lm|^2 shape
    (up to the common (2l+1)/4pi factor, which cancels in A_lm)."""
    m = abs(m)
    s2 = 1.0 - x * x          # sin^2 theta
    if l == 0:
        return jnp.ones_like(x)
    if l == 1:
        return {0: x**2, 1: 0.5 * s2}[m]
    if l == 2:
        return {0: 0.25 * (3 * x**2 - 1) ** 2,
                1: (1.0 / 6.0) * 9.0 * x**2 * s2,
                2: (1.0 / 24.0) * 9.0 * s2**2}[m]
    if l == 3:
        return {0: 0.25 * (5 * x**3 - 3 * x) ** 2,
                1: (1.0 / 12.0) * 2.25 * (5 * x**2 - 1) ** 2 * s2,
                2: (1.0 / 120.0) * 225.0 * x**2 * s2**2,
                3: (1.0 / 720.0) * 225.0 * s2**3}[m]
    raise NotImplementedError(f"Alm kernels implemented for l<=3, got {l}")


def activity_filter(theta, theta0, delta, kind: str = "gate",
                    smooth: float = 0.02):
    """Hemisphere-symmetric latitude filter W(theta) in [0, 1].

    theta: colatitude grid; theta0: active LATITUDE (0 = equator);
    delta: full band width.  'gate' uses a sigmoid-smoothed box (width
    `smooth` rad) so theta0/delta stay differentiable; 'triangle' is a
    piecewise-linear tent (differentiable a.e.); 'gauss' is a Gaussian band
    whose FWHM is delta (the reference Alm code grew a gauss filter type in
    later versions [U] — fully smooth, the friendliest to MALA drift).
    """
    lat = jnp.pi / 2 - theta          # latitude of the quadrature node
    d = jnp.maximum(delta, 1e-3)

    def band(c):
        if kind == "gate":
            lo, hi = c - d / 2.0, c + d / 2.0
            return (jax.nn.sigmoid((lat - lo) / smooth)
                    * jax.nn.sigmoid((hi - lat) / smooth))
        if kind == "triangle":
            return jnp.maximum(1.0 - jnp.abs(lat - c) / (d / 2.0), 0.0)
        if kind == "gauss":
            sig = d / 2.3548200450309493        # FWHM -> sigma
            return jnp.exp(-0.5 * ((lat - c) / sig) ** 2)
        raise KeyError(f"unknown activity filter '{kind}'")

    # active bands in both hemispheres, capped at 1 where they overlap
    return jnp.minimum(band(theta0) + band(-theta0), 1.0)


def alm(l: int, m: int, theta0, delta, kind: str = "gate"):
    """Normalised kernel-weighted filter average A_lm(theta0, delta) in [0,1].

    Static (l, m); traced (theta0, delta) in radians.
    """
    x = jnp.asarray(np.cos(_THETA), dtype=jnp.result_type(theta0, jnp.float32))
    th = jnp.asarray(_THETA, dtype=x.dtype)
    w = jnp.asarray(_W_TH, dtype=x.dtype)
    kern = _plm2(l, m, x) * jnp.sin(th)
    W = activity_filter(th, theta0, delta, kind=kind)
    num = jnp.sum(w * kern * W)
    den = jnp.sum(w * kern)
    return num / jnp.maximum(den, 1e-30)


def alm_shifts(l: int, nu_nl, epsilon, theta0, delta, kind: str = "gate"):
    """Activity shifts for all m = -l..l: dnu_lm = epsilon * nu_nl * A_lm.
    Returns nu_nl.shape + (2l+1,)."""
    a = jnp.stack([alm(l, m, theta0, delta, kind) for m in range(-l, l + 1)])
    return epsilon * jnp.asarray(nu_nl)[..., None] * a
