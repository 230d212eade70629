"""Granulation / activity noise-background models.

Reference equivalent: `noise_models.cpp — harvey_like, harvey1985` [U]
(SURVEY.md section 2 "Noise models").  All pure jnp, differentiable,
broadcast over the frequency grid.

Conventions (uHz grid):
  harvey_like : N(nu) = A / (1 + (B * nu)^p)          per component
  harvey_1985 : N(nu) = A / (1 + (B * nu)^2)^(p?)     classic Harvey p=2 form
Negative/zero (A, B) components are treated as "absent" (contribute 0),
mirroring the reference's convention of -1 placeholders in noise blocks [U].
"""

import jax.numpy as jnp


def harvey_like(nu, A, B, p):
    """One Harvey-like component A/(1 + (B*nu)^p); A [ppm^2/uHz], B [1/uHz]."""
    active = (A > 0) & (B > 0)
    safe_B = jnp.where(active, B, 1.0)
    val = A / (1.0 + (safe_B * nu) ** p)
    return jnp.where(active, val, 0.0)


def harvey_1985(nu, A, tc, p):
    """Classic Harvey (1985) profile A*tc/(1 + (2*pi*nu*tc*1e-3)^p) with tc in
    ksec-style units [U]; kept for model-family parity."""
    active = (A > 0) & (tc > 0)
    safe_tc = jnp.where(active, tc, 1.0)
    val = A * safe_tc / (1.0 + (2.0 * jnp.pi * nu * safe_tc * 1e-3) ** p)
    return jnp.where(active, val, 0.0)


def noise_background(nu, noise_params, n_harvey: int = 3, kind: str = "harvey_like"):
    """Full background: n_harvey components + white noise.

    noise_params: flat (3*n_harvey + 1,) = [A1,B1,p1, ..., N0] — the
    reference's 10-entry noise block ABI for n_harvey=3 [U].
    Returns array shaped like nu.
    """
    fn = harvey_like if kind == "harvey_like" else harvey_1985
    total = jnp.zeros_like(nu)
    for k in range(n_harvey):
        A, B, p = (noise_params[3 * k], noise_params[3 * k + 1],
                   noise_params[3 * k + 2])
        total = total + fn(nu, A, B, p)
    white = noise_params[3 * n_harvey]
    return total + jnp.maximum(white, 0.0)
