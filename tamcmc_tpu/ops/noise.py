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


def kallinger2014(nu, noise_params, nu_nyquist):
    """Kallinger et al. (2014, A&A 570, A41) granulation background.

    Two super-Lorentzian components with fixed slope 4, each normalised so
    its integral equals the component's rms amplitude squared, all apodised
    by the sinc^2 sampling response, plus white noise:

        N(nu) = eta^2(nu) * sum_i  xi * a_i^2 / b_i / (1 + (nu/b_i)^4) + W
        eta(nu) = sinc(pi/2 * nu/nu_nyq),   xi = 2*sqrt(2)/pi

    noise_params: (5,) = [a1, b1, a2, b2, W] with a in ppm, b in uHz.
    Used by the reference's Kallinger-style background families
    (`noise_models.cpp` [U]; newer TAMCMC versions).
    """
    xi = 2.0 * jnp.sqrt(2.0) / jnp.pi
    eta2 = jnp.sinc(0.5 * nu / nu_nyquist) ** 2   # jnp.sinc(x)=sin(pi x)/(pi x)
    total = jnp.zeros_like(nu)
    for k in range(2):
        a, b = noise_params[2 * k], noise_params[2 * k + 1]
        active = (a > 0) & (b > 0)
        safe_b = jnp.where(active, b, 1.0)
        comp = xi * a ** 2 / safe_b / (1.0 + (nu / safe_b) ** 4)
        total = total + jnp.where(active, comp, 0.0)
    return eta2 * total + jnp.maximum(noise_params[4], 0.0)


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
