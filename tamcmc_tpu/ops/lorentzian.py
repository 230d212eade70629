"""Lorentzian mode-profile builders — the hot kernel of the whole engine.

Reference equivalent: `build_lorentzian.cpp — optimum_lorentzian_calc_*` [U]
(SURVEY.md section 2).  The reference evaluates each Lorentzian only inside a
truncation window c*Gamma around its centre (data-dependent loop bounds).
TPU-first redesign: every azimuthal component is evaluated *densely* on the
full static frequency grid and all components are accumulated in one
contraction — no data-dependent shapes, fully fusable by XLA, batched over
(temperature, chain) by vmap.

Profile (with Nigam & Kosovichev 1998-style asymmetry `b`):
    x = 2 (nu - nu0) / Gamma
    L(nu) = H * [(1 + b*x)^2 + b^2] / (1 + x^2)
b = 0 recovers the symmetric Lorentzian H / (1 + x^2).

Performance/memory design (measured on TPU v5e, see git history): naive
autodiff of the (ncomp x N) accumulation saves gigabytes of residuals when
batched over hundreds of walkers (XLA stacks per-scan-step intermediates in
the vjp), OOMing HBM.  `sum_lorentzians` therefore carries an ANALYTIC
custom VJP: forward is a blocked scan with an (N,) accumulator; backward is
one more blocked pass contracting the output cotangent against closed-form
partials.  Peak memory O(_BLOCK * N) per walker, and the backward is cheaper
than an autodiff replay.
"""

import jax
import jax.numpy as jnp

_BLOCK = 8  # components per scan step; peak live memory ~ batch*_BLOCK*N


def lorentzian_profile(nu, height, nu0, width, asym=0.0):
    """Single (possibly asymmetric) Lorentzian on grid `nu`.

    All of (height, nu0, width, asym) may broadcast; width is clamped to a
    small positive floor for differentiability safety.
    """
    w = jnp.maximum(width, 1e-6)
    x = 2.0 * (nu - nu0) / w
    num = (1.0 + asym * x) ** 2 + asym**2
    return height * num / (1.0 + x * x)


def _pad_blocks(a, pad):
    return jnp.pad(a, (0, pad)).reshape(-1, _BLOCK)


def _forward(nu, heights, nu0s, widths, asyms):
    ncomp = heights.shape[0]
    pad = (-ncomp) % _BLOCK
    hb = _pad_blocks(heights, pad)
    cb = _pad_blocks(nu0s, pad)
    wb = jnp.maximum(_pad_blocks(widths, pad), 1e-6)
    bb = _pad_blocks(asyms, pad)

    def body(acc, blk):
        h, c, w, b = blk
        x = 2.0 * (nu[None, :] - c[:, None]) / w[:, None]     # (_BLOCK, N)
        num = (1.0 + b[:, None] * x) ** 2 + (b[:, None]) ** 2
        return acc + jnp.sum(h[:, None] * num / (1.0 + x * x), axis=0), None

    acc, _ = jax.lax.scan(body, jnp.zeros_like(nu), (hb, cb, wb, bb))
    return acc


@jax.custom_vjp
def sum_lorentzians(nu, heights, nu0s, widths, asyms):
    """Accumulate ncomp Lorentzian components on the grid.

    nu: (N,); heights/nu0s/widths/asyms: (ncomp,) -> returns (N,).
    Dense masked evaluation: components with height == 0 contribute exactly 0
    (used for static padding of variable mode counts).
    """
    return _forward(nu, heights, nu0s, widths, asyms)


def _fwd(nu, heights, nu0s, widths, asyms):
    out = _forward(nu, heights, nu0s, widths, asyms)
    return out, (nu, heights, nu0s, widths, asyms)


def _bwd(res, g):
    """Analytic cotangents.  With u=(1+bx)^2+b^2, v=1+x^2, L=h u/v:
      dL/dh = u/v
      dL/dx = h (2b(1+bx) v - 2x u) / v^2,  dx/dc = -2/w, dx/dw = -x/w,
                                            dx/dnu_i = +2/w
      dL/db = h (2x(1+bx) + 2b) / v
    """
    nu, heights, nu0s, widths, asyms = res
    ncomp = heights.shape[0]
    pad = (-ncomp) % _BLOCK
    hb = _pad_blocks(heights, pad)
    cb = _pad_blocks(nu0s, pad)
    wb = jnp.maximum(_pad_blocks(widths, pad), 1e-6)
    bb = _pad_blocks(asyms, pad)

    def body(gnu, blk):
        h, c, w, b = blk                                   # (_BLOCK,)
        x = 2.0 * (nu[None, :] - c[:, None]) / w[:, None]  # (_BLOCK, N)
        one_bx = 1.0 + b[:, None] * x
        u = one_bx**2 + (b[:, None]) ** 2
        v = 1.0 + x * x
        inv_v = 1.0 / v
        dLdh_terms = u * inv_v                              # (_BLOCK, N)
        dLdx = h[:, None] * (2.0 * b[:, None] * one_bx
                             - 2.0 * x * u * inv_v) * inv_v
        dLdb = h[:, None] * (2.0 * x * one_bx + 2.0 * b[:, None]) * inv_v
        gh = jnp.sum(g[None, :] * dLdh_terms, axis=1)       # (_BLOCK,)
        gx = g[None, :] * dLdx
        gc = jnp.sum(gx, axis=1) * (-2.0 / w)
        gw = jnp.sum(gx * (-x), axis=1) / w
        gb = jnp.sum(g[None, :] * dLdb, axis=1)
        gnu = gnu + jnp.sum(gx * (2.0 / w[:, None]), axis=0)
        return gnu, (gh, gc, gw, gb)

    gnu, (gh, gc, gw, gb) = jax.lax.scan(
        body, jnp.zeros_like(nu), (hb, cb, wb, bb))

    def unpad(a):
        return a.reshape(-1)[:ncomp]

    # width clamp: no gradient where the clamp was active
    gw = jnp.where(widths > 1e-6, unpad(gw), 0.0)
    return (gnu, unpad(gh), unpad(gc), gw, unpad(gb))


sum_lorentzians.defvjp(_fwd, _bwd)
