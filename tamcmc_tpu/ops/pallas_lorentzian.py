"""Pallas TPU kernel for the windowed Lorentzian accumulation.

Reference equivalent: `build_lorentzian.cpp — optimum_lorentzian_calc_*` [U]
evaluates each mode only inside |nu - nu0| <= trunc * Gamma (data-dependent
loop bounds over the frequency array).  This kernel reproduces that
optimization TPU-style: static shapes, data-dependent *time*.

Design (measured on TPU v5e — see git history for the experiments):

  * the frequency grid is split into LANE-sized tiles; per component a
    `lax.fori_loop` with *traced* bounds visits only the tiles its window
    overlaps (bounds precomputed on host from the uniform grid in float64 —
    estimating the bin spacing from adjacent float32 values is 1e-2-relative
    wrong at Kepler frequencies and silently drops edge tiles);
  * the batch axis rides the VPU sublanes, 8 walkers per program, each
    program owning its walker-group's full grid in VMEM;
  * inside an overlapped tile the window edge is enforced per bin, so
    results match the jnp reference path (`sum_lorentzians_trunc`) exactly;
  * the component loop is a *static python unroll* — Mosaic cannot prove
    dynamic lane-dimension column reads aligned, so traced component
    indices do not lower;
  * backward pass: same tile-skipping loop accumulating the six masked
    reductions of the factored closed forms (ops/lorentzian.py).

STATUS — honest measurement (TPU v5e): XLA's dense fused path already
saturates the VPU (a hand-written dense Pallas kernel measured within 8%),
and the per-tile loop overhead of this windowed kernel (~900 cycles per
(component, tile) iteration against ~400 of useful vector work) cancels the
window-skipping gains even at 14% window coverage on a 120k-bin grid
(measured 14.8 ms vs 15.1 ms forward, backward slightly slower).  The
kernel is therefore OPT-IN: set TAMCMC_PALLAS_LORENTZ=1 to enable.  It is
kept (with correctness tests vs the jnp path) as the starting point for
revisiting when Mosaic's dynamic-bound loop overhead improves, or for
problems with far sparser windows.

Round-3 addendum (2026-08-21): a second, fully fused packed-segment
model+likelihood kernel was prototyped (walkers on lanes, 8-row comp
blocks with dynamic per-tile ranges via scalar prefetch, hardware
`pl.reciprocal` + one Newton step; TB 128-1024 sweep, comp-block unroll
8/16, broadcast hoisting, pairwise-reciprocal variants).  Best: ~95 G
comp-bins/s — below XLA's 90-138 G on identical work.  Root cause
measured directly: Mosaic-generated elementwise code issues ~1 vector
op/cycle on this toolchain (a raw in-kernel fma fori_loop sustains ~9 G
elem-ops/s) while XLA's own fusions reach ~4 ops/cycle (7.7 TFLOP/s with
8 independent fma streams).  The windowing advantage this kernel was
built for is now captured at the XLA level by the static segment
partition (ops/lorentzian.py partition_window_groups +
likelihood_chi22p_pieces), so there is no remaining structural edge for
a hand kernel to claim until Mosaic's issue rate improves.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tamcmc_tpu.ops.lorentzian import sum_lorentzians_trunc, _WFLOOR

LANE = 4096          # grid bins per tile (multiple of 128)
SUBLANES = 8         # walkers per program


def _round_up(x, m):
    return (x + m - 1) // m * m


def _recip(v):
    r = pl.reciprocal(v, approx=True)
    return r * (2.0 - v * r)        # one Newton step: ~2e-5 relative


# ---------------------------------------------------------------------------
# kernels (component loop statically unrolled; tile loop dynamically bounded)
# ---------------------------------------------------------------------------

def _fwd_kernel(nc, tlo_ref, thi_ref, nu_ref, h_ref, c_ref, iw_ref,
                hb2_ref, hbb_ref, win_ref, out_ref):
    gid = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)
    for k in range(nc):
        h = h_ref[:, k:k + 1]
        c = c_ref[:, k:k + 1]
        iw = iw_ref[:, k:k + 1]
        hb2 = hb2_ref[:, k:k + 1]
        hbb = hbb_ref[:, k:k + 1]
        win = win_ref[:, k:k + 1]

        def tile_body(t, _):
            off = pl.multiple_of(t * LANE, LANE)
            nu_t = nu_ref[0:1, pl.ds(off, LANE)]
            d = nu_t - c
            x = d * iw
            m = (jnp.abs(d) <= win).astype(jnp.float32)
            inv = _recip(1.0 + x * x)
            out_ref[:, pl.ds(off, LANE)] += (hbb + (h + hb2 * x) * inv) * m
            return 0

        jax.lax.fori_loop(tlo_ref[gid, k], thi_ref[gid, k], tile_body, 0)


def _bwd_kernel(nc, tlo_ref, thi_ref, nu_ref, g_ref, h_ref, c_ref, iw_ref,
                b_ref, win_ref, gh_ref, gc_ref, gw_ref, gb_ref):
    gid = pl.program_id(0)
    zcol = jnp.zeros((SUBLANES, 1), jnp.float32)
    for k in range(nc):
        h = h_ref[:, k:k + 1]
        c = c_ref[:, k:k + 1]
        iw = iw_ref[:, k:k + 1]
        b = b_ref[:, k:k + 1]
        win = win_ref[:, k:k + 1]
        hb2 = 2.0 * h * b

        def tile_body(t, acc):
            Gk, Su, Sp, Sq, Sr, Ss = acc
            off = pl.multiple_of(t * LANE, LANE)
            nu_t = nu_ref[0:1, pl.ds(off, LANE)]
            d = nu_t - c
            x = d * iw
            m = (jnp.abs(d) <= win).astype(jnp.float32)
            inv = _recip(1.0 + x * x)
            gm = g_ref[:, pl.ds(off, LANE)] * m
            u = gm * inv
            p = x * u
            q = p * inv
            r = x * q
            s = x * r
            return (Gk + jnp.sum(gm, axis=1, keepdims=True),
                    Su + jnp.sum(u, axis=1, keepdims=True),
                    Sp + jnp.sum(p, axis=1, keepdims=True),
                    Sq + jnp.sum(q, axis=1, keepdims=True),
                    Sr + jnp.sum(r, axis=1, keepdims=True),
                    Ss + jnp.sum(s, axis=1, keepdims=True))

        Gk, Su, Sp, Sq, Sr, Ss = jax.lax.fori_loop(
            tlo_ref[gid, k], thi_ref[gid, k], tile_body,
            (zcol, zcol, zcol, zcol, zcol, zcol))

        gh_ref[:, k:k + 1] = b * b * Gk + Su + 2.0 * b * Sp
        gb_ref[:, k:k + 1] = hb2 * Gk + 2.0 * h * Sp
        dx = hb2 * Su - 2.0 * h * Sq - 2.0 * hb2 * Sr
        dxx = hb2 * Sp - 2.0 * h * Sr - 2.0 * hb2 * Ss
        gc_ref[:, k:k + 1] = -iw * dx
        # dL/dw = -(Sum g x dL/dx)/w = -dxx * (iw/2)
        gw_ref[:, k:k + 1] = -dxx * iw * 0.5


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _grid_geometry(nu_np):
    """(nu0, dbin) in float64 — bin spacing from the endpoints, never from
    adjacent float32 values (cumulative tile-bound error otherwise)."""
    n = nu_np.shape[0]
    nu0 = float(nu_np[0])
    dbin = (float(nu_np[-1]) - nu0) / (n - 1)
    return nu0, dbin


def _prep(nu_np, H, C, W, B, win):
    Bt, NC = H.shape
    G = _round_up(Bt, SUBLANES) // SUBLANES
    padb = G * SUBLANES - Bt
    N = nu_np.shape[0]
    NP = _round_up(N, LANE)
    NT = NP // LANE
    nu0, dbin = _grid_geometry(nu_np)
    nu_pad = jnp.asarray(
        np.concatenate([nu_np,
                        (nu_np[-1] + dbin * np.arange(1, NP - N + 1))
                        .astype(np.float32)]).reshape(1, NP))

    def padp(a, val):
        return jnp.pad(a, ((0, padb), (0, 0)), constant_values=val) \
            if padb else a

    Hp = padp(H, 0.0)
    Cp = padp(C, nu0)
    Wp = padp(jnp.maximum(W, _WFLOOR), 1.0)
    Bp = padp(B, 0.0)
    winp = padp(win, -1.0)          # negative window -> zero tiles visited

    # tile bounds (exclusive hi) with a one-bin safety margin, group-reduced
    scale = 1.0 / (dbin * LANE)
    lo = (Cp - winp - (nu0 + dbin)) * scale
    hi = (Cp + winp - (nu0 - dbin)) * scale
    tlo = jnp.clip(jnp.floor(lo), 0, NT).astype(jnp.int32)
    thi = jnp.clip(jnp.floor(hi) + 1, 0, NT).astype(jnp.int32)
    empty = winp < 0
    tlo = jnp.where(empty, NT, tlo).reshape(G, SUBLANES, NC).min(axis=1)
    thi = jnp.where(empty, 0, thi).reshape(G, SUBLANES, NC).max(axis=1)
    return (G, NP, nu_pad, Hp, Cp, Wp, Bp, winp, tlo, thi, Bt, N)


def _pallas_fwd_call(nu_np, H, C, W, B, win):
    (G, NP, nu_pad, Hp, Cp, Wp, Bp, winp, tlo, thi, Bt, N) = \
        _prep(nu_np, H, C, W, B, win)
    NC = Hp.shape[1]
    pspec = pl.BlockSpec((SUBLANES, NC), lambda g: (g, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)      # whole array
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, NC),
        grid=(G,),
        in_specs=[sspec, sspec,
                  pl.BlockSpec((1, NP), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
                  pspec, pspec, pspec, pspec, pspec, pspec],
        out_specs=pl.BlockSpec((SUBLANES, NP), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * SUBLANES, NP), jnp.float32),
    )(tlo, thi, nu_pad, Hp, Cp, 2.0 / Wp, 2.0 * Hp * Bp, Hp * Bp * Bp, winp)
    return out[:Bt, :N]


def _pallas_bwd_call(nu_np, H, C, W, B, win, g):
    (G, NP, nu_pad, Hp, Cp, Wp, Bp, winp, tlo, thi, Bt, N) = \
        _prep(nu_np, H, C, W, B, win)
    NC = Hp.shape[1]
    gp = jnp.pad(g, ((0, G * SUBLANES - Bt), (0, NP - N)))
    pspec = pl.BlockSpec((SUBLANES, NC), lambda g_: (g_, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    oshape = jax.ShapeDtypeStruct((G * SUBLANES, NC), jnp.float32)
    gh, gc, gw, gb = pl.pallas_call(
        functools.partial(_bwd_kernel, NC),
        grid=(G,),
        in_specs=[sspec, sspec,
                  pl.BlockSpec((1, NP), lambda g_: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((SUBLANES, NP), lambda g_: (g_, 0),
                               memory_space=pltpu.VMEM),
                  pspec, pspec, pspec, pspec, pspec],
        out_specs=(pspec, pspec, pspec, pspec),
        out_shape=(oshape, oshape, oshape, oshape),
    )(tlo, thi, nu_pad, gp, Hp, Cp, 2.0 / Wp, Bp, winp)
    gw = jnp.where(W > _WFLOOR, gw[:Bt], 0.0)
    return gh[:Bt], gc[:Bt], gw, gb[:Bt]


def _make_pallas_op(nu_np):
    """Build the custom-vjp op closed over the concrete grid."""

    @jax.custom_vjp
    def op(H, C, W, B, win):
        return _pallas_fwd_call(nu_np, H, C, W, B, win)

    def fwd(H, C, W, B, win):
        return op(H, C, W, B, win), (H, C, W, B, win)

    def bwd(res, g):
        H, C, W, B, win = res
        gh, gc, gw, gb = _pallas_bwd_call(nu_np, H, C, W, B, win, g)
        return gh, gc, gw, gb, jnp.zeros_like(win)

    op.defvjp(fwd, bwd)
    return op


_GRIDS = {}


@functools.lru_cache(maxsize=32)
def _cached_op(nu_key):
    return _make_pallas_op(_GRIDS[nu_key])


def _tpu_platform():
    try:
        d = jax.devices()[0]
    except Exception:
        return False
    return d.platform == "tpu" or "TPU" in (getattr(d, "device_kind", "") or "")


def _grid_ok(nu):
    """Pallas path needs a concrete, uniform, ascending grid (>= 2 tiles)."""
    try:
        nu_np = np.asarray(nu, dtype=np.float32)
    except Exception:
        return None
    if nu_np.ndim != 1 or nu_np.shape[0] < 2 * LANE:
        return None
    nu0, dbin = _grid_geometry(nu_np)
    if dbin <= 0:
        return None
    ideal = nu0 + dbin * np.arange(nu_np.shape[0])
    # tolerance: a fraction of a bin PLUS the float32 ulp of the values —
    # a uniform grid cast to f32 wobbles by ~ulp(|nu|), which at Kepler
    # p-mode frequencies already exceeds 1% of the bin spacing
    tol = 0.05 * dbin + 4.0 * np.finfo(np.float32).eps * np.abs(nu_np).max()
    if np.max(np.abs(nu_np - ideal)) > tol:
        return None
    return nu_np


def _enabled(n_bins):
    return os.environ.get("TAMCMC_PALLAS_LORENTZ", "").strip() == "1"


def sum_lorentzians_trunc_batched(nu, H, C, W, B, win):
    """Batched windowed Lorentzian sum: params (Bt, NC), nu (N,) -> (Bt, N).

    Dispatch: tile-skipping Pallas kernel on TPU for wide uniform grids
    (where window-skipping beats XLA's dense fusion — see module docstring);
    otherwise the jnp custom-vjp path with identical semantics."""
    if H.ndim == 2 and _enabled(nu.shape[-1]) and _tpu_platform():
        nu_np = _grid_ok(nu)
        if nu_np is not None:
            key = (float(nu_np[0]), float(nu_np[-1]), nu_np.shape[0])
            _GRIDS[key] = nu_np
            return _cached_op(key)(H, C, W, B, win)
    return sum_lorentzians_trunc(nu, H, C, W, B, win)
