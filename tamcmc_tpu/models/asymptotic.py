"""RGB / subgiant asymptotic model family — dense l=1 mixed modes.

Reference equivalent: `model_RGB_asympt_*` (`models.cpp` + `external/ARMM`
[U]; SURVEY.md section 2): l=0/2 p-modes are fitted individually while the
l=1 forest of mixed modes is GENERATED from the asymptotic period-spacing
relation (DPi1, eps_g, q) solved by the ARMM solver; each mixed mode's width
and rotational splitting are scaled by its g-mode inertia fraction zeta.

Conventions used here (re-ground against bump_DP.cpp when readable):
  width_1(nu)  = W_p(nu) * (1 - zeta)        (p-dominated modes stay wide)
  height_1(nu) — a documented PARITY SWITCH (spec.height_kind), like the
  sigma-estimator switch in sampler/state.py:
    "equipartition" (default)  H_1 = H_p * V^2_1
        A^2 ~ (1-zeta) (work done in the envelope) and Gamma ~ (1-zeta)
        cancel in H = 2 A^2 / (pi Gamma): resolved-mode limit.
    "inertia"                  H_1 = H_p * V^2_1 * (1 - zeta)
        the height itself carries the mode-inertia suppression — the
        bump_DP-style profile for g-dominated / unresolved modes [U];
        g-dominated modes become LOW and narrow instead of tall and narrow.
  splitting    = m * (zeta * a1_core / 2 + (1 - zeta) * a1_env)
                 (1/2 = dipole g-mode Ledoux constant)

Block ABI:
  heights (N0,)  visibilities (2,) [V^2_1, V^2_2]
  freq_l0 (N0,)  freq_l2 (N0,)
  mixed (6,)     [DPi1 s, eps_g, q, delta0l uHz, alpha_p, alpha_g]
                 delta0l: l=1 p-ridge small separation; alpha_p: O(2)
                 curvature of the radial comb; alpha_g: period-spacing
                 curvature — the bump_DP-depth asymptotics [U]; all three
                 default to 0 (Fix) for the first-order relation
  rot (3,)       [a1_env, a1_core, asym]
  widths (N0,)   noise (3nh+1,)  inclination (1,)  trunc (1,)

Dnu and eps_p for the solver come from an IN-GRAPH least-squares line fit of
freq_l0 against radial order (differentiable, so the mixed-mode forest moves
smoothly with the sampled l=0 frequencies).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tamcmc_tpu.utils.blocks import BlockLayout
from tamcmc_tpu.ops.lorentzian import sum_lorentzians
from tamcmc_tpu.ops.noise import noise_background
from tamcmc_tpu.ops.visibilities import mode_visibility
from tamcmc_tpu.ops.armm import mixed_mode_frequencies
from tamcmc_tpu.models.common import interp_monotonic


@dataclasses.dataclass(frozen=True)
class RGBAsymptSpec:
    n_orders: int               # l=0 (and l=2) radial orders
    numin: float                # mixed-mode search window (static)
    numax_win: float
    n_p_poles: int              # static pole-count pads (ops.armm.count_poles)
    n_g_poles: int
    n_harvey: int = 3
    width_kind: str = "free"    # "free" (per-order) or "app2016" (6-param
                                # relation; reference *_AppWidth_* variants)
    height_kind: str = "equipartition"  # or "inertia": H_1 *= (1 - zeta) —
                                # see the module docstring parity switch
    noise_kind: str = "harvey_like"     # or "harvey_1985" (reference
                                # *_Harvey1985 name segment [U])
    per_mode: str = "none"      # per-mixed-mode freedom (reference RGB
                                # _v2/_v3 bump_DP variants [U]):
                                #   "none"       pure asymptotic forest
                                #   "hw"         + per-mode height/width
                                #                FACTOR tables (x1 = exact
                                #                asymptotic values)
                                #   "hw_scatter" + per-mode frequency
                                #                scatter [uHz] (0 = exact)
                                # neutral values reproduce the "none" model
                                # bit-for-bit, so these are pure supersets:
                                # fit a real forest that deviates from the
                                # clean relation by freeing the tables.

    @property
    def n_mixed(self) -> int:
        """Static padded mixed-mode count (ops.armm solver output size)."""
        return self.n_p_poles + self.n_g_poles - 1

    def layout(self) -> BlockLayout:
        n0 = self.n_orders
        nw = n0 if self.width_kind == "free" else 6
        spec = [
            ("heights", n0), ("visibilities", 2),
            ("freq_l0", n0), ("freq_l2", n0),
            ("mixed", 6), ("rot", 3),
            ("widths", nw), ("noise", 3 * self.n_harvey + 1),
            ("inclination", 1), ("trunc", 1),
        ]
        # per-mode blocks APPEND so every existing block keeps its offset
        # (window hints / priors / demos built for "none" stay valid)
        if self.per_mode in ("hw", "hw_scatter"):
            spec += [("mix_hfact", self.n_mixed), ("mix_wfact", self.n_mixed)]
        if self.per_mode == "hw_scatter":
            spec += [("mix_fshift", self.n_mixed)]
        if self.per_mode not in ("none", "hw", "hw_scatter"):
            raise ValueError(f"unknown per_mode {self.per_mode!r}")
        return BlockLayout.make(spec)


def build_rgb_asympt(spec: RGBAsymptSpec):
    layout = spec.layout()
    n0 = spec.n_orders

    def model_fn(params, nu):
        heights = layout.get(params, "heights")
        widths = layout.get(params, "widths")
        if spec.width_kind == "app2016":
            from tamcmc_tpu.ops.widths import appourchaux2016_width
            f0_w = layout.get(params, "freq_l0")
            widths = appourchaux2016_width(
                f0_w, widths[..., 0], widths[..., 1], widths[..., 2],
                widths[..., 3], widths[..., 4], widths[..., 5])
        vis = layout.get(params, "visibilities")
        f0 = layout.get(params, "freq_l0")
        f2 = layout.get(params, "freq_l2")
        dpi1, eps_g, q, delta0l, alpha_p, alpha_g = (
            layout.get(params, "mixed")[..., i] for i in range(6))
        a1_env, a1_core, asym = (layout.get(params, "rot")[..., i]
                                 for i in range(3))
        inc = layout.get(params, "inclination")[..., 0]
        noise = layout.get(params, "noise")

        # in-graph Dnu / eps_p from the l=0 ridge (least squares on order)
        k = jnp.arange(n0, dtype=f0.dtype)
        kbar = jnp.mean(k)
        fbar = jnp.mean(f0)
        dnu = jnp.sum((k - kbar) * (f0 - fbar)) / jnp.sum((k - kbar) ** 2)
        dnu = jnp.maximum(dnu, 0.1)
        intercept = fbar - dnu * kbar
        eps_p = jnp.mod(intercept / dnu, 1.0)

        hs, cs, ws, bs = [], [], [], []
        # l = 0: individual p modes
        eps0 = mode_visibility(0, inc)
        hs.append(heights * eps0[0]); cs.append(f0)
        ws.append(widths); bs.append(jnp.broadcast_to(asym, f0.shape))
        # l = 2: individual p modes, no splitting beyond a1_env (small): use
        # simple m-splitting by a1_env
        eps2 = mode_visibility(2, inc)
        m2 = jnp.arange(-2, 3, dtype=f0.dtype)
        h2 = interp_monotonic(f2, f0, heights) * vis[..., 1]
        w2 = interp_monotonic(f2, f0, widths)
        nus2 = f2[:, None] + m2 * a1_env
        hs.append((h2[:, None] * eps2[None, :]).reshape(-1))
        cs.append(nus2.reshape(-1))
        ws.append(jnp.broadcast_to(w2[:, None], nus2.shape).reshape(-1))
        bs.append(jnp.broadcast_to(asym, (5 * f2.shape[0],)))
        # l = 1: asymptotic mixed-mode forest
        f1, zeta, valid = mixed_mode_frequencies(
            dnu, eps_p, dpi1, eps_g, q, spec.numin, spec.numax_win,
            spec.n_p_poles, spec.n_g_poles,
            delta0l=delta0l, alpha_p=alpha_p, alpha_g=alpha_g)
        if spec.per_mode == "hw_scatter":
            # per-mode frequency scatter: displace each mixed mode AFTER
            # the solver (zeta keeps its asymptotic value at the solved
            # frequency — the scatter models forest irregularity, not a
            # different coupling; bump_DP _v3-style freedom [U]).  Applied
            # before the height/width interpolation so the displaced
            # frequency is used consistently everywhere downstream.
            f1 = f1 + layout.get(params, "mix_fshift")
        h1 = interp_monotonic(f1, f0, heights) * vis[..., 0] * valid
        if spec.height_kind == "inertia":
            h1 = h1 * (1.0 - zeta)
        elif spec.height_kind != "equipartition":
            raise ValueError(f"unknown height_kind {spec.height_kind!r}")
        w1 = jnp.maximum(interp_monotonic(f1, f0, widths) * (1.0 - zeta), 0.005)
        if spec.per_mode in ("hw", "hw_scatter"):
            # multiplicative per-mode tables relative to the asymptotic
            # prediction: x1 is the exact asymptotic value, so a fit can
            # free only the modes that visibly deviate (priors keep the
            # rest Fixed at 1)
            h1 = h1 * layout.get(params, "mix_hfact")
            w1 = jnp.maximum(w1 * layout.get(params, "mix_wfact"), 0.005)
        split = zeta * a1_core / 2.0 + (1.0 - zeta) * a1_env
        eps1 = mode_visibility(1, inc)
        m1 = jnp.arange(-1, 2, dtype=f0.dtype)
        nus1 = f1[:, None] + m1 * split[:, None]
        hs.append((h1[:, None] * eps1[None, :]).reshape(-1))
        cs.append(nus1.reshape(-1))
        ws.append(jnp.broadcast_to(w1[:, None], nus1.shape).reshape(-1))
        bs.append(jnp.broadcast_to(asym, (3 * f1.shape[0],)))

        modes = sum_lorentzians(nu, jnp.concatenate(hs), jnp.concatenate(cs),
                                jnp.concatenate(ws), jnp.concatenate(bs))
        return modes + noise_background(nu, noise, n_harvey=spec.n_harvey,
                                        kind=spec.noise_kind)

    return model_fn, layout
