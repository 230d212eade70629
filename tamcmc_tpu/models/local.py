"""MS local model family — windowed fits with per-mode free parameters.

Reference equivalent: `model_MS_local_basic` / `io_local.cpp` [U]
(SURVEY.md section 2).  Unlike the global family, every mode of every degree
carries its own free (height, frequency, width); only the rotation law,
inclination and the (locally ~flat) noise are shared.

Block ABI:
  height_l{0..3} (N_l,)   per-mode heights
  freq_l{0..3}   (N_l,)   per-mode frequencies [uHz]
  width_l{0..3}  (N_l,)   per-mode widths [uHz]
  rot            (2,)     [a1, asym]
  noise          (1,)     local white-noise level
  inclination    (1,)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tamcmc_tpu.utils.blocks import BlockLayout
from tamcmc_tpu.ops.visibilities import mode_visibility
from tamcmc_tpu.ops.rotation import split_frequencies_a1etaa3
from tamcmc_tpu.ops.lorentzian import sum_lorentzians


@dataclasses.dataclass(frozen=True)
class MSLocalSpec:
    n_per_l: tuple          # mode counts for l = 0..3

    def layout(self) -> BlockLayout:
        spec = []
        n = tuple(self.n_per_l) + (0,) * (4 - len(self.n_per_l))
        for l in range(4):
            spec.append((f"height_l{l}", n[l]))
        for l in range(4):
            spec.append((f"freq_l{l}", n[l]))
        for l in range(4):
            spec.append((f"width_l{l}", n[l]))
        spec += [("rot", 2), ("noise", 1), ("inclination", 1)]
        return BlockLayout.make(spec)


def build_ms_local(spec: MSLocalSpec):
    layout = spec.layout()
    n = tuple(spec.n_per_l) + (0,) * (4 - len(spec.n_per_l))

    def model_fn(params, nu):
        rot = layout.get(params, "rot")
        a1, asym = rot[..., 0], rot[..., 1]
        inc = layout.get(params, "inclination")[..., 0]
        white = jnp.maximum(layout.get(params, "noise")[..., 0], 1e-9)
        hs, cs, ws, bs = [], [], [], []
        for l in range(4):
            if n[l] == 0:
                continue
            h_l = layout.get(params, f"height_l{l}")
            f_l = layout.get(params, f"freq_l{l}")
            w_l = layout.get(params, f"width_l{l}")
            eps = mode_visibility(l, inc)
            nus = split_frequencies_a1etaa3(l, f_l, a1, 0.0, 0.0)
            H = h_l[:, None] * eps[None, :]
            W = jnp.broadcast_to(w_l[:, None], nus.shape)
            B = jnp.broadcast_to(asym, nus.shape)
            hs.append(H.reshape(-1)); cs.append(nus.reshape(-1))
            ws.append(W.reshape(-1)); bs.append(B.reshape(-1))
        modes = sum_lorentzians(nu, jnp.concatenate(hs), jnp.concatenate(cs),
                                jnp.concatenate(ws), jnp.concatenate(bs))
        return modes + white

    return model_fn, layout


@dataclasses.dataclass(frozen=True)
class MSLocalHnlmSpec:
    """Local fit with free azimuthal height ratios (reference
    `model_MS_local_Hnlm` [U]): instead of deriving the (l, m) component
    powers from a single inclination via visibilities, each degree carries a
    free per-|m| height-factor vector (symmetric in +-m).  Used for stars
    where magnetism/activity breaks the standard inclination law.

    Extra block ABI vs basic:
      hfactor_l{1..3} (l+1,)  relative power of |m| = 0..l components
    and NO inclination block.
    """
    n_per_l: tuple

    def layout(self) -> BlockLayout:
        spec = []
        n = tuple(self.n_per_l) + (0,) * (4 - len(self.n_per_l))
        for l in range(4):
            spec.append((f"height_l{l}", n[l]))
        for l in range(4):
            spec.append((f"freq_l{l}", n[l]))
        for l in range(4):
            spec.append((f"width_l{l}", n[l]))
        for l in range(1, 4):
            spec.append((f"hfactor_l{l}", (l + 1) if n[l] else 0))
        spec += [("rot", 2), ("noise", 1)]
        return BlockLayout.make(spec)


def build_ms_local_hnlm(spec: MSLocalHnlmSpec):
    layout = spec.layout()
    n = tuple(spec.n_per_l) + (0,) * (4 - len(spec.n_per_l))

    def model_fn(params, nu):
        rot = layout.get(params, "rot")
        a1, asym = rot[..., 0], rot[..., 1]
        white = jnp.maximum(layout.get(params, "noise")[..., 0], 1e-9)
        hs, cs, ws, bs = [], [], [], []
        for l in range(4):
            if n[l] == 0:
                continue
            h_l = layout.get(params, f"height_l{l}")
            f_l = layout.get(params, f"freq_l{l}")
            w_l = layout.get(params, f"width_l{l}")
            if l == 0:
                eps = jnp.ones((1,), dtype=h_l.dtype)
            else:
                # free |m| factors, mirrored to m = -l..l
                hf = layout.get(params, f"hfactor_l{l}")      # (l+1,)
                eps = jnp.concatenate([hf[::-1], hf[1:]])     # (2l+1,)
            nus = split_frequencies_a1etaa3(l, f_l, a1, 0.0, 0.0)
            H = h_l[:, None] * eps[None, :]
            W = jnp.broadcast_to(w_l[:, None], nus.shape)
            B = jnp.broadcast_to(asym, nus.shape)
            hs.append(H.reshape(-1)); cs.append(nus.reshape(-1))
            ws.append(W.reshape(-1)); bs.append(B.reshape(-1))
        modes = sum_lorentzians(nu, jnp.concatenate(hs), jnp.concatenate(cs),
                                jnp.concatenate(ws), jnp.concatenate(bs))
        return modes + white

    return model_fn, layout
