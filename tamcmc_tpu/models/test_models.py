"""Analytic smoke-test models.

Reference equivalents: `model_Test_Gaussian`, `model_Harvey_Gaussian`
(`models.cpp` [U]; SURVEY.md section 4 — these exist precisely to sanity-check
the sampler against targets with known shape).  Also `model_single_lorentzian`
— BASELINE.json config 1's "single Lorentzian + white noise".
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tamcmc_tpu.utils.blocks import BlockLayout
from tamcmc_tpu.ops.lorentzian import lorentzian_profile
from tamcmc_tpu.ops.noise import noise_background


@dataclasses.dataclass(frozen=True)
class TestGaussianSpec:
    """params: [A, mu, sigma, white]."""
    def layout(self):
        return BlockLayout.make([("gauss", 3), ("noise", 1)])


def build_test_gaussian(spec: TestGaussianSpec):
    layout = spec.layout()

    def model_fn(params, nu):
        A, mu, sig = params[..., 0], params[..., 1], params[..., 2]
        white = jnp.maximum(params[..., 3], 0.0)
        s = jnp.maximum(sig, 1e-6)
        return A * jnp.exp(-0.5 * ((nu - mu) / s) ** 2) + white

    return model_fn, layout


@dataclasses.dataclass(frozen=True)
class HarveyGaussianSpec:
    """params: [A1,B1,p1, ..., white] + [Ag, mug, sigg]  (noise-first, like
    the reference's Harvey_Gaussian ordering [U])."""
    n_harvey: int = 1

    def layout(self):
        return BlockLayout.make([("noise", 3 * self.n_harvey + 1),
                                 ("gauss", 3)])


def build_harvey_gaussian(spec: HarveyGaussianSpec):
    layout = spec.layout()

    def model_fn(params, nu):
        noise = layout.get(params, "noise")
        g = layout.get(params, "gauss")
        A, mu, sig = g[..., 0], g[..., 1], jnp.maximum(g[..., 2], 1e-6)
        bg = noise_background(nu, noise, n_harvey=spec.n_harvey)
        return bg + A * jnp.exp(-0.5 * ((nu - mu) / sig) ** 2)

    return model_fn, layout


@dataclasses.dataclass(frozen=True)
class SingleLorentzianSpec:
    """BASELINE config 1: one Lorentzian + white noise.
    params: [H, nu0, Gamma, white]."""
    def layout(self):
        return BlockLayout.make([("mode", 3), ("noise", 1)])


def build_single_lorentzian(spec: SingleLorentzianSpec):
    layout = spec.layout()

    def model_fn(params, nu):
        H, nu0, W = params[..., 0], params[..., 1], params[..., 2]
        white = jnp.maximum(params[..., 3], 1e-9)
        return lorentzian_profile(nu, H, nu0, W) + white

    return model_fn, layout


@dataclasses.dataclass(frozen=True)
class HarveyBackgroundSpec:
    """BASELINE config 2: pure noise-background fit (3 Harvey + white).
    params: [A1,B1,p1, A2,B2,p2, A3,B3,p3, N0]."""
    n_harvey: int = 3

    def layout(self):
        return BlockLayout.make([("noise", 3 * self.n_harvey + 1)])


def build_harvey_background(spec: HarveyBackgroundSpec):
    layout = spec.layout()

    def model_fn(params, nu):
        return noise_background(nu, layout.get(params, "noise"),
                                n_harvey=spec.n_harvey)

    return model_fn, layout


@dataclasses.dataclass(frozen=True)
class Kallinger2014Spec:
    """Kallinger et al. (2014) two-component granulation background plus an
    optional Gaussian p-mode envelope (reference: Kallinger-style background
    families in newer TAMCMC versions [U]).

    params: [a1, b1, a2, b2, W] (+ [Agauss, numax, sigma] if with_gaussian).
    """
    nu_nyquist: float = 283.2       # Kepler long cadence [uHz]
    with_gaussian: bool = True

    def layout(self):
        spec = [("noise", 5)]
        if self.with_gaussian:
            spec.append(("gauss", 3))
        return BlockLayout.make(spec)


def build_kallinger2014(spec: Kallinger2014Spec):
    from tamcmc_tpu.ops.noise import kallinger2014
    layout = spec.layout()

    def model_fn(params, nu):
        bg = kallinger2014(nu, layout.get(params, "noise"), spec.nu_nyquist)
        if spec.with_gaussian:
            g = layout.get(params, "gauss")
            A, numax, sig = g[..., 0], g[..., 1], g[..., 2]
            sig = jnp.maximum(sig, 1e-3)
            bg = bg + A * jnp.exp(-0.5 * ((nu - numax) / sig) ** 2)
        return bg

    return model_fn, layout
