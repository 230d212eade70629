"""Sampler state pytree and hyperparameters.

Reference equivalent: the mutable per-chain members of `MALA`/`Model_def`
(`MALA.h`, `model_def.h` [U]; SURVEY.md section 2 "Adaptive MALA sampler").
TPU-first redesign: ALL tempered chains and walkers live as leading array
axes (T = temperatures, C = walkers per temperature, Df = free dims) of one
immutable pytree carried through `lax.scan`.  Adaptation statistics
(mu, cov, sigma) are PER TEMPERATURE (they stay with the rung across swaps —
standard adaptive-parallel-tempering practice; SURVEY.md section 3.5 flags
this as the parity-sensitive choice to re-verify against the C++).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import flax.struct

from tamcmc_tpu.utils.constants import TARGET_ACCEPTANCE


@flax.struct.dataclass
class SamplerState:
    theta: jnp.ndarray       # (T, C, Df) positions in free-param space
    logL: jnp.ndarray        # (T, C) untempered log-likelihood
    logP: jnp.ndarray        # (T, C) log-prior
    gradL: jnp.ndarray       # (T, C, Df) d logL / d theta
    gradP: jnp.ndarray       # (T, C, Df) d logP / d theta
    mu: jnp.ndarray          # (T, Df) adaptive proposal mean
    cov: jnp.ndarray         # (T, Df, Df) adaptive proposal covariance
    chol: jnp.ndarray        # (T, Df, Df) cholesky(cov + eps I)
    log_sigma: jnp.ndarray   # (T,) adaptive global scale (log)
    step: jnp.ndarray        # () global iteration counter (adaptation clock)
    naccept: jnp.ndarray     # (T,) accepted proposals (summed over walkers /C)
    nprop: jnp.ndarray       # () proposals per (t, c) slot
    acc_rate: jnp.ndarray    # (T,) smoothed instantaneous acceptance rate
    nswap_att: jnp.ndarray   # (T,) swap attempts of pair (t, t+1); last row 0
    nswap_acc: jnp.ndarray   # (T,) accepted swaps of pair (t, t+1)


@dataclasses.dataclass(frozen=True)
class MALAHyper:
    """Static hyperparameters of the Atchade (2006) adaptive scheme.

    Reference equivalents are the MALA section of `config_default.cfg`
    (epsilon1/epsilon2/A1/delta/delta_x ... [U]); names here are descriptive.
    """
    target_acceptance: float = TARGET_ACCEPTANCE
    use_drift: bool = True          # False -> adaptive RW-Metropolis (the
                                    # reference's default operating mode [U])
    drift_delta: float = 1000.0     # Atchade truncation bound on |grad|
    gain_c0: float = 1.0            # gamma_k = c0 / (k0 + k)^alpha
    gain_k0: float = 10.0
    gain_alpha: float = 0.6
    eps_cov: float = 1e-8           # ridge added before cholesky
    dN_chol: int = 10               # refresh chol(Sigma) every K adapt steps:
                                    # small-matrix Cholesky is latency-bound
                                    # on TPU; mu/Sigma still update every step
    log_sigma_min: float = -15.0    # Atchade projection bounds on the scale
    log_sigma_max: float = 4.0
    sigma0_scale: float = 1.0       # initial sigma = 2.38/sqrt(Df) * this
    dN_mixing: int = 10             # tempering swap cadence (reference name)
    lambda_temp: float = 1.4        # geometric ladder T_k = lambda^k
    acc_smooth: float = 0.02        # EMA factor for reported acceptance
