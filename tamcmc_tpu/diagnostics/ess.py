"""Effective sample size via integrated autocorrelation time.

The headline throughput metric of the rebuild is effective-samples/s/chip
(BASELINE.md); the reference has no equivalent (console acceptance prints
only — SURVEY.md section 5.1).  Host-side numpy: runs on thinned chains after
device_get, never in the hot path.

Method: FFT autocorrelation per walker, Geyer initial-positive-sequence
truncation, tau_int = 1 + 2 sum rho_k; ESS = N_total / tau_int.
"""

from __future__ import annotations

import numpy as np


def _acf_1d(x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    x = x - x.mean()
    nfft = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, nfft)
    acov = np.fft.irfft(f * np.conj(f), nfft)[:n].real
    if acov[0] <= 0:
        return np.zeros(n)
    return acov / acov[0]


def autocorr_time(chain: np.ndarray) -> float:
    """chain: (N,) or (N, W) samples (W independent walkers).
    Returns integrated autocorrelation time tau (>= 1)."""
    if chain.ndim == 1:
        chain = chain[:, None]
    n, w = chain.shape
    rho = np.mean([_acf_1d(chain[:, j]) for j in range(w)], axis=0)
    # Geyer (1992) initial positive sequence: tau = 2*sum(Gamma_m) - 1 with
    # Gamma_m = rho[2m] + rho[2m+1], truncated at the first Gamma_m <= 0.
    npair = n // 2
    gam = rho[0:2 * npair:2] + rho[1:2 * npair:2]
    s = 0.0
    for g in gam:
        if g <= 0:
            break
        s += g
    return max(float(2.0 * s - 1.0), 1.0)


def effective_sample_size(chain: np.ndarray) -> float:
    """chain: (N,) or (N, W). ESS = N*W / tau."""
    if chain.ndim == 1:
        chain = chain[:, None]
    n, w = chain.shape
    return n * w / autocorr_time(chain)
