"""Tests for the windowed Lorentzian ops and the Pallas TPU kernel.

The jnp windowed path (`sum_lorentzians_trunc`) runs everywhere and is
tested against a naive masked profile sum.  The Pallas kernel itself needs a
real TPU; under the CPU test fixture (conftest forces JAX_PLATFORMS=cpu) the
dispatch falls back to the jnp path, so the kernel-vs-jnp equivalence test
auto-skips unless a TPU is present (run manually in a TPU session with
TAMCMC_PALLAS_LORENTZ=1).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tamcmc_tpu.ops.lorentzian import sum_lorentzians_trunc, sum_lorentzians
from tamcmc_tpu.ops.pallas_lorentzian import (
    sum_lorentzians_trunc_batched, _tpu_platform)


def _mk(bt=3, nc=7, n=513, seed=0):
    rng = np.random.default_rng(seed)
    nu = jnp.linspace(90.0, 110.0, n)
    H = jnp.asarray(rng.uniform(1, 5, (bt, nc)), jnp.float32)
    C = jnp.asarray(rng.uniform(94, 106, (bt, nc)), jnp.float32)
    W = jnp.asarray(rng.uniform(0.3, 2, (bt, nc)), jnp.float32)
    B = jnp.asarray(rng.uniform(-0.1, 0.1, (bt, nc)), jnp.float32)
    return nu, H, C, W, B


def _naive_masked(nu, H, C, W, B, win):
    w = np.maximum(np.asarray(W), 1e-6)
    x = 2.0 * (np.asarray(nu)[None, None, :] - np.asarray(C)[..., None]) \
        / w[..., None]
    num = (1.0 + np.asarray(B)[..., None] * x) ** 2 + np.asarray(B)[..., None] ** 2
    m = np.abs(np.asarray(nu)[None, None, :] - np.asarray(C)[..., None]) \
        <= np.asarray(win)[..., None]
    return np.sum(np.asarray(H)[..., None] * num / (1 + x * x) * m, axis=-2)


class TestTruncJnp:
    def test_matches_naive_masked(self):
        nu, H, C, W, B = _mk()
        win = 10.0 * W
        got = np.asarray(sum_lorentzians_trunc(nu, H, C, W, B, win))
        want = _naive_masked(nu, H, C, W, B, win)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    def test_inf_window_equals_dense(self):
        nu, H, C, W, B = _mk()
        win = jnp.full_like(W, jnp.inf)
        got = np.asarray(sum_lorentzians_trunc(nu, H, C, W, B, win))
        dense = np.stack([
            np.asarray(sum_lorentzians(nu, H[i], C[i], W[i], B[i]))
            for i in range(H.shape[0])])
        np.testing.assert_allclose(got, dense, rtol=2e-5, atol=1e-5)

    def test_negative_window_is_zero(self):
        nu, H, C, W, B = _mk()
        win = jnp.full_like(W, -1.0)
        got = np.asarray(sum_lorentzians_trunc(nu, H, C, W, B, win))
        assert not np.any(got)

    def test_grad_matches_autodiff_of_naive(self):
        nu, H, C, W, B = _mk(bt=2, nc=5, n=257)
        win = 8.0 * W
        g = jnp.asarray(np.random.default_rng(1).normal(size=(2, 257)),
                        jnp.float32)

        def naive_jnp(H, C, W, B):
            w = jnp.maximum(W, 1e-6)[..., None]
            x = 2.0 * (nu - C[..., None]) / w
            num = (1.0 + B[..., None] * x) ** 2 + B[..., None] ** 2
            m = (jnp.abs(nu - C[..., None]) <= win[..., None])
            return jnp.sum(jnp.where(m, H[..., None] * num / (1 + x * x), 0.0),
                           axis=-2)

        def loss_c(*a):
            return jnp.sum(g * sum_lorentzians_trunc(nu, *a, win))

        def loss_n(*a):
            return jnp.sum(g * naive_jnp(*a))

        gc = jax.grad(loss_c, argnums=(0, 1, 2, 3))(H, C, W, B)
        gn = jax.grad(loss_n, argnums=(0, 1, 2, 3))(H, C, W, B)
        for a, b, name in zip(gc, gn, "H C W B".split()):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-3, atol=3e-4, err_msg=name)

    def test_batched_wrapper_falls_back_on_cpu(self):
        nu, H, C, W, B = _mk()
        win = 10.0 * W
        got = np.asarray(sum_lorentzians_trunc_batched(nu, H, C, W, B, win))
        want = np.asarray(sum_lorentzians_trunc(nu, H, C, W, B, win))
        np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.skipif(not _tpu_platform(), reason="needs a real TPU")
class TestPallasKernel:
    def test_kernel_matches_jnp(self, monkeypatch):
        monkeypatch.setenv("TAMCMC_PALLAS_LORENTZ", "1")
        rng = np.random.default_rng(0)
        Bt, NC, N = 16, 11, 3 * 4096
        nu = jnp.linspace(1000.0, 1400.0, N)
        H = jnp.asarray(rng.uniform(1, 5, (Bt, NC)), jnp.float32)
        C = jnp.asarray(rng.uniform(1050, 1350, (Bt, NC)), jnp.float32)
        W = jnp.asarray(rng.uniform(0.5, 3, (Bt, NC)), jnp.float32)
        B = jnp.asarray(rng.uniform(-0.1, 0.1, (Bt, NC)), jnp.float32)
        win = 40.0 * W
        got = np.asarray(jax.jit(
            lambda *a: sum_lorentzians_trunc_batched(nu, *a))(H, C, W, B, win))
        want = np.asarray(jax.jit(
            lambda *a: sum_lorentzians_trunc(nu, *a))(H, C, W, B, win))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

        g = jnp.asarray(rng.normal(size=(Bt, N)), jnp.float32)

        def mkloss(fn):
            return jax.jit(jax.grad(
                lambda h, c, w, b: jnp.sum(g * fn(nu, h, c, w, b, win)),
                argnums=(0, 1, 2, 3)))

        gp = mkloss(sum_lorentzians_trunc_batched)(H, C, W, B)
        gj = mkloss(sum_lorentzians_trunc)(H, C, W, B)
        for a, b, name in zip(gp, gj, "H C W B".split()):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(b)) + 1e-30
            assert np.max(np.abs(a - b)) / scale < 1e-4, name
