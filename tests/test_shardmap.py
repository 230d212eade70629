"""Explicit shard_map + ppermute runner (parallel/shardmap_runner.py):
the GSPMD fallback of SURVEY.md section 5.8 / round-3 VERDICT weak #3.

Properties asserted:
  * mesh-shape invariance: 1x1 == 8x1 BITWISE (temp-only sharding; the
    per-walker fold_in draw protocol makes trajectories independent of the
    partitioning, so the collectives are proven exactly, not statistically)
  * walker-sharded meshes run and agree with temp-sharded up to f32
    reduction reordering in the cross-walker pmean
  * swap bookkeeping crosses shard boundaries
  * statistical agreement with the GSPMD runner on an analytic target
    (different RNG streams -> distributional equivalence is the contract)
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tamcmc_tpu.sampler import init_state, make_beta_ladder, MALAHyper
from tamcmc_tpu.sampler.analytic import std_gaussian
from tamcmc_tpu.parallel.mesh import make_sampler_mesh
from tamcmc_tpu.parallel.sharded import shard_state
from tamcmc_tpu.parallel.shardmap_runner import make_shardmap_phase_runner


@pytest.fixture
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (fake) devices")
    return jax.devices()[:8]


def _run(problem, hp, betas, T, C, nt, nc, thin=3, n_emit=4, seed=0,
         key=7, adapt=True):
    mesh = make_sampler_mesh(nt, nc, devices=jax.devices()[: nt * nc])
    st = shard_state(init_state(problem, hp, T, C, jax.random.PRNGKey(seed)),
                     mesh)
    r = make_shardmap_phase_runner(problem, hp, betas, mesh, adapt=adapt,
                                   thin=thin, n_emit=n_emit)
    st, outs = r(st, jax.random.PRNGKey(key))
    return jax.device_get(st), jax.device_get(outs)


class TestMeshInvariance:
    @pytest.mark.parametrize("hp", [MALAHyper(use_drift=False, dN_mixing=2),
                                    MALAHyper(use_drift=True, dN_mixing=2)],
                             ids=["rw", "mala"])
    def test_1x1_equals_8x1_bitwise(self, eight_devices, hp):
        p = std_gaussian(3)
        T, C = 8, 4
        betas = make_beta_ladder(T, 1.5)
        s1, o1 = _run(p, hp, betas, T, C, 1, 1)
        s8, o8 = _run(p, hp, betas, T, C, 8, 1)
        for field in ("theta", "logL", "logP", "mu", "cov", "log_sigma",
                      "nswap_att", "nswap_acc", "naccept"):
            np.testing.assert_array_equal(
                np.asarray(getattr(s1, field)),
                np.asarray(getattr(s8, field)), err_msg=field)
        for k in o1:
            np.testing.assert_array_equal(np.asarray(o1[k]),
                                          np.asarray(o8[k]), err_msg=k)

    def test_walker_sharded_close(self, eight_devices):
        """2x4 (walker-sharded): cross-walker pmean reassociates f32 sums,
        so agreement is allclose, not bitwise."""
        p = std_gaussian(3)
        hp = MALAHyper(use_drift=True, dN_mixing=2)
        T, C = 8, 8
        betas = make_beta_ladder(T, 1.5)
        s1, o1 = _run(p, hp, betas, T, C, 1, 1)
        s24, o24 = _run(p, hp, betas, T, C, 2, 4)
        np.testing.assert_allclose(np.asarray(s1.theta),
                                   np.asarray(s24.theta),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(o1["logL"]),
                                   np.asarray(o24["logL"]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(s1.nswap_att),
                                      np.asarray(s24.nswap_att))


class TestSwapsAcrossBoundaries:
    def test_every_pair_attempted(self, eight_devices):
        p = std_gaussian(2)
        hp = MALAHyper(use_drift=False, dN_mixing=1)
        T, C = 8, 4
        betas = make_beta_ladder(T, 1.3)
        st, outs = _run(p, hp, betas, T, C, 8, 1, thin=4, n_emit=5)
        att = np.asarray(st.nswap_att)
        assert np.all(att[:-1] > 0), att
        acc = np.asarray(st.nswap_acc)
        assert np.all(acc <= att + 1e-6)
        assert np.all(np.isfinite(np.asarray(st.theta)))

    def test_swap_cadence_respected(self, eight_devices):
        """dN_mixing gates the (masked) swap: total attempts per rung must
        equal the number of swap events where the rung was the low member,
        exactly as the local tempering_swap counts them."""
        p = std_gaussian(2)
        hp = MALAHyper(use_drift=False, dN_mixing=3)
        T, C = 4, 4
        betas = make_beta_ladder(T, 1.4)
        # 24 raw steps -> swap events at steps 3,6,...,24 = 8 events,
        # alternating parity: 4 even sweeps (rungs 0,2 low) + 4 odd
        # (rung 1 low)
        st, _ = _run(p, hp, betas, T, C, 4, 1, thin=6, n_emit=4)
        att = np.asarray(st.nswap_att)
        np.testing.assert_allclose(att, [4.0, 4.0, 4.0, 0.0])


class TestAgainstGSPMD:
    def test_statistical_agreement_and_record_shapes(self, eight_devices):
        """Same algorithm, different (mesh-invariant) RNG streams: the two
        runners must agree in distribution.  Run both on a standard
        Gaussian, compare cold-rung moments + acceptance; records must be
        shape/key compatible (the driver treats them interchangeably)."""
        from tamcmc_tpu.parallel.sharded import make_sharded_phase_runner
        p = std_gaussian(2)
        hp = MALAHyper(use_drift=True, dN_mixing=5)
        T, C = 4, 16
        betas = make_beta_ladder(T, 1.6)
        mesh = make_sampler_mesh(4, 2)

        def both(maker):
            st = shard_state(
                init_state(p, hp, T, C, jax.random.PRNGKey(0)), mesh)
            warm = maker(p, hp, betas, mesh, True, 2, 100)
            st, _ = warm(st, jax.random.PRNGKey(1))
            acq = maker(p, hp, betas, mesh, False, 2, 400)
            st, outs = acq(st, jax.random.PRNGKey(2))
            return jax.device_get(st), jax.device_get(outs)

        s_g, o_g = both(make_sharded_phase_runner)
        s_s, o_s = both(make_shardmap_phase_runner)
        assert set(o_g) == set(o_s)
        for k in o_g:
            assert np.asarray(o_g[k]).shape == np.asarray(o_s[k]).shape, k
        flat_g = o_g["theta0"][100:].reshape(-1, 2)
        flat_s = o_s["theta0"][100:].reshape(-1, 2)
        # N(0,1) target: means near 0, stds near 1, and the two runners
        # agree with each other within MC error
        assert np.all(np.abs(flat_g.mean(0) - flat_s.mean(0)) < 0.15)
        assert np.all(np.abs(flat_g.std(0) - flat_s.std(0)) < 0.15)
        acc_g = np.asarray(o_g["acc_rate"])[-1]
        acc_s = np.asarray(o_s["acc_rate"])[-1]
        assert np.all(np.abs(acc_g - acc_s) < 0.2), (acc_g, acc_s)


class TestDriverIntegration:
    def test_run_phase_runner_kind(self, eight_devices):
        from tamcmc_tpu.sampler.driver import run_phase
        p = std_gaussian(2)
        hp = MALAHyper(use_drift=False, dN_mixing=2)
        T, C = 4, 4
        betas = make_beta_ladder(T, 1.5)
        mesh = make_sampler_mesh(4, 1)
        st = shard_state(init_state(p, hp, T, C, jax.random.PRNGKey(0)),
                         mesh)
        st, outs = run_phase(p, hp, betas, st, jax.random.PRNGKey(1),
                             n_steps=40, adapt=True, thin=2, chunk=10,
                             mesh=mesh, runner_kind="shardmap")
        assert outs["theta0"].shape == (20, C, 2)
        assert np.all(np.isfinite(outs["theta0"]))


class TestAutoEstimatorGlobalResolution:
    def test_chain_sharded_auto_estimator_matches_unsharded(self,
                                                            eight_devices):
        """MALAHyper(cov_estimator='auto') must resolve from the GLOBAL
        walker count: with Df=5 and C=8, 2*C=16 >= 5 selects the ensemble
        estimator, but a 1x4 chain-sharded mesh has only c_loc=2 per shard
        (2*2=4 < 5) — resolving locally would silently switch adaptation
        algorithms per mesh shape (round-4 review finding).  Covariance
        trajectories must agree across shardings."""
        p = std_gaussian(5)
        hp = MALAHyper(use_drift=False, dN_mixing=3, cov_estimator="auto")
        T, C = 2, 8
        betas = make_beta_ladder(T, 1.5)
        s11, _ = _run(p, hp, betas, T, C, 1, 1, thin=5, n_emit=6)
        s14, _ = _run(p, hp, betas, T, C, 1, 4, thin=5, n_emit=6)
        np.testing.assert_allclose(np.asarray(s11.cov),
                                   np.asarray(s14.cov),
                                   rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(np.asarray(s11.mu),
                                   np.asarray(s14.mu),
                                   rtol=2e-4, atol=2e-6)
