"""Distributed-path tests on the 8-fake-device CPU mesh (SURVEY.md section 4
rung 4): sharded step == single-device step, swap collectives correct,
adaptation reductions correct."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tamcmc_tpu.sampler import MALAHyper, init_state, make_beta_ladder
from tamcmc_tpu.sampler.driver import make_phase_runner
from tamcmc_tpu.sampler.analytic import std_gaussian
from tamcmc_tpu.parallel import make_sampler_mesh, shard_state, \
    make_sharded_phase_runner


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake CPU devices (conftest sets XLA flag)")
    return jax.devices()


class TestMesh:
    def test_mesh_shapes(self, eight_devices):
        mesh = make_sampler_mesh(4, 2)
        assert mesh.shape == {"temp": 4, "chain": 2}
        with pytest.raises(ValueError):
            make_sampler_mesh(16, 1)

    def test_shard_state_placement(self, eight_devices):
        p = std_gaussian(3)
        hp = MALAHyper(use_drift=False)
        state = init_state(p, hp, 4, 8, jax.random.PRNGKey(0))
        mesh = make_sampler_mesh(4, 2)
        ss = shard_state(state, mesh)
        from jax.sharding import PartitionSpec as P
        assert len(ss.theta.sharding.device_set) == 8
        assert ss.theta.sharding.spec == P("temp", "chain", None)
        # per-walker adaptation stats shard over BOTH mesh axes (fully local)
        assert ss.mu.sharding.spec == P("temp", "chain", None)
        assert ss.cov.sharding.spec == P("temp", "chain", None, None)


class TestShardedEquivalence:
    @pytest.mark.parametrize("hp", [MALAHyper(use_drift=False, dN_mixing=3),
                                    MALAHyper(use_drift=True, dN_mixing=3)],
                             ids=["rw", "mala"])
    def test_sharded_matches_local(self, eight_devices, hp):
        """The sharded runner must reproduce the single-device trajectory
        (same keys, same math — only the partitioning differs)."""
        p = std_gaussian(3)
        T, C = 4, 8
        betas = make_beta_ladder(T, hp.lambda_temp)
        state = init_state(p, hp, T, C, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(42)

        local = make_phase_runner(p, hp, betas, adapt=True, thin=2, n_emit=10)
        s_local, out_local = local(state, key)

        mesh = make_sampler_mesh(4, 2)
        state2 = init_state(p, hp, T, C, jax.random.PRNGKey(0))
        sharded = make_sharded_phase_runner(p, hp, betas, mesh, adapt=True,
                                            thin=2, n_emit=10)
        s_shard, out_shard = sharded(shard_state(state2, mesh), key)

        np.testing.assert_allclose(np.asarray(out_local["logL"]),
                                   np.asarray(out_shard["logL"]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(s_local.theta),
                                   np.asarray(s_shard.theta),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(s_local.nswap_att),
                                   np.asarray(s_shard.nswap_att), atol=0)

    def test_sharded_matches_local_windowed_pieces(self, eight_devices):
        """The piece-wise chi22p hot path (window-partitioned ms_global:
        disjoint-segment mode sums + per-piece background, quiet-bin sums
        replicated when unbatched) must survive GSPMD partitioning — the
        std_gaussian/single_lorentzian equivalence tests never reach it."""
        import dataclasses
        from tamcmc_tpu.demos import make_demo
        problem, hp0, plan, meta = make_demo("ms_global", seed=0, ngrid=3000,
                                             n_orders=3)
        assert problem._pieces_hook is not None
        hp = dataclasses.replace(hp0, dN_mixing=3)
        T, C = 4, 8
        betas = make_beta_ladder(T, hp.lambda_temp)
        state = init_state(problem, hp, T, C, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(7)

        local = make_phase_runner(problem, hp, betas, adapt=True, thin=2,
                                  n_emit=5)
        s_local, out_local = local(state, key)

        mesh = make_sampler_mesh(4, 2)
        state2 = init_state(problem, hp, T, C, jax.random.PRNGKey(0))
        sharded = make_sharded_phase_runner(problem, hp, betas, mesh,
                                            adapt=True, thin=2, n_emit=5)
        s_shard, out_shard = sharded(shard_state(state2, mesh), key)

        # logL is O(1e4); shard-boundary reduction reordering only
        np.testing.assert_allclose(np.asarray(out_local["logL"]),
                                   np.asarray(out_shard["logL"]),
                                   rtol=3e-5)
        np.testing.assert_allclose(np.asarray(s_local.theta),
                                   np.asarray(s_shard.theta),
                                   rtol=2e-3, atol=2e-3)

    def test_swaps_cross_device_boundaries(self, eight_devices):
        """Rungs live on different devices; swap bookkeeping must still see
        attempts on every adjacent pair."""
        p = std_gaussian(2)
        hp = MALAHyper(use_drift=False, dN_mixing=1)  # swap every step
        T, C = 8, 8
        betas = make_beta_ladder(T, 1.3)
        mesh = make_sampler_mesh(8, 1)
        state = shard_state(init_state(p, hp, T, C, jax.random.PRNGKey(1)), mesh)
        runner = make_sharded_phase_runner(p, hp, betas, mesh, adapt=True,
                                           thin=4, n_emit=5)
        state, outs = runner(state, jax.random.PRNGKey(2))
        att = np.asarray(state.nswap_att)
        assert np.all(att[:-1] > 0), att  # every pair attempted
        assert np.all(np.isfinite(np.asarray(state.theta)))
