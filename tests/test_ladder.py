"""Adaptive temperature ladder (sampler/ladder.py, beyond-reference switch).

Vousden et al. (2016) dynamic temperature selection: between-chunk host
updates of the (T,) betas toward uniform pair swap acceptance, Learning
only, frozen in Acquire; betas are a traced runner argument so updates
cost zero recompiles.
"""
import json

import numpy as np
import pytest
import jax

from tamcmc_tpu.sampler.ladder import update_ladder, pair_acceptance


class TestLadderMath:
    def test_uniform_acceptance_is_fixed_point(self):
        betas = 1.0 / 1.5 ** np.arange(5)
        att = np.array([10.0, 10, 10, 10, 0])
        acc = 0.4 * att
        new = update_ladder(betas, att, acc, step_index=1)
        np.testing.assert_allclose(new, betas, rtol=1e-12)

    def test_unequal_acceptance_moves_spacing(self):
        """Pair 0 accepting more than pair 1 means rungs 0-1 are too close
        relative to 1-2: the update must WIDEN gap 0 against gap 1 (rung 1's
        temperature rises)."""
        betas = 1.0 / 1.5 ** np.arange(4)
        att = np.array([10.0, 10, 10, 0])
        acc = np.array([9.0, 1.0, 5.0, 0])         # A = [0.9, 0.1, 0.5]
        new = update_ladder(betas, att, acc, step_index=1)
        temps_old = 1.0 / betas
        temps_new = 1.0 / new
        gaps_old = np.diff(temps_old)
        gaps_new = np.diff(temps_new)
        assert gaps_new[0] / gaps_old[0] > gaps_new[1] / gaps_old[1]
        # structural invariants: cold rung pinned, betas valid + descending
        assert new[0] == 1.0
        assert np.all(np.diff(new) < 0)
        assert np.all(new > 0)

    def test_gain_decays(self):
        betas = 1.0 / 1.5 ** np.arange(4)
        att = np.array([10.0, 10, 10, 0])
        acc = np.array([9.0, 1.0, 5.0, 0])
        d1 = np.abs(update_ladder(betas, att, acc, 1) - betas).max()
        d100 = np.abs(update_ladder(betas, att, acc, 100) - betas).max()
        assert d100 < d1 / 5

    def test_unattempted_pairs_neutral(self):
        a = pair_acceptance(np.array([0.0, 10, 0]), np.array([0.0, 5, 0]))
        np.testing.assert_allclose(a, [0.5, 0.5])

    def test_tiny_ladder_untouched(self):
        betas = np.array([1.0, 0.5])
        new = update_ladder(betas, np.array([5.0, 0]), np.array([2.0, 0]), 1)
        np.testing.assert_array_equal(new, betas)


class TestLadderIntegration:
    def test_run_phase_adapts_then_freezes(self):
        from tamcmc_tpu.demos import make_demo
        from tamcmc_tpu.sampler import init_state, make_beta_ladder
        from tamcmc_tpu.sampler.driver import run_phase
        import dataclasses
        problem, hp, _plan, _meta = make_demo("single_lorentzian", seed=0)
        hp = dataclasses.replace(hp, adapt_ladder=True, dN_mixing=2)
        T, C = 4, 4
        betas0 = np.asarray(make_beta_ladder(T, hp.lambda_temp),
                            dtype=np.float64)
        ladder = {"betas": betas0.copy(), "updates": 0,
                  "last_att": np.zeros(T), "last_acc": np.zeros(T)}
        key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        state = init_state(problem, hp, T, C, sub)
        key, sub = jax.random.split(key)
        state, _ = run_phase(problem, hp, betas0, state, sub, 200,
                             adapt=True, thin=4, chunk=10, ladder=ladder)
        assert ladder["updates"] == 5            # one per chunk
        assert not np.allclose(ladder["betas"], betas0)
        assert ladder["betas"][0] == 1.0
        assert np.all(np.diff(ladder["betas"]) < 0)
        frozen = ladder["betas"].copy()
        key, sub = jax.random.split(key)
        state, outs = run_phase(problem, hp, betas0, state, sub, 80,
                                adapt=False, thin=4, chunk=10, ladder=ladder)
        np.testing.assert_array_equal(ladder["betas"], frozen)  # Acquire: frozen
        assert np.all(np.isfinite(outs["theta0"]))

    def test_mesh_rejected(self):
        from tamcmc_tpu.demos import make_demo
        from tamcmc_tpu.sampler import init_state, make_beta_ladder
        from tamcmc_tpu.sampler.driver import run_phase
        problem, hp, _plan, _meta = make_demo("single_lorentzian", seed=0)
        from tamcmc_tpu.parallel.mesh import make_sampler_mesh
        mesh = make_sampler_mesh(2, 1)
        with pytest.raises(ValueError, match="local-runner only"):
            run_phase(problem, hp, np.ones(2), None, jax.random.PRNGKey(0),
                      10, mesh=mesh, ladder={"betas": np.ones(2)})


class TestLadderCLI:
    def test_cli_adapt_ladder(self, tmp_path, capsys):
        from tamcmc_tpu.cli import main as cli_main
        out = tmp_path / "fit"
        cli_main(["run", "--demo", "single_lorentzian", "--outdir", str(out),
                  "--adapt-ladder", "--temps", "4", "--chains", "4",
                  "--burnin", "80", "--learning", "240", "--acquire", "160",
                  "--thin", "4", "--chunk", "10", "--dn-mixing", "2",
                  "--no-report"])
        from tamcmc_tpu.sampler import make_beta_ladder
        geo = np.asarray(make_beta_ladder(4, 1.4))
        final = np.load(out / "betas.npy")
        assert final.shape == geo.shape
        assert not np.allclose(final, geo)       # the ladder actually moved
        events = [json.loads(l) for l in open(out / "metrics.jsonl")]
        lf = [e for e in events if e["event"] == "ladder_final"]
        assert lf and lf[0]["updates"] > 0
        # the evidence tool must integrate over the FINAL (frozen) ladder
        # the acquire chains were actually sampled at — betas.npy is
        # rewritten after the fit precisely for this consumer
        from tamcmc_tpu.cli import main as cli_main2
        cli_main2(["evidence", "--outdir", str(out),
                   "--json", str(out / "evidence.json")])
        ev = json.load(open(out / "evidence.json"))
        assert np.isfinite(ev["logZ"])
        np.testing.assert_allclose(sorted(ev["betas_sorted"]),
                                   sorted(final.tolist()), rtol=1e-5)
