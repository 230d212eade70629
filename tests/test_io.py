"""IO layer tests: spectrum files, problem files, binary outputs round-trip,
checkpoint/resume bitwise determinism (SURVEY.md section 5.4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tamcmc_tpu.io.data import read_spectrum, write_spectrum
from tamcmc_tpu.io.problemfile import (read_problem_file, write_problem_file,
                                       read_reference_model)
from tamcmc_tpu.io.outputs import OutputWriter, read_bin_samples
from tamcmc_tpu.io.checkpoint import save_checkpoint, load_checkpoint
from tamcmc_tpu.stats.priors import PriorTable, PriorKind


class TestSpectrumIO:
    def test_ascii_roundtrip(self, tmp_path):
        nu = np.linspace(1, 100, 64); pw = np.random.default_rng(0).exponential(2, 64)
        p = tmp_path / "s.data"
        write_spectrum(str(p), nu, pw)
        d = read_spectrum(str(p))
        np.testing.assert_allclose(d["nu"], nu, rtol=1e-10)
        np.testing.assert_allclose(d["power"], pw, rtol=1e-10)

    def test_npz_roundtrip_with_sigma(self, tmp_path):
        nu = np.linspace(1, 10, 8); pw = np.ones(8); sg = np.full(8, 0.1)
        p = tmp_path / "s.npz"
        write_spectrum(str(p), nu, pw, sigma=sg)
        d = read_spectrum(str(p))
        np.testing.assert_allclose(d["sigma"], sg)

    def test_comments_skipped(self, tmp_path):
        p = tmp_path / "c.data"
        p.write_text("# header\n! gnuplot comment\n1.0 2.0\n2.0 3.0\n")
        d = read_spectrum(str(p))
        assert d["nu"].tolist() == [1.0, 2.0]


class TestProblemFile:
    def test_roundtrip(self, tmp_path):
        priors = PriorTable.from_rows([
            ("H", "jeffreys", 0.5, 100.0),
            ("nu0", "uniform", 30.0, 70.0),
            ("W", "fix"),
            ("N0", "gaussian", 1.0, 0.2),
        ])
        p0 = np.asarray([8.0, 48.0, 3.0, 1.5])
        f = tmp_path / "prob.toml"
        write_problem_file(str(f), "model_Single_Lorentzian", p0, priors,
                           likelihood="chi22p", data="s.data",
                           freq_range=(10.0, 90.0))
        cfg = read_problem_file(str(f))
        assert cfg["model"] == "model_Single_Lorentzian"
        assert cfg["likelihood"] == "chi22p"
        assert cfg["freq_range"] == [10.0, 90.0]
        np.testing.assert_allclose(cfg["params0"], p0)
        np.testing.assert_array_equal(cfg["priors"].kinds, priors.kinds)
        np.testing.assert_allclose(cfg["priors"].hypers, priors.hypers)

    def test_spec_kwargs(self, tmp_path):
        f = tmp_path / "p.toml"
        f.write_text('[problem]\nmodel = "model_MS_Global_a1etaa3_HarveyLike"\n'
                     '[spec]\nn_per_l = [3, 3, 0, 0]\n')
        cfg = read_problem_file(str(f))
        assert cfg["spec_kwargs"]["n_per_l"] == (3, 3, 0, 0)

    def test_reference_format_raises_regrounding(self):
        with pytest.raises(NotImplementedError):
            read_reference_model("whatever.model")


class TestOutputs:
    def test_bin_hdr_roundtrip(self, tmp_path):
        w = OutputWriter(str(tmp_path), ["a", "b", "c"], n_temps=2, n_chains=4)
        rng = np.random.default_rng(0)
        chunks = []
        for _ in range(3):
            outs = {"theta0": rng.normal(size=(5, 4, 3)),
                    "logL": rng.normal(size=(5, 2, 4)),
                    "logP0": rng.normal(size=(5, 4)),
                    "log_sigma": rng.normal(size=(5, 2)),
                    "acc_rate": rng.uniform(size=(5, 2)),
                    "mu0": rng.normal(size=(5, 3))}
            chunks.append(outs)
            w.append_chunk("A", outs)
        w.close()
        samples, names = read_bin_samples(str(tmp_path), "A")
        assert names == ["a", "b", "c"]
        want = np.concatenate([c["theta0"].reshape(20, 3) for c in chunks])
        np.testing.assert_allclose(samples, want, rtol=1e-12)
        z = np.load(tmp_path / "A_chains.npz")
        assert z["logL"].shape == (15, 2, 4)


class TestCheckpoint:
    def test_roundtrip_and_bitwise_resume(self, tmp_path):
        from tamcmc_tpu.sampler import (init_state, MALAHyper, mala_step,
                                        make_beta_ladder)
        from tamcmc_tpu.sampler.analytic import std_gaussian
        p = std_gaussian(3)
        hp = MALAHyper(use_drift=False)
        betas = make_beta_ladder(2, hp.lambda_temp)
        key = jax.random.PRNGKey(0)
        s = init_state(p, hp, 2, 4, key)
        s = mala_step(p, hp, betas, s, jax.random.PRNGKey(1))
        ck = tmp_path / "restore.npz"
        save_checkpoint(str(ck), s, jax.random.PRNGKey(2), phase="L",
                        meta={"n_steps": 100})
        s2, key2, phase, meta = load_checkpoint(str(ck))
        assert phase == "L"
        assert int(meta["n_steps"]) == 100
        np.testing.assert_array_equal(np.asarray(s.theta), np.asarray(s2.theta))
        np.testing.assert_array_equal(np.asarray(s.cov), np.asarray(s2.cov))
        # bitwise-deterministic continuation from restored state
        a = mala_step(p, hp, betas, s, key2)
        b = mala_step(p, hp, betas, s2, key2)
        np.testing.assert_array_equal(np.asarray(a.theta), np.asarray(b.theta))
        np.testing.assert_array_equal(np.asarray(a.logL), np.asarray(b.logL))
