"""`tamcmc compare` — the posterior-moment parity harness (SURVEY stage 8,
BASELINE.json "match within MC error" metric)."""
import numpy as np
import pytest

from tamcmc_tpu.diagnostics.compare import (compare_posteriors,
                                            format_comparison,
                                            load_ascii_samples)


def run_cli(argv):
    from tamcmc_tpu.cli import main
    return main(argv)


def _draws(seed, n=4000, shift=0.0, scale=1.0):
    rng = np.random.default_rng(seed)
    s = rng.standard_normal((n, 3)) * scale
    s[:, 0] += 2.0 + shift
    s[:, 1] += -1.0
    s[:, 2] += 0.5
    return s


NAMES = ["alpha", "beta", "gamma"]


class TestCompare:
    def test_same_posterior_consistent(self):
        res = compare_posteriors(_draws(0), NAMES, _draws(1), NAMES)
        assert res["consistent"], format_comparison(res)
        assert res["n_common"] == 3

    def test_mean_shift_detected(self):
        res = compare_posteriors(_draws(0), NAMES,
                                 _draws(1, shift=0.5), NAMES)
        assert not res["consistent"]
        assert res["worst_param"] == "alpha"
        bad = [r for r in res["params"] if not r["ok"]]
        assert [r["name"] for r in bad] == ["alpha"]

    def test_variance_mismatch_detected(self):
        res = compare_posteriors(_draws(0), NAMES,
                                 _draws(1, scale=3.0), NAMES)
        assert not res["consistent"]
        assert all(not r["ok"] for r in res["params"])

    def test_name_intersection_only(self):
        res = compare_posteriors(_draws(0), NAMES,
                                 _draws(1)[:, :2], ["alpha", "beta"])
        assert res["n_common"] == 2

    def test_disjoint_names_raise(self):
        with pytest.raises(ValueError, match="no common"):
            compare_posteriors(_draws(0), NAMES, _draws(1), ["x", "y", "z"])

    def test_autocorrelated_chains_widen_errors(self):
        # an AR(1) chain with the same mean must still be consistent even
        # though naive sqrt(N) errors would flag sampling noise
        rng = np.random.default_rng(3)
        n, rho = 8000, 0.95
        x = np.zeros((n, 3))
        for i in range(1, n):
            x[i] = rho * x[i - 1] + np.sqrt(1 - rho**2) * \
                rng.standard_normal(3)
        x[:, 0] += 2.0; x[:, 1] += -1.0; x[:, 2] += 0.5
        res = compare_posteriors(x, NAMES, _draws(4), NAMES, z_threshold=3.5)
        assert res["consistent"], format_comparison(res)


class TestCLICompare:
    def test_ascii_roundtrip_and_exit_codes(self, tmp_path):
        a, b = tmp_path / "a.txt", tmp_path / "b.txt"
        np.savetxt(a, _draws(0), header=" ".join(NAMES))
        np.savetxt(b, _draws(1), header=" ".join(NAMES))
        s, names = load_ascii_samples(str(a))
        assert names == NAMES and s.shape == (4000, 3)
        run_cli(["compare", str(a), str(b)])           # exit 0
        bad = tmp_path / "c.txt"
        np.savetxt(bad, _draws(2, shift=1.0), header=" ".join(NAMES))
        with pytest.raises(SystemExit) as ei:
            run_cli(["compare", str(a), str(bad)])
        assert ei.value.code == 1

    def test_outdir_vs_its_own_export(self, tmp_path):
        out = tmp_path / "fit"
        run_cli(["run", "--demo", "single_lorentzian", "--outdir", str(out),
                 "--burnin", "100", "--learning", "300", "--acquire", "600",
                 "--thin", "4", "--temps", "2", "--chains", "4",
                 "--no-report"])
        exp = tmp_path / "export.txt"
        run_cli(["export", "--outdir", str(out), "--out", str(exp)])
        run_cli(["compare", str(out), str(exp)])       # identical -> exit 0


class TestAdviceFixes:
    def test_bang_header_ascii(self, tmp_path):
        """'!'-prefixed headers (reference bin2txt convention) must parse in
        BOTH the name scan and the data load (ADVICE r2: loadtxt only skips
        '#' by default and crashed on '!')."""
        p = tmp_path / "ref.txt"
        body = "\n".join(" ".join(f"{v:.6f}" for v in row)
                         for row in _draws(0, n=50))
        p.write_text("! alpha beta gamma\n" + body + "\n")
        s, names = load_ascii_samples(str(p))
        assert names == NAMES and s.shape == (50, 3)

    def test_bin_read_with_chains(self, tmp_path):
        """read_bin_samples(with_chains=True) reshapes via the .hdr's
        Nchains so ESS sees per-walker chains (ADVICE r2: the flat
        interleave overestimates ESS by ~tau)."""
        from tamcmc_tpu.io.outputs import OutputWriter, read_bin_samples
        C, E, D = 4, 30, 3
        w = OutputWriter(str(tmp_path), NAMES, n_temps=2, n_chains=C)
        rng = np.random.default_rng(0)
        recs = rng.standard_normal((E, C, D))
        w.append_chunk("A", {"theta0": recs})
        w.close()
        flat, names = read_bin_samples(str(tmp_path), "A")
        assert flat.shape == (E * C, D)
        cube, names = read_bin_samples(str(tmp_path), "A", with_chains=True)
        assert cube.shape == (E, C, D)
        np.testing.assert_allclose(cube, recs, rtol=1e-12)
