"""Provisional reference `.model` format (io/reference.py).

VERDICT round-1 item 4: a semantic reader for the reference's setup-file
format, round-tripped against our own exporter and fuzz-tested on malformed
rows — ready for byte-level re-grounding the day /root/reference is
populated (SURVEY.md section 5.6)."""
import numpy as np
import pytest

from tamcmc_tpu.io.reference import (read_model_provisional,
                                     write_model_provisional)
from tamcmc_tpu.stats.priors import PriorTable, PriorKind


GOOD = """\
! demo setup
!model_fullname= model_Single_Lorentzian
!likelihood= chi22p
!data= spectrum.data
!fit_range= 10.0 90.0
H      8.0  1  Jeffreys  0.5 100.0
nu0   48.0  1  Uniform   30.0 70.0
width  3.0  1  Jeffreys  0.2 20.0
white  1.5  0  Fix
"""


def test_read_good(tmp_path):
    p = tmp_path / "a.model"
    p.write_text(GOOD)
    cfg = read_model_provisional(str(p))
    assert cfg["model"] == "model_Single_Lorentzian"
    assert cfg["likelihood"] == "chi22p"
    assert cfg["data"] == "spectrum.data"
    assert cfg["freq_range"] == (10.0, 90.0)
    np.testing.assert_allclose(cfg["params0"], [8.0, 48.0, 3.0, 1.5])
    pri = cfg["priors"]
    assert list(pri.kinds) == [int(PriorKind.JEFFREYS), int(PriorKind.UNIFORM),
                               int(PriorKind.JEFFREYS), int(PriorKind.FIX)]
    assert pri.names == ("H", "nu0", "width", "white")
    assert list(pri.free_mask) == [True, True, True, False]


def test_relax_zero_freezes_regardless_of_prior(tmp_path):
    p = tmp_path / "a.model"
    p.write_text("!model_fullname= m\n"
                 "x  1.0  0  Gaussian  1.0 0.1\n"
                 "y  2.0  1  Gaussian  2.0 0.1\n")
    cfg = read_model_provisional(str(p))
    assert list(cfg["priors"].kinds) == [int(PriorKind.FIX),
                                         int(PriorKind.GAUSSIAN)]


def test_anonymous_rows(tmp_path):
    p = tmp_path / "a.model"
    p.write_text("!model_fullname= m\n"
                 "5.0  1  Uniform  0.0 10.0\n"
                 "1.0  0  Fix\n")
    cfg = read_model_provisional(str(p))
    assert cfg["priors"].names == ("p0", "p1")
    np.testing.assert_allclose(cfg["params0"], [5.0, 1.0])


def test_spec_kwargs(tmp_path):
    p = tmp_path / "a.model"
    p.write_text("!model_fullname= m\n"
                 "!spec.n_per_l= 13 13 13 0\n"
                 "!spec.rotation= aj\n"
                 "x 1.0 0 Fix\n")
    cfg = read_model_provisional(str(p))
    assert cfg["spec_kwargs"]["n_per_l"] == (13, 13, 13, 0)
    assert cfg["spec_kwargs"]["rotation"] == "aj"


def test_round_trip(tmp_path):
    """Our exporter's output reads back identically — the parity fixture."""
    pri = PriorTable.from_rows([
        ("H", "jeffreys", 0.5, 100.0),
        ("nu0", "gaussian", 50.0, 1.0),
        ("w", "gug", 0.1, 5.0, 0.05, 2.0),
        ("ug", "uniform_gaussian", 0.0, 1.0, 0.2),
        ("fixed", "fix"),
    ])
    p0 = np.asarray([8.0, 48.0, 3.0, 0.5, 1.5])
    path = tmp_path / "rt.model"
    write_model_provisional(str(path), "model_Single_Lorentzian", p0, pri,
                            data="d.data", freq_range=(1.0, 2.0),
                            spec_kwargs={"n_per_l": (3, 3, 0, 0)})
    cfg = read_model_provisional(str(path))
    np.testing.assert_array_equal(cfg["params0"], p0)
    np.testing.assert_array_equal(cfg["priors"].kinds, pri.kinds)
    # hypers round-trip exactly for the meaningful columns of each kind
    for i in range(pri.ndim):
        kind = PriorKind(int(pri.kinds[i]))
        from tamcmc_tpu.io.reference import _N_HYPERS
        nh = _N_HYPERS[kind]
        np.testing.assert_array_equal(cfg["priors"].hypers[i][:nh],
                                      pri.hypers[i][:nh])
    assert cfg["priors"].names == pri.names
    assert cfg["spec_kwargs"]["n_per_l"] == (3, 3, 0, 0)
    assert cfg["freq_range"] == (1.0, 2.0)


class TestFuzzMalformed:
    def _expect(self, tmp_path, body, match):
        p = tmp_path / "bad.model"
        p.write_text(body)
        with pytest.raises(ValueError, match=match):
            read_model_provisional(str(p))

    def test_missing_model_name(self, tmp_path):
        self._expect(tmp_path, "x 1.0 1 Uniform 0 1\n", "model_fullname")

    def test_no_rows(self, tmp_path):
        self._expect(tmp_path, "!model_fullname= m\n", "no parameter rows")

    def test_bad_value(self, tmp_path):
        self._expect(tmp_path, "!model_fullname= m\nx abc 1 Uniform 0 1\n",
                     "row needs|non-numeric")

    def test_bad_relax(self, tmp_path):
        self._expect(tmp_path, "!model_fullname= m\nx 1.0 2 Uniform 0 1\n",
                     "relax flag")

    def test_unknown_prior(self, tmp_path):
        self._expect(tmp_path, "!model_fullname= m\nx 1.0 1 Cauchy 0 1\n",
                     "unknown prior")

    def test_missing_hypers(self, tmp_path):
        self._expect(tmp_path, "!model_fullname= m\nx 1.0 1 GUG 0 1\n",
                     "needs 4 hyperparameters")

    def test_too_many_hypers(self, tmp_path):
        self._expect(tmp_path,
                     "!model_fullname= m\nx 1.0 1 Uniform 0 1 2 3 4\n",
                     "at most 4")

    def test_short_row(self, tmp_path):
        self._expect(tmp_path, "!model_fullname= m\nx 1.0\n", "row needs")

    def test_bad_header_key(self, tmp_path):
        self._expect(tmp_path, "!model_fullname= m\n!bogus= 3\nx 1.0 0 Fix\n",
                     "unknown header key")

    def test_bad_fit_range(self, tmp_path):
        self._expect(tmp_path,
                     "!model_fullname= m\n!fit_range= 1.0\nx 1.0 0 Fix\n",
                     "fit_range")

    def test_error_cites_line_number(self, tmp_path):
        p = tmp_path / "bad.model"
        p.write_text("!model_fullname= m\nok 1.0 0 Fix\nx 1.0 7 Uniform 0 1\n")
        with pytest.raises(ValueError, match=r"bad\.model:3"):
            read_model_provisional(str(p))


def test_cli_runs_model_file(tmp_path):
    """End-to-end: a .model setup drives a real (tiny) fit through the CLI."""
    import jax
    import jax.numpy as jnp
    from tamcmc_tpu.models import build_model
    from tamcmc_tpu.io.data import write_spectrum
    from tamcmc_tpu.cli import main

    fn, _ = build_model("model_Single_Lorentzian")
    nu = np.linspace(10.0, 90.0, 2048)
    truth = jnp.asarray([12.0, 50.0, 2.0, 1.0])
    spec = np.asarray(fn(truth, jnp.asarray(nu, jnp.float32))) * \
        np.random.default_rng(0).exponential(size=nu.shape)
    write_spectrum(str(tmp_path / "spectrum.data"), nu, spec)
    (tmp_path / "star.model").write_text(GOOD)
    out = tmp_path / "fit"
    main(["run", "--problem", str(tmp_path / "star.model"),
          "--outdir", str(out), "--temps", "2", "--chains", "4",
          "--burnin", "50", "--learning", "100", "--acquire", "100",
          "--thin", "5", "--no-report"])
    assert (out / "summary.json").exists()
    import json
    rows = json.loads((out / "summary.json").read_text())
    assert [r["name"] for r in rows] == ["H", "nu0", "width"]
    nu0 = [r for r in rows if r["name"] == "nu0"][0]
    assert abs(nu0["median"] - 50.0) < 1.0
