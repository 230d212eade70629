"""Provisional reference `.cfg` trio (io/refconfig.py).

VERDICT round-2 item 4: provisional semantic readers for config_default /
config_presets / errors_default, round-tripped against our exporters,
fuzz-tested on malformed input, and wired end-to-end: a reference-style
workflow (presets rows -> per-star fits with phase plans) runs from
.cfg + .model files alone (SURVEY.md section 2 "Config system", 5.6)."""
import numpy as np
import pytest

from tamcmc_tpu.io.refconfig import (
    read_config_default_provisional, read_config_presets_provisional,
    read_errors_default_provisional, scales_from_errors,
    write_config_default_provisional, write_config_presets_provisional,
    write_errors_default_provisional)


GOOD_DEFAULT = """\
! provisional master config
[data]
data_dir= ./spectra
[models]
model_fullname= model_Single_Lorentzian
likelihood= chi22p
[MALA]
Nchains= 4            ; rungs
Nwalkers= 6
lambda_temp= 1.5
dN_mixing= 8
target_acceptance= 0.3
use_drift= 0
c0= 2.0               ; reference alias of gain_c0
[outputs]
thin= 5
ckpt_every= 2
"""

GOOD_PRESETS = """\
! id    model_file     Bi   Li   Ai   action  outdir
star0   s0.model      100  200  300   BLA     fit0  seed=3
star1   s1.model      100  200  300   A       fit1  temps=2 chains=4
"""

GOOD_ERRORS = """\
! param  sigma
nu0          0.25
width        0.5
default_rel  0.02
"""


class TestConfigDefault:
    def test_read_good(self, tmp_path):
        p = tmp_path / "config_default.cfg"
        p.write_text(GOOD_DEFAULT)
        cfg = read_config_default_provisional(str(p))
        assert cfg["data_dir"] == "./spectra"
        assert cfg["model"] == "model_Single_Lorentzian"
        assert cfg["likelihood"] == "chi22p"
        assert cfg["temps"] == 4 and cfg["chains"] == 6
        assert cfg["thin"] == 5 and cfg["ckpt_every"] == 2
        s = cfg["sampler"]
        assert s["lambda_temp"] == 1.5
        assert s["dN_mixing"] == 8
        assert s["target_acceptance"] == 0.3
        assert s["use_drift"] is False
        assert s["gain_c0"] == 2.0            # alias resolved

    def test_round_trip(self, tmp_path):
        p = tmp_path / "c.cfg"
        write_config_default_provisional(
            str(p), data_dir="d", model="m", likelihood="chi22p",
            sampler={"lambda_temp": 1.3, "use_drift": True}, temps=6,
            chains=4, thin=10, ckpt_every=0)
        cfg = read_config_default_provisional(str(p))
        assert cfg["sampler"]["lambda_temp"] == 1.3
        assert cfg["sampler"]["use_drift"] is True
        assert cfg["temps"] == 6 and cfg["thin"] == 10

    @pytest.mark.parametrize("body,match", [
        ("[MALA]\nbogus_knob= 1\n", "unknown .MALA. key"),
        ("[weird]\n", "unknown section"),
        ("[MALA]\nuse_drift= 2\n", "must be 0 or 1"),
        ("[MALA]\nlambda_temp= abc\n", "non-numeric"),
        ("lambda_temp= 1.2\n", "before any"),
        ("[outputs]\nwhatever= 3\n", "unknown .outputs. key"),
    ])
    def test_rejects(self, tmp_path, body, match):
        p = tmp_path / "c.cfg"
        p.write_text(body)
        with pytest.raises(ValueError, match=match):
            read_config_default_provisional(str(p))

    def test_error_cites_line(self, tmp_path):
        p = tmp_path / "c.cfg"
        p.write_text("[MALA]\nlambda_temp= 1.2\nbogus= 1\n")
        with pytest.raises(ValueError, match=r"c\.cfg:3"):
            read_config_default_provisional(str(p))


class TestConfigPresets:
    def test_read_good(self, tmp_path):
        p = tmp_path / "config_presets.cfg"
        p.write_text(GOOD_PRESETS)
        stars = read_config_presets_provisional(str(p))
        assert len(stars) == 2
        assert stars[0]["problem"] == "s0.model"
        assert stars[0]["outdir"] == "fit0"
        assert stars[0]["burnin"] == 100 and stars[0]["seed"] == 3
        # action=A zeroes the phases not selected (resume workflow)
        assert stars[1]["burnin"] == 0 and stars[1]["learning"] == 0
        assert stars[1]["acquire"] == 300
        assert stars[1]["temps"] == 2 and stars[1]["chains"] == 4

    def test_round_trip(self, tmp_path):
        p = tmp_path / "p.cfg"
        stars = [{"id": "x", "problem": "x.model", "outdir": "ox",
                  "burnin": 10, "learning": 20, "acquire": 30, "seed": 5}]
        write_config_presets_provisional(str(p), stars)
        back = read_config_presets_provisional(str(p))
        assert back[0]["problem"] == "x.model"
        assert back[0]["burnin"] == 10 and back[0]["acquire"] == 30
        assert back[0]["seed"] == 5

    @pytest.mark.parametrize("row,match", [
        ("only three cols\n", "7 columns"),
        ("s m.model a 2 3 BLA out\n", "non-integer"),
        ("s m.model 1 2 3 XY out\n", "subset of 'BLA'"),
        ("s m.model 1 2 3 BLA out stray\n", "not key=value"),
        ("s m.model 1 2 3 BLA out nope=1\n", "unknown extra"),
    ])
    def test_rejects(self, tmp_path, row, match):
        p = tmp_path / "p.cfg"
        p.write_text(row)
        with pytest.raises(ValueError, match=match):
            read_config_presets_provisional(str(p))


class TestErrorsDefault:
    def test_read_and_scales(self, tmp_path):
        p = tmp_path / "errors_default.cfg"
        p.write_text(GOOD_ERRORS)
        table = read_errors_default_provisional(str(p))
        assert table == {"nu0": 0.25, "width": 0.5, "default_rel": 0.02}

        from tamcmc_tpu.demos import make_demo
        problem, _, _, _ = make_demo("single_lorentzian", seed=0)
        scales = scales_from_errors(problem, table)
        names = problem.free_names
        assert scales[names.index("nu0")] == 0.25
        assert scales[names.index("width")] == 0.5
        # unmatched free params fall back to default_rel * |start|
        i_h = names.index("H")
        p0 = np.asarray(problem.extract(problem.params0))
        assert scales[i_h] == pytest.approx(0.02 * abs(float(p0[i_h])))

    def test_round_trip(self, tmp_path):
        p = tmp_path / "e.cfg"
        write_errors_default_provisional(str(p), {"a1": 0.05, "inc": 0.1})
        assert read_errors_default_provisional(str(p)) == \
            {"a1": 0.05, "inc": 0.1}

    @pytest.mark.parametrize("body,match", [
        ("a1 0.05 extra\n", "needs 'name sigma'"),
        ("a1 abc\n", "non-numeric sigma"),
        ("a1 -0.1\n", "must be finite"),
        ("a1 0.1\na1 0.2\n", "duplicate"),
        ("", "no error rows"),
    ])
    def test_rejects(self, tmp_path, body, match):
        p = tmp_path / "e.cfg"
        p.write_text(body)
        with pytest.raises(ValueError, match=match):
            read_errors_default_provisional(str(p))


class TestCfgWorkflowEndToEnd:
    def test_batch_from_cfg_and_model_files_alone(self, tmp_path):
        """The reference workflow: presets rows -> per-star fits with phase
        plans, driven by .cfg + .model files only (VERDICT r2 item 4)."""
        from tamcmc_tpu.cli import main
        # materialize a .model + .data pair via make-example
        ex = tmp_path / "ex"
        main(["make-example", "--demo", "single_lorentzian",
              "--outdir", str(ex), "--model-format"])
        assert (ex / "problem.model").exists()

        write_config_default_provisional(
            str(tmp_path / "config_default.cfg"),
            sampler={"lambda_temp": 1.6, "dN_mixing": 10}, temps=2,
            chains=4, thin=5)
        (tmp_path / "config_presets.cfg").write_text(
            "! id model Bi Li Ai action outdir\n"
            f"s0 {ex / 'problem.model'} 100 200 300 BLA fit_s0\n")
        write_errors_default_provisional(
            str(tmp_path / "errors_default.cfg"),
            {"nu0": 0.3, "default_rel": 0.05})

        main(["batch", "--presets", str(tmp_path / "config_presets.cfg"),
              "--config", str(tmp_path / "config_default.cfg"),
              "--errors", str(tmp_path / "errors_default.cfg")])
        out = tmp_path / "fit_s0"
        assert (out / "A_samples.bin").exists()
        assert (out / "summary.json").exists()
        import json
        rows = json.loads((out / "summary.json").read_text())
        assert all(np.isfinite(r["median"]) for r in rows)

    def test_batch_cfg_rejects_bad_presets(self, tmp_path):
        from tamcmc_tpu.cli import main
        bad = tmp_path / "p.cfg"
        bad.write_text("s m.model 1 2 3 ZZ out\n")
        with pytest.raises(SystemExit, match="subset of 'BLA'"):
            main(["batch", "--presets", str(bad)])
