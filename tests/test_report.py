"""Diagnostics report: the matplotlib artifact set the reference produced
via gnuplot (diagnostics.cpp [U]; SURVEY.md section 2 'Diagnostics')."""
import numpy as np
import pytest

pytest.importorskip("matplotlib")


def _fake_outs(E=6, T=3, C=4, Df=5, seed=0):
    rng = np.random.default_rng(seed)
    att = np.cumsum(rng.integers(1, 3, size=(E, T)), axis=0).astype(float)
    att[:, -1] = 0.0                       # top rung has no upper partner
    return {
        "theta0": rng.normal(size=(E, C, Df)),
        "logL": rng.normal(size=(E, T, C)),
        "logP0": rng.normal(size=(E, C)),
        "log_sigma": rng.normal(size=(E, T)),
        "acc_rate": rng.uniform(0, 1, size=(E, T)),
        "mu0": rng.normal(size=(E, Df)),
        "cov_diag0": rng.uniform(0.1, 1.0, size=(E, Df)),
        "swap_att": att,
        "swap_acc": att * rng.uniform(0, 1, size=(E, T)),
    }


def test_write_report_full_artifact_set(tmp_path):
    from tamcmc_tpu.diagnostics.report import write_report
    names = [f"p{i}" for i in range(5)]
    made = write_report(tmp_path, {"A": _fake_outs()}, names=names)
    assert set(made) == {"param_pdfs.png", "traces.png", "acceptance.png",
                         "logL_trace.png", "swap_rates.png"}
    for f in made:
        assert (tmp_path / f).stat().st_size > 1000


def test_write_report_single_temp_skips_swaps(tmp_path):
    from tamcmc_tpu.diagnostics.report import write_report
    made = write_report(tmp_path, {"A": _fake_outs(T=1)},
                        names=[f"p{i}" for i in range(5)])
    assert "swap_rates.png" not in made


def test_rotation_inclination_panel(tmp_path):
    from tamcmc_tpu.diagnostics.report import write_report, _find_rot_inc
    names = ["H_0", "a1", "inc", "W_0", "N0"]
    assert _find_rot_inc(names) == (1, 2)
    assert _find_rot_inc(["H_0", "a1", "W_0"]) is None
    made = write_report(tmp_path, {"A": _fake_outs()}, names=names)
    assert "rotation_inclination.png" in made
    assert (tmp_path / "rotation_inclination.png").stat().st_size > 1000
