"""Setup-time `Auto` prior resolution (stats/auto_priors.py).

VERDICT round-2 item 5: an Auto row either gets a derived prior or the
setup refuses loudly — the round-2 silently-Fix behaviour (freezing a
parameter the reference would fit) is gone."""
import numpy as np
import pytest

from tamcmc_tpu.models import build_model
from tamcmc_tpu.models.ms_global import MSGlobalSpec
from tamcmc_tpu.stats.priors import PriorTable, PriorKind
from tamcmc_tpu.stats.auto_priors import resolve_auto_priors, AutoPriorError


@pytest.fixture(scope="module")
def ms_layout():
    _, layout = build_model("model_MS_Global_a1etaa3_HarveyLike",
                            MSGlobalSpec(n_per_l=(3, 0, 0, 0), n_harvey=1))
    return layout


def _table(layout, auto_names):
    names = layout.param_names()
    rows = [(n, "auto") if n in auto_names else (n, "fix") for n in names]
    return PriorTable.from_rows(rows)


def _p0(layout):
    p0 = np.zeros(layout.ndim)
    fo = layout.offset("freq_l0")
    p0[fo:fo + 3] = [2000.0, 2100.0, 2200.0]
    p0[layout.offset("heights"):layout.offset("heights") + 3] = 8.0
    p0[layout.offset("widths"):layout.offset("widths") + 3] = 1.5
    return p0


NU = np.linspace(1800.0, 2400.0, 4000)
SPEC = np.full(4000, 2.0)


class TestDerivations:
    def test_frequency_window_from_comb(self, ms_layout):
        pri = _table(ms_layout, {"freq_l0_1"})
        out = resolve_auto_priors(pri, _p0(ms_layout), layout=ms_layout,
                                  nu=NU, spec=SPEC)
        i = ms_layout.offset("freq_l0") + 1
        assert out.kinds[i] == int(PriorKind.UNIFORM)
        lo, hi = out.hypers[i][:2]
        # Dnu = 100 -> half-width 25
        assert lo == pytest.approx(2100.0 - 25.0)
        assert hi == pytest.approx(2100.0 + 25.0)
        # resolved row is FREE now
        assert out.free_mask[i]

    def test_height_scale_from_data(self, ms_layout):
        pri = _table(ms_layout, {"heights_0"})
        out = resolve_auto_priors(pri, _p0(ms_layout), layout=ms_layout,
                                  nu=NU, spec=SPEC)
        i = ms_layout.offset("heights")
        assert out.kinds[i] == int(PriorKind.JEFFREYS)
        assert out.hypers[i][0] == pytest.approx(0.2)     # 0.1 x median
        assert out.hypers[i][1] == pytest.approx(20.0)    # 10 x max

    def test_width_and_inclination(self, ms_layout):
        pri = _table(ms_layout, {"widths_2", "inclination"})
        out = resolve_auto_priors(pri, _p0(ms_layout), layout=ms_layout,
                                  nu=NU, spec=SPEC)
        iw = ms_layout.offset("widths") + 2
        assert out.kinds[iw] == int(PriorKind.JEFFREYS)
        assert out.hypers[iw][1] == pytest.approx(50.0)   # Dnu/2
        ii = ms_layout.offset("inclination")
        assert out.kinds[ii] == int(PriorKind.UNIFORM)
        assert out.hypers[ii][1] == pytest.approx(np.pi / 2)

    def test_white_noise_floor(self, ms_layout):
        n_last = ms_layout.offset("noise") + ms_layout.size("noise") - 1
        name = ms_layout.param_names()[n_last]
        pri = _table(ms_layout, {name})
        out = resolve_auto_priors(pri, _p0(ms_layout), layout=ms_layout,
                                  nu=NU, spec=SPEC)
        assert out.kinds[n_last] == int(PriorKind.JEFFREYS)

    def test_noop_without_auto(self, ms_layout):
        pri = _table(ms_layout, set())
        assert resolve_auto_priors(pri, _p0(ms_layout),
                                   layout=ms_layout) is pri


class TestRefusals:
    def test_rotation_refused(self, ms_layout):
        pri = _table(ms_layout, {"rot_0"})
        with pytest.raises(AutoPriorError, match="rot"):
            resolve_auto_priors(pri, _p0(ms_layout), layout=ms_layout,
                                nu=NU, spec=SPEC)

    def test_harvey_shape_refused(self, ms_layout):
        name = ms_layout.param_names()[ms_layout.offset("noise")]
        pri = _table(ms_layout, {name})
        with pytest.raises(AutoPriorError, match="white-noise floor"):
            resolve_auto_priors(pri, _p0(ms_layout), layout=ms_layout,
                                nu=NU, spec=SPEC)

    def test_height_without_data_refused(self, ms_layout):
        pri = _table(ms_layout, {"heights_0"})
        with pytest.raises(AutoPriorError, match="spectrum"):
            resolve_auto_priors(pri, _p0(ms_layout), layout=ms_layout)

    def test_no_layout_refused(self):
        pri = PriorTable.from_rows([("x", "auto")])
        with pytest.raises(AutoPriorError, match="layout"):
            resolve_auto_priors(pri, np.zeros(1))

    def test_error_names_the_parameter(self, ms_layout):
        pri = _table(ms_layout, {"rot_0"})
        with pytest.raises(AutoPriorError, match="'rot_0'"):
            resolve_auto_priors(pri, _p0(ms_layout), layout=ms_layout)


class TestEndToEnd:
    def test_cli_run_derives_auto_and_samples(self, tmp_path):
        """A .model file with Auto frequency rows must FIT them (not freeze):
        the resolved posterior moves off the (deliberately offset) start."""
        from tamcmc_tpu.cli import main
        import json
        ex = tmp_path / "ex"
        main(["make-example", "--demo", "single_lorentzian",
              "--outdir", str(ex), "--model-format"])
        # patch the nu0 row to Auto (keep its start value)
        mdl = (ex / "problem.model").read_text().splitlines()
        patched = []
        for line in mdl:
            if line.startswith("nu0"):
                toks = line.split()
                patched.append(f"nu0  {toks[1]}  1  Auto")
            else:
                patched.append(line)
        (ex / "problem.model").write_text("\n".join(patched) + "\n")
        out = tmp_path / "fit"
        main(["run", "--problem", str(ex / "problem.model"),
              "--outdir", str(out), "--burnin", "100", "--learning", "300",
              "--acquire", "400", "--thin", "4", "--temps", "2",
              "--chains", "4", "--no-report"])
        rows = json.loads((out / "summary.json").read_text())
        nu0 = next(r for r in rows if r["name"] == "nu0")
        assert nu0["std"] > 1e-4          # fitted, not frozen
        # injected truth nu0 = 50 (demos.py); start was 48 — the derived
        # Uniform window must let the sampler find it
        assert abs(nu0["median"] - 50.0) < 1.0

    def test_cli_run_refuses_underivable_auto(self, tmp_path):
        """A Harvey SHAPE parameter (non-floor noise entry) has no
        data-driven rule — the run must refuse before sampling."""
        from tamcmc_tpu.cli import main
        ex = tmp_path / "ex"
        main(["make-example", "--demo", "harvey_background",
              "--outdir", str(ex), "--model-format", "--ngrid", "2048"])
        mdl = (ex / "problem.model").read_text().splitlines()
        patched, done = [], False
        for line in mdl:
            if not done and line.startswith("A1"):
                toks = line.split()
                patched.append(f"A1  {toks[1]}  1  Auto")
                done = True
            else:
                patched.append(line)
        assert done
        (ex / "problem.model").write_text("\n".join(patched) + "\n")
        with pytest.raises(SystemExit, match="Auto prior"):
            main(["run", "--problem", str(ex / "problem.model"),
                  "--outdir", str(tmp_path / "fit2"), "--no-report"])
