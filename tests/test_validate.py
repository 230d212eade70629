"""`tamcmc validate` — problem-file linting (the errors_default.cfg analog,
io/validate.py): every class of setup mistake is reported, a clean setup
passes, and the CLI exit code distinguishes the two."""
import pathlib

import numpy as np
import pytest

from tamcmc_tpu.io.validate import validate_problem


def run_cli(argv):
    from tamcmc_tpu.cli import main
    return main(argv)


@pytest.fixture(scope="module")
def example_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("example")
    run_cli(["make-example", "--demo", "single_lorentzian",
             "--outdir", str(out), "--ngrid", "512"])
    return out


def _patch(example_dir, tmp_path, transform):
    """Copy problem.toml with a line-level transform; keep the data path."""
    src = (example_dir / "problem.toml").read_text()
    dst = tmp_path / "problem.toml"
    text = transform(src)
    text = text.replace('data = "spectrum.data"',
                        f'data = "{example_dir / "spectrum.data"}"')
    dst.write_text(text)
    return str(dst)


class TestValidateOK:
    def test_clean_example_passes(self, example_dir):
        errors, warns = validate_problem(str(example_dir / "problem.toml"))
        assert errors == [], errors

    def test_cli_exit_zero(self, example_dir):
        run_cli(["validate", str(example_dir / "problem.toml")])


class TestValidateErrors:
    def test_missing_file(self):
        errors, _ = validate_problem("/nonexistent/problem.toml")
        assert "no such file" in errors[0]

    def test_unknown_model(self, example_dir, tmp_path):
        p = _patch(example_dir, tmp_path,
                   lambda s: s.replace("model_Single_Lorentzian",
                                       "model_Nope"))
        errors, _ = validate_problem(p)
        assert any("unknown model" in e for e in errors)

    def test_bad_uniform_hypers(self, example_dir, tmp_path):
        p = _patch(example_dir, tmp_path,
                   lambda s: s.replace("hyper = [30.0, 70.0, 0.0, 0.0]",
                                       "hyper = [70.0, 30.0, 0.0, 0.0]"))
        errors, _ = validate_problem(p)
        assert any("Uniform needs hi > lo" in e for e in errors)

    def test_start_outside_support(self, example_dir, tmp_path):
        p = _patch(example_dir, tmp_path,
                   lambda s: s.replace("value = 48.0", "value = 120.0"))
        errors, _ = validate_problem(p)
        assert any("outside Uniform" in e for e in errors)

    def test_missing_data_file(self, example_dir, tmp_path):
        src = (example_dir / "problem.toml").read_text()
        dst = tmp_path / "problem.toml"
        dst.write_text(src.replace('data = "spectrum.data"',
                                   'data = "gone.data"'))
        errors, _ = validate_problem(str(dst))
        assert any("data file not found" in e for e in errors)

    def test_bad_freq_range(self, example_dir, tmp_path):
        p = _patch(example_dir, tmp_path,
                   lambda s: s.replace("[problem]",
                                       "[problem]\nfreq_range = "
                                       "[5000.0, 6000.0]", 1))
        errors, _ = validate_problem(p)
        assert any("does not overlap" in e for e in errors)

    def test_cli_exit_one(self, example_dir, tmp_path):
        p = _patch(example_dir, tmp_path,
                   lambda s: s.replace("value = 48.0", "value = 120.0"))
        with pytest.raises(SystemExit) as ei:
            run_cli(["validate", p])
        assert ei.value.code == 1

    def test_crossed_initial_frequencies(self, tmp_path):
        # ms_global with descending initial freq_l0: the family constraint
        # would reject every proposal — validate must catch it up front
        out = tmp_path / "ms"
        run_cli(["make-example", "--demo", "ms_global", "--outdir",
                 str(out), "--ngrid", "1024"])
        src = (out / "problem.toml").read_text()
        lines = src.splitlines()
        # swap the first two freq_l0 values (f0_0 / f0_1 rows)
        vals = []
        for i, ln in enumerate(lines):
            if ln.startswith('name = "f0_'):
                vals.append(i + 1)        # the following 'value = ...' line
        assert len(vals) >= 2
        v0, v1 = lines[vals[0]], lines[vals[1]]
        lines[vals[0]], lines[vals[1]] = v1, v0
        bad = tmp_path / "crossed.toml"
        bad.write_text("\n".join(lines).replace(
            'data = "spectrum.data"', f'data = "{out / "spectrum.data"}"'))
        errors, _ = validate_problem(str(bad))
        assert any("strictly ascending" in e for e in errors), errors


class TestValidateWarnings:
    def test_unknown_sampler_key(self, example_dir, tmp_path):
        p = _patch(example_dir, tmp_path,
                   lambda s: s.replace("[sampler]",
                                       "[sampler]\nnot_a_knob = 3", 1))
        errors, warns = validate_problem(p)
        assert errors == []
        assert any("unknown key 'not_a_knob'" in w for w in warns)

    def test_gaussian_far_start_flagged(self, tmp_path, example_dir):
        p = _patch(example_dir, tmp_path,
                   lambda s: s.replace('prior = "uniform"\nhyper = [30.0, 70.0, 0.0, 0.0]',
                                       'prior = "gaussian"\nhyper = [50.0, 0.1, 0.0, 0.0]'))
        # start value 48 is 20 sigma from Gaussian(50, 0.1) — a WARNING,
        # not an error: the Gaussian has full support and over-dispersed
        # starts are standard convergence-checking practice (ADVICE r2)
        errors, warns = validate_problem(p)
        assert errors == []
        assert any("prior sigma" in w for w in warns)
