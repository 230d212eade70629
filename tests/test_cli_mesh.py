"""User-facing multi-chip execution + intra-phase checkpointing
(VERDICT round-1 items 1 & 8; SURVEY.md sections 5.4, 5.8, 7 stage 6).

`tamcmc run --mesh TxC` must produce the same posterior as the local path
(the mesh is a sharding annotation, not a different algorithm), and a run
killed mid-phase must resume bitwise from the last chunk checkpoint.
"""
import dataclasses
import json
import pathlib

import numpy as np
import pytest

from tamcmc_tpu.cli import main
from tamcmc_tpu.io.outputs import OutputWriter, read_bin_samples
from tamcmc_tpu import demos


ARGS = ["run", "--demo", "single_lorentzian",
        "--burnin", "100", "--learning", "200", "--acquire", "200",
        "--thin", "5", "--no-report"]


@pytest.fixture(scope="module")
def local_fit(tmp_path_factory):
    out = tmp_path_factory.mktemp("local_fit")
    main(ARGS + ["--outdir", str(out)])
    return out


class TestMeshCLI:
    def test_mesh_run_matches_local(self, local_fit, tmp_path):
        """--mesh 4x1 on the 8-fake-device CPU backend: same keys, same
        math, only the partitioning differs -> same samples up to GSPMD
        reduction-order noise."""
        import jax
        if len(jax.devices()) < 4:
            pytest.skip("needs fake multi-device CPU backend")
        out = tmp_path / "mesh_fit"
        main(ARGS + ["--outdir", str(out), "--mesh", "4x1"])
        s_local, names = read_bin_samples(str(local_fit), "A")
        s_mesh, names2 = read_bin_samples(str(out), "A")
        assert names == names2
        assert s_local.shape == s_mesh.shape
        np.testing.assert_allclose(s_local, s_mesh, rtol=2e-3, atol=2e-3)
        # posterior summaries agree tightly
        j1 = json.loads((local_fit / "summary.json").read_text())
        j2 = json.loads((out / "summary.json").read_text())
        for r1, r2 in zip(j1, j2):
            assert abs(r1["median"] - r2["median"]) <= \
                2e-2 * max(abs(r1["median"]), 1e-3) + 1e-4

    def test_mesh_run_2d(self, tmp_path):
        """temp AND chain axes sharded (4x2) — walkers split across devices."""
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 fake CPU devices")
        out = tmp_path / "mesh2d"
        main(ARGS + ["--outdir", str(out), "--mesh", "4x2"])
        s, _ = read_bin_samples(str(out), "A")
        assert s.shape[0] == 40 * 8     # emits x walkers
        assert np.all(np.isfinite(s))

    def test_mesh_must_divide(self, tmp_path):
        with pytest.raises(SystemExit):
            main(ARGS + ["--outdir", str(tmp_path / "bad"), "--mesh", "3x1"])


def _small_chunks(orig_make):
    """Patch the demo's PhasePlan to 10-emit chunks so phases span several
    chunks (the intra-phase checkpoint cadence needs chunk boundaries)."""
    def make(name, seed=0, ngrid=None, n_orders=None):
        problem, hp, plan, meta = orig_make(name, seed=seed, ngrid=ngrid,
                                            n_orders=n_orders)
        return problem, hp, dataclasses.replace(plan, chunk=10), meta
    return make


def _crashing_append(orig, crash_phase, after):
    """append_chunk wrapper raising after the Nth call of a given phase —
    AFTER the .bin write, BEFORE the matching checkpoint: the .bin ends up
    with more records than the restore covers, exercising the
    truncate-on-resume path."""
    n = {"v": 0}

    def wrapped(self, phase, outs):
        orig(self, phase, outs)
        if phase == crash_phase:
            n["v"] += 1
            if n["v"] > after:
                raise RuntimeError("injected crash")
    return wrapped


class TestMidPhaseResume:
    def test_crash_resume_bitwise(self, tmp_path, monkeypatch):
        small = _small_chunks(demos.make_demo)
        monkeypatch.setattr(demos, "make_demo", small)

        # --- uninterrupted reference run (same chunking) ---
        ref = tmp_path / "uninterrupted"
        main(ARGS + ["--outdir", str(ref), "--ckpt-every", "1"])

        # --- crashed run: dies in Learning after chunk 3's bin write ---
        out = tmp_path / "crashy"
        args = ARGS + ["--outdir", str(out), "--ckpt-every", "1"]
        orig = OutputWriter.append_chunk
        monkeypatch.setattr(OutputWriter, "append_chunk",
                            _crashing_append(orig, "L", after=2))
        with pytest.raises(RuntimeError, match="injected crash"):
            main(args)
        monkeypatch.setattr(OutputWriter, "append_chunk", orig)

        # the crash left more L records in .bin than the checkpoint covers
        import numpy as _np
        nrec_bin = _np.fromfile(out / "L_samples.bin", dtype="<f8").size // 4
        z = _np.load(out / "restore.npz")
        assert str(z["phase"]) == "L" and int(z["meta_in_progress"]) == 1
        assert nrec_bin > int(z["meta_emitted"]) * 8   # 8 walkers

        # --- resume and finish ---
        main(args + ["--resume"])

        for phase in ("B", "L", "A"):
            a, _ = read_bin_samples(str(out), phase)
            b, _ = read_bin_samples(str(ref), phase)
            np.testing.assert_array_equal(a, b, err_msg=f"phase {phase}")
        j1 = json.loads((out / "summary.json").read_text())
        j2 = json.loads((ref / "summary.json").read_text())
        assert j1 == j2

    def test_resume_after_phase_unchanged(self, tmp_path, monkeypatch):
        """Phase-boundary resume (round-1 behaviour) still works with the
        new meta fields present."""
        small = _small_chunks(demos.make_demo)
        monkeypatch.setattr(demos, "make_demo", small)
        ref = tmp_path / "ref"
        main(ARGS + ["--outdir", str(ref)])

        out = tmp_path / "two_stage"
        # run B+L only (acquire=0), then resume with the full plan
        main(["run", "--demo", "single_lorentzian", "--outdir", str(out),
              "--burnin", "100", "--learning", "200", "--acquire", "0",
              "--thin", "5", "--no-report"])
        main(ARGS + ["--outdir", str(out), "--resume"])
        a, _ = read_bin_samples(str(out), "A")
        b, _ = read_bin_samples(str(ref), "A")
        np.testing.assert_array_equal(a, b)


class TestMeshMidPhaseResume:
    def test_mesh_crash_resume_matches_uninterrupted(self, tmp_path,
                                                     monkeypatch):
        """Sharded run + intra-phase checkpoints: kill mid-phase, resume,
        and match the uninterrupted MESH run exactly — the gathered
        checkpoint and re-sharding round-trip must be lossless."""
        import jax
        if len(jax.devices()) < 4:
            pytest.skip("needs fake multi-device CPU backend")
        small = _small_chunks(demos.make_demo)
        monkeypatch.setattr(demos, "make_demo", small)
        margs = ARGS + ["--mesh", "4x2", "--ckpt-every", "1"]

        ref = tmp_path / "mesh_ref"
        main(margs + ["--outdir", str(ref)])

        out = tmp_path / "mesh_crash"
        orig = OutputWriter.append_chunk
        monkeypatch.setattr(OutputWriter, "append_chunk",
                            _crashing_append(orig, "A", after=1))
        with pytest.raises(RuntimeError, match="injected crash"):
            main(margs + ["--outdir", str(out)])
        monkeypatch.setattr(OutputWriter, "append_chunk", orig)
        main(margs + ["--outdir", str(out), "--resume"])

        for phase in ("B", "L", "A"):
            a, _ = read_bin_samples(str(out), phase)
            b, _ = read_bin_samples(str(ref), phase)
            np.testing.assert_array_equal(a, b, err_msg=f"phase {phase}")


class TestShardmapCLI:
    def test_runner_shardmap_e2e(self, tmp_path):
        """`tamcmc run --mesh 4x1 --runner shardmap` runs the full B/L/A
        fit through the explicit shard_map runner and recovers the same
        physics (statistical agreement: different, mesh-invariant RNG
        protocol -> distributional equivalence is the contract)."""
        import jax
        if len(jax.devices()) < 4:
            pytest.skip("needs fake multi-device CPU backend")
        out = tmp_path / "smap_fit"
        main(ARGS + ["--outdir", str(out), "--mesh", "4x1",
                     "--runner", "shardmap"])
        rows = json.loads((out / "summary.json").read_text())
        by = {r["name"]: r for r in rows}
        assert abs(by["nu0"]["median"] - 50.0) < 2.0
        assert abs(by["white"]["median"] - 1.0) < 0.15
        # outputs/artifacts identical in shape to the GSPMD path
        s, names = read_bin_samples(str(out), "A")
        assert s.shape[1] == 4 and len(names) == 4
