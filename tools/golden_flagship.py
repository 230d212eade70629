"""Windowed-flagship golden posterior anchor (round-4 VERDICT weak #6).

The config-1 golden (tests/golden/config1_posterior.json) anchors the bare
sampler; the FLAGSHIP path — static c*Gamma windows, disjoint-segment
accumulation, piece-wise chi22p with per-piece background, the bf16
profile-stream switch — is where almost every perf change lands, and a
silent stationary-distribution shift there is the largest class of
breakage a statistical regression can catch.  This tool:

  generate   long-run fits of the CI-scaled windowed flagship (demo
             ms_global, ngrid=6000, n_orders=4 — the same problem the
             precision validators use) under BOTH f32 and bf16, writing
             moments + ESS + provenance to tests/golden/flagship_posterior
             .json.  Each precision runs in a subprocess (the profile
             precision is latched at first trace).
  fit        one moderate-length fit at a given precision, posterior saved
             to an npz — the subprocess body the slow regression test
             (tests/test_parity_harness.py::TestGoldenFlagship) launches.

The anchor test mirrors TestGoldenConfig1's ESS-aware z-test: a sampler or
kernel change that shifts the flagship's stationary distribution fails CI
before it can shift science results.
"""
import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
GOLDEN = ROOT / "tests" / "golden" / "flagship_posterior.json"

DEMO_KW = {"ngrid": 6000, "n_orders": 4}
T, C = 4, 16

FIT_SNIPPET = """
import os, sys, numpy as np
sys.path.insert(0, {root!r})
from tamcmc_tpu.utils.cache import enable_compile_cache, ensure_cpu_fallback
enable_compile_cache(); ensure_cpu_fallback()
import jax
if os.environ.get("GOLDEN_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
if {precision!r} == "bf16":
    from tamcmc_tpu.ops.lorentzian import set_profile_precision
    set_profile_precision("bf16")
from tamcmc_tpu.demos import make_demo
from tamcmc_tpu.sampler import init_state, make_beta_ladder, run_phases
from tamcmc_tpu.sampler.driver import PhasePlan
from tamcmc_tpu.diagnostics.ess import effective_sample_size
problem, hp, _plan, meta = make_demo("ms_global", seed=0, **{demo_kw!r})
assert problem._pieces_hook is not None, "piece-wise path must be engaged"
plan = PhasePlan(**{plan_kw!r})
betas = make_beta_ladder({T}, hp.lambda_temp)
key = jax.random.PRNGKey({seed})
key, sub = jax.random.split(key)
state = init_state(problem, hp, {T}, {C}, sub)
state, results = run_phases(problem, hp, betas, state, key, plan)
th = results["A"]["theta0"]
ess = np.asarray([effective_sample_size(th[:, :, i])
                  for i in range(th.shape[-1])])
np.savez({out!r}, theta=th, ess=ess,
         names=np.asarray(problem.free_names),
         truth=np.asarray(meta["truth"])[np.asarray(problem.priors.free_mask)])
"""


def run_fit(precision, plan_kw, seed, out, platform=None):
    env = dict(os.environ)
    if platform:
        env["GOLDEN_PLATFORM"] = platform
        env["JAX_PLATFORMS"] = platform
    code = FIT_SNIPPET.format(root=str(ROOT), precision=precision,
                              demo_kw=DEMO_KW, plan_kw=plan_kw, T=T, C=C,
                              seed=seed, out=str(out))
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   timeout=3600)


def generate():
    import numpy as np
    plan_kw = dict(burnin=500, learning=3000, acquire=24000, thin=4,
                   chunk=500)
    doc = {"provenance": {
        "demo": "ms_global", "demo_kw": DEMO_KW, "temps": T, "chains": C,
        "seed": 0, "plan": plan_kw, "date": "2026-08-21",
        "note": ("windowed-flagship long-run self-truth anchor (piece-wise "
                 "chi22p over the disjoint segment partition, per-piece "
                 "background); regenerate with tools/golden_flagship.py "
                 "generate if the sampler's STATISTICAL behaviour "
                 "legitimately changes")}}
    for precision in ("f32", "bf16"):
        out = f"/tmp/golden_flagship_{precision}.npz"
        print(f"generating {precision} golden (long run)...", flush=True)
        run_fit(precision, plan_kw, seed=0, out=out)
        z = np.load(out, allow_pickle=True)
        # f64 BEFORE the axis-0 reductions: f32 accumulation over the
        # 96000-row flat array biased frequency means by ~1.7 uHz (2
        # posterior sigma) and inflated stds 2.2x in this golden's first
        # generation — the bug behind the round-5 f64-cast fixes across
        # diagnostics/ (means measured 2301.93-f32 vs 2300.26-f64)
        th = z["theta"].astype(np.float64).reshape(-1, z["theta"].shape[-1])
        doc[precision] = {
            "names": [str(n) for n in z["names"]],
            "mean": th.mean(axis=0).tolist(),
            "std": th.std(axis=0, ddof=1).tolist(),
            "ess": z["ess"].tolist(),
            "truth": z["truth"].tolist(),
        }
    GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    with open(GOLDEN, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {GOLDEN}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "generate":
        generate()
    else:
        print(__doc__)
