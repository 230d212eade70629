"""GSPMD annotation overhead on the real chip: --mesh 1x1 vs local.

Round-3 VERDICT missing #2 / next #2a: the one sharding measurement a
single TPU chip allows is the ZERO-COMMUNICATION overhead of routing the
identical phase through the sharded runner on a 1x1 mesh — GSPMD
partitioning/annotation cost with no collectives.  Run on the TPU (not
under the CPU conftest); prints one JSON line for BASELINE.md.

Also times the explicit shard_map runner on the same 1x1 mesh (its
overhead adds the per-walker fold_in draw protocol + the masked always-
swap ppermute, which on one device lowers to copies).
"""
import json
import os
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
from tamcmc_tpu.utils.cache import enable_compile_cache, ensure_cpu_fallback
enable_compile_cache()
ensure_cpu_fallback()

import jax
import numpy as np

from tamcmc_tpu.demos import make_demo
from tamcmc_tpu.sampler import init_state, make_beta_ladder
from tamcmc_tpu.sampler.driver import make_phase_runner
from tamcmc_tpu.parallel.mesh import make_sampler_mesh
from tamcmc_tpu.parallel.sharded import make_sharded_phase_runner, shard_state
from tamcmc_tpu.parallel.shardmap_runner import make_shardmap_phase_runner


def main():
    problem, hp, plan, meta = make_demo("ms_global", seed=0)
    T = meta["n_temps"]
    C = int(os.environ.get("TAMCMC_BENCH_WALKERS", "128"))
    betas = make_beta_ladder(T, hp.lambda_temp)
    THIN, EMIT, REPS = 5, 100, 3

    def time_runner(make_state, runner):
        """best-of-REPS ms/step with SCALAR-FETCH sync.

        block_until_ready over the axon tunnel does NOT reliably wait for
        the computation (measured: 0.1-0.4 ms returns on 1.3 s scans —
        a first cut of this tool timed pure dispatch noise and read a
        bogus 0.59x 'overhead'); only a host fetch truly syncs.  The
        ~60 ms fetch RPC is subtracted; each rep is timed separately and
        the BEST is kept (tunnel stalls only ever add time)."""
        state = make_state()
        k = jax.random.PRNGKey(1)
        k, s = jax.random.split(k)
        state, _ = runner(state, s)          # compile + settle
        float(np.asarray(state.logL)[0, 0])
        best = None
        for _ in range(REPS):
            k, s = jax.random.split(k)
            t0 = time.time()
            state, _ = runner(state, s)
            float(np.asarray(state.logL)[0, 0])
            dt = max(time.time() - t0 - 0.06, 1e-9)
            best = dt if best is None else min(best, dt)
        return THIN * EMIT / best

    def fresh():
        return init_state(problem, hp, T, C, jax.random.PRNGKey(0))

    local = make_phase_runner(problem, hp, betas, adapt=False,
                              thin=THIN, n_emit=EMIT)
    sps_local = time_runner(fresh, local)

    mesh = make_sampler_mesh(1, 1)
    gspmd = make_sharded_phase_runner(problem, hp, betas, mesh, False,
                                      THIN, EMIT)
    sps_gspmd = time_runner(lambda: shard_state(fresh(), mesh), gspmd)

    smap = make_shardmap_phase_runner(problem, hp, betas, mesh, False,
                                      THIN, EMIT)
    sps_smap = time_runner(lambda: shard_state(fresh(), mesh), smap)

    print(json.dumps({
        "device": str(jax.devices()[0]),
        "config": {"temps": T, "walkers": C, "thin": THIN,
                   "grid_bins": int(np.asarray(problem.nu).shape[0])},
        "steps_per_s_local": round(sps_local, 1),
        "steps_per_s_mesh1x1_gspmd": round(sps_gspmd, 1),
        "steps_per_s_mesh1x1_shardmap": round(sps_smap, 1),
        "gspmd_over_local": round(sps_gspmd / sps_local, 4),
        "shardmap_over_local": round(sps_smap / sps_local, 4),
    }))


if __name__ == "__main__":
    main()
