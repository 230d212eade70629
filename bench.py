#!/usr/bin/env python
"""Headline benchmark: effective samples / s / chip on the multi-mode
peak-bagging fit (BASELINE.json config 3 scale).

Prints ONE JSON line:
  {"metric": "eff_samples_per_s_per_chip", "value": N, "unit": "ESS/s",
   "vs_baseline": R}

vs_baseline is measured against the sequential NumPy architectural emulation
of the C++ reference (tamcmc_tpu/refimpl.py) run on this host — the real
cpptamcmc was not buildable this round (see BASELINE.md).  Statistical
efficiency (ESS/step/walker) is taken from the TPU run and shared with the
baseline, so the ratio is pure hardware+architecture throughput times
walker-parallelism — the quantity the north star targets.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tamcmc_tpu.utils.cache import enable_compile_cache, ensure_cpu_fallback
enable_compile_cache()
ensure_cpu_fallback()


def _last_driver_issue_peak(default=3.02e12):
    """Fallback issue peak when the in-run microbench reads suspect: the
    most recent NON-suspect driver-captured value (BENCH_r*.json), newest
    round first.  `default` = the round-4 driver capture (3.02e12), the
    oldest value this policy may ever fall back to."""
    import glob
    import re
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                       key=lambda p: -int(re.findall(r"r(\d+)", p)[-1])):
        try:
            doc = json.load(open(path))
            d = doc.get("detail")
            if d is None:
                # driver format: bench stdout captured in a "tail" string
                for line in reversed(doc.get("tail", "").splitlines()):
                    if line.startswith("{") and '"metric"' in line:
                        d = json.loads(line).get("detail", {})
                        break
            if d and not d.get("issue_bench_suspect", True) and \
                    d.get("ops_issue_peak_measured"):
                return float(d["ops_issue_peak_measured"]) * 1e12
        except Exception:
            continue
    return default


def main():
    import sys
    def log(m):
        print(f"# {m}", file=sys.stderr, flush=True)
    from tamcmc_tpu.demos import make_demo
    from tamcmc_tpu.sampler import init_state, make_beta_ladder
    from tamcmc_tpu.sampler.driver import make_phase_runner
    from tamcmc_tpu.diagnostics.ess import effective_sample_size

    # The bench measures the production-serving configuration: bf16
    # profile stream (posterior-validated vs f32 on configs 1-3 —
    # tools/validate_bf16.py, BASELINE.md round 4; +22% measured).
    # TAMCMC_BENCH_PRECISION=f32 reverts for A/Bs.
    precision = os.environ.get("TAMCMC_BENCH_PRECISION", "bf16")
    from tamcmc_tpu.ops.lorentzian import set_profile_precision
    set_profile_precision(precision)

    log("building demo problem")
    problem, hp, plan, meta = make_demo("ms_global", seed=0)
    # Walker count: C=128 measured best on TPU v5e with the round-3 hot
    # path.  Full-bench sweep 2026-08-21 (segment-concat + piece-wise
    # likelihood): C=64 -> 943.6 ESS/s (3.76 ms/step), C=128 -> 1067.8
    # (6.59 ms/step), C=256 -> 1061.9 (13.3 ms/step): step latency scales
    # sublinearly to C=128 (x1.75 for x2 walkers) then linearly — the
    # knee moved up from round 2's C=64 (665 vs 595 at C=128 with the
    # 5.5 ms step) because the cheaper step re-exposed fixed overheads.
    T, C = meta["n_temps"], int(os.environ.get("TAMCMC_BENCH_WALKERS", "128"))
    betas = make_beta_ladder(T, hp.lambda_temp)
    key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    state = init_state(problem, hp, T, C, sub)

    # --- adapt (not timed): burn-in + learning ---
    log("demo built; compiling warm runner")
    warm = make_phase_runner(problem, hp, betas, adapt=True, thin=5, n_emit=100)
    t0 = time.time()
    for _ in range(4):                      # 2000 adaptation steps
        key, sub = jax.random.split(key)
        state, _ = warm(state, sub)
    jax.block_until_ready(state.theta)
    t_warm = time.time() - t0
    log(f"warmup done in {t_warm:.1f}s")

    # --- timed acquire phase ---
    thin, n_emit, reps = 5, 200, 3
    acq = make_phase_runner(problem, hp, betas, adapt=False, thin=thin,
                            n_emit=n_emit)
    key, sub = jax.random.split(key)
    log("compiling acquire runner")
    state, _ = acq(state, sub)              # compile + settle (not timed)
    jax.block_until_ready(state.theta)
    t1 = time.time()
    chunks = []
    for _ in range(reps):
        key, sub = jax.random.split(key)
        state, outs = acq(state, sub)
        chunks.append(outs["theta0"])
    jax.block_until_ready(state.theta)
    # belt-and-braces sync: block_until_ready does not reliably wait over
    # the axon tunnel for SMALL programs (round-4 measurement lesson in
    # BASELINE.md); at this scale (~20 s of queued scans) the dispatch
    # queue makes it approximately right, and the scalar fetch (~60 ms,
    # 0.3%) closes the gap exactly
    float(np.asarray(state.logL)[0, 0])
    dt = time.time() - t1
    log(f"timed acquire done in {dt:.1f}s")
    theta = np.concatenate([np.asarray(c) for c in chunks], axis=0)  # (E,C,Df)

    n_steps = reps * n_emit * thin
    steps_per_s = n_steps / dt

    # --- roofline accounting (SURVEY section 7 stage 7) ---
    # Analytic op model of the fused step.  Lorentzian per (component, bin):
    # 1 divide + ~6 cheap flops (factored kernel, ops/lorentzian.py); chi22p
    # logL per bin: 1 log + 1 divide + ~3 flops; backward ~= 2x forward
    # flops + ~1 divide per component-bin (custom VJP recomputes inv once).
    # With static truncation windows the component-bin count comes from the
    # model's group table, not K*N.
    spec_np_l = meta.get("spec_kwargs", {}).get("n_per_l", (6, 6, 6, 0))
    K = sum(n * (2 * l + 1) for l, n in enumerate(spec_np_l))
    N = int(np.asarray(problem.nu).shape[0])
    W = T * C
    wgroups = getattr(problem.model_fn, "_window_groups", None)
    comp_bins = (sum(len(idx) * (hi - lo) for idx, lo, hi in wgroups)
                 if wgroups else K * N)
    flops_fwd_walker = 6 * comp_bins + 5 * N
    divs_fwd_walker = comp_bins + N
    logs_fwd_walker = N
    flops_step = 3 * flops_fwd_walker * W
    divs_step = 2 * divs_fwd_walker * W
    logs_step = logs_fwd_walker * W
    achieved_gflops = (flops_step + divs_step + logs_step) \
        * steps_per_s / 1e9
    # LEGACY op-mix speed-of-light (kept for r01/r02 continuity): per-op
    # rates measured 2026-08-20 (f32 FMA-mix ~6.4e12 flop/s, f32 divide
    # ~0.44e12 /s, transcendental ~0.2e12 /s).  Round-3 measurements
    # SUPERSEDED the divide rate: in fused XLA elementwise code an A/B with
    # the divide replaced by a multiply is time-NEUTRAL (the reciprocal
    # lowers into the same issue stream), so this figure now UNDERSTATES
    # the chip and the fraction below correspondingly flatters the step.
    sol_s_per_step = (flops_step / 6.4e12 + divs_step / 0.44e12
                      + logs_step / 0.2e12)
    sol_frac = sol_s_per_step / (1.0 / steps_per_s)

    # Round-3 recalibrated roofline — VPU instruction ISSUE rate.
    # (BASELINE.md "round-3 roofline recalibration"):
    #  * 8 INDEPENDENT fma streams hide the fma latency that makes the
    #    serial fma_chain cross-check below read ~0.33e12 (self-flagged);
    #    a healthy v5e chip sustains ~3.94e12 vector ops/s (4 ops/lane/
    #    cycle x 1024 lanes x 0.94 GHz);
    #  * divides/reciprocals cost ~ordinary issue slots, not a separate
    #    slow pipe (divide->multiply substitution: time-neutral).
    # Instruction model of the current kernels, per (component, bin):
    # fwd ~7 (fma x, fma v, hw-recip + newton ~3, fma accumulate, mask);
    # bwd ~14 (recompute + 5 shared-temp reduction streams); likelihood
    # ~24 issue ops per (bin, walker) fwd+bwd combined, + 1 log (rate
    # 0.2e12/s).  CAVEAT (round-3 advisor): the 24*N*W term assumes fully
    # BATCHED quiet bins; the piece-wise path keeps quiet-bin sums
    # unbatched when the noise block is fixed, so frac_of_issue_sol can
    # overstate the true ceiling fraction on fixed-noise fits (the bench
    # config fits noise, so the model is exact here).
    # The issue peak is MEASURED IN-RUN on this session's chip (round-3
    # VERDICT weak #2: a hard-coded constant from another session is not a
    # roofline): 8 independent chained-fma streams, best-of-6 min time
    # (tunnel stalls only ever ADD time).
    log("measuring VPU issue peak (8 independent fma streams)")
    # Methodology notes (each clause learned from a measured failure):
    #  * the map must be NON-AFFINE (x*x + c): XLA algebraically collapses
    #    repeated affine chains x*c+d — a first cut read 450e12 "ops/s";
    #  * neither jax.block_until_ready(tuple) nor .block_until_ready() on
    #    the axon tunnel actually waits for THIS computation (0.1-0.4 ms
    #    returns on 20 ms kernels) — only a host FETCH truly syncs;
    #  * a single fetch costs ~60 ms over the tunnel, so the rate comes
    #    from a TWO-POINT fit: k=1 vs k=9 chained executions with one
    #    scalar fetch each — the fetch/dispatch overhead cancels in the
    #    difference.  Best of 3 trials (stalls only ever slow a trial).
    n_streams, ishape, iiters, iunroll = 8, (512, 128), 4096, 32
    xs0 = tuple(jnp.full(ishape, 0.3 + 1e-3 * i, jnp.float32)
                for i in range(n_streams))

    @jax.jit
    def issue_bench(xs):
        def body(i, xs):
            for _ in range(iunroll):
                xs = tuple(x * x + 0.24 for x in xs)   # bounded: -> 0.4
            return xs
        return jax.lax.fori_loop(0, iiters, body, xs)

    def _run_k(k):
        xs = xs0
        t = time.time()
        for _ in range(k):
            xs = issue_bench(xs)
        float(np.asarray(xs[0])[0, 0])                 # true sync
        return time.time() - t

    _run_k(1)                                          # compile + warm
    issue_elems = n_streams * ishape[0] * ishape[1] * iiters * iunroll
    rates = []
    for _ in range(3):
        t1 = min(_run_k(1) for _ in range(3))
        t9 = min(_run_k(9) for _ in range(2))
        if t9 > t1:
            rates.append(8 * issue_elems / (t9 - t1))  # 1 fma = 1 issue op
    ops_issue_peak_measured = max(rates) if rates else 0.0
    # PRECISION-AWARE op counts (round-4 VERDICT weak #1: the f32-equivalent
    # model stopped bounding anything once the profile stream packed 2/lane
    # in bf16).  Issue-slot charges per (component, bin), from the actual
    # kernels (ops/lorentzian.py _fwd_impl/_bwd):
    #   f32 : fwd 7  (fma x, recip+newton ~3, profile fma x2, accumulate)
    #         bwd 14 (recompute inv ~4, u/p/q/r/s chains 5, reductions 5)
    #   bf16: the x fma and every cross-lane accumulation stay f32 (full
    #         slot); the packed profile/backward streams issue 2 lanes/slot
    #         (charged 1/2):  fwd 2 f32 + 7 bf16/2 = 5.5
    #                         bwd 6 f32 + 9 bf16/2 = 10.5
    # The chi22p epilogue (24/bin) and its log are f32 in both modes.
    if precision == "bf16":
        fwd_ops, bwd_ops = 5.5, 10.5
    else:
        fwd_ops, bwd_ops = 7.0, 14.0
    ops_step = (fwd_ops + bwd_ops) * comp_bins * W + 24 * N * W
    achieved_issue_ops = ops_step * steps_per_s
    # a peak below the step's own achieved issue rate is physically
    # impossible — tunnel-degraded measurement; fall back to the last
    # NON-SUSPECT driver-captured peak and flag it (round-4 VERDICT weak
    # #5: a hand-picked session constant above every measured peak would
    # deflate frac_of_issue_sol out of comparability)
    issue_bench_suspect = ops_issue_peak_measured < achieved_issue_ops
    ops_issue_peak = (_last_driver_issue_peak() if issue_bench_suspect
                      else ops_issue_peak_measured)
    issue_sol_s = ops_step / ops_issue_peak + logs_step / 0.2e12
    issue_frac = issue_sol_s / (1.0 / steps_per_s)

    # Empirical VPU f32 peak on THIS chip: a fused-multiply-add chain with
    # high arithmetic intensity (UNROLL chained FMAs per element per loop
    # iteration -> 2*UNROLL flops/4 bytes, far above the HBM roofline knee,
    # so the measurement is compute-bound, not bandwidth-bound).
    log("measuring VPU FMA peak")
    size, iters, unroll = 1 << 21, 64, 32
    xb = jnp.full((size,), 1.000001, jnp.float32)

    @jax.jit
    def fma_chain(y):
        def body(i, y):
            for _ in range(unroll):
                y = y * 1.0000001 + 1e-9
            return y
        return jax.lax.fori_loop(0, iters, body, y)

    fma_chain(xb).block_until_ready()
    # best-of-6: the remote-TPU tunnel occasionally stalls a dispatch for
    # tens of ms, which at this kernel size reads as a 10-20x-too-low
    # "peak"; the MIN time (not the mean) is the only robust estimator here
    dts = []
    for _ in range(6):
        t = time.time()
        fma_chain(xb).block_until_ready()
        dts.append(time.time() - t)
    dt_fma = min(dts)
    vpu_peak_gflops = 2 * size * iters * unroll / dt_fma / 1e9
    roofline_frac = achieved_gflops / max(vpu_peak_gflops, 1e-9)
    fma_bench_suspect = vpu_peak_gflops < achieved_gflops

    # --- where the step time goes: fwd vs fwd+bwd vs full step ---
    # 4 extra tunnel compiles (~30-60 s each) — opt-in so the driver's
    # default bench stays inside its timeout.  Run once per perf pass with
    # TAMCMC_BENCH_PROFILE=1; results recorded in BASELINE.md.
    t_step = dt / n_steps
    t_fwd = t_fwdbwd = t_chol = None
    if os.environ.get("TAMCMC_BENCH_PROFILE"):
        log("profiling step components")
        # physical positions: state.theta is standardized u-space
        th0 = state.u_center + state.u_scale * state.theta

        def timeit(fn, *a):
            out = fn(*a)                 # compile + warm
            jax.block_until_ready(out)
            t = time.time()
            for _ in range(5):
                out = fn(*a)
            jax.block_until_ready(out)
            return (time.time() - t) / 5

        # every jitted call over the remote-TPU tunnel pays an RPC floor of
        # several ms; measure it with a no-op and subtract, otherwise the
        # "anatomy" just measures the tunnel
        t_noop = timeit(jax.jit(lambda x: x + 1.0), th0)
        fwd = jax.jit(lambda x: problem.batched_log_parts(x))
        fwdbwd = jax.jit(lambda x: problem.batched_logparts_and_grad(x))
        t_fwd = max(timeit(fwd, th0) - t_noop, 1e-6)
        t_fwdbwd = max(timeit(fwdbwd, th0) - t_noop, 1e-6)

        @jax.jit
        def chol_fn(cv):
            return jnp.linalg.cholesky(cv + 1e-8 * jnp.eye(cv.shape[-1]))

        t_chol = max(timeit(chol_fn, state.cov) - t_noop, 1e-6)
    # --- mesh-1x1 sharding ratios (round-4 VERDICT missing #4: the scaling
    # posture must live in the driver-captured artifact, not hand-run tool
    # output).  Zero-communication overhead of the GSPMD annotations and the
    # explicit shard_map runner vs the local runner, same shapes/work.
    # TAMCMC_BENCH_SHARDING=0 skips (saves 2 compiles for quick A/Bs).
    shard_ratios = {}
    if os.environ.get("TAMCMC_BENCH_SHARDING", "1") != "0":
        from tamcmc_tpu.parallel.mesh import make_sampler_mesh
        from tamcmc_tpu.parallel.sharded import (make_sharded_phase_runner,
                                                 shard_state)
        from tamcmc_tpu.parallel.shardmap_runner import \
            make_shardmap_phase_runner
        mesh1 = make_sampler_mesh(1, 1)
        for kind, make in (("gspmd", make_sharded_phase_runner),
                           ("shardmap", make_shardmap_phase_runner)):
            log(f"measuring mesh-1x1 {kind} ratio")
            runner = make(problem, hp, betas, mesh1, False, thin, n_emit)
            # deep-copy first: device_put onto the same single device is a
            # no-copy alias, and the runner's donation would delete the
            # shared buffer out from under `state`
            st = shard_state(jax.tree.map(lambda x: jnp.array(x, copy=True),
                                          state), mesh1)
            key, sub = jax.random.split(key)
            st, _ = runner(st, sub)             # compile + settle
            float(np.asarray(st.logL)[0, 0])    # fetch-sync (round-4 lesson)
            best = None
            for _ in range(2):
                key, sub = jax.random.split(key)
                ts = time.time()
                st, _ = runner(st, sub)
                float(np.asarray(st.logL)[0, 0])
                best = min(best or 1e9, time.time() - ts)
            shard_ratios[kind] = round((n_emit * thin / best) / steps_per_s, 3)
            log(f"mesh-1x1 {kind}: ratio {shard_ratios[kind]}")

    # ESS summed over free params' slowest? Headline: mean ESS across params
    E, Cc, Df = theta.shape
    ess = np.array([effective_sample_size(theta[:, :, i]) for i in range(Df)])
    ess_med = float(np.median(ess))
    ess_per_s = ess_med / dt
    ess_per_step_per_walker = ess_med / (E * thin) / Cc  # thinned emits * thin raw steps

    # --- baseline: sequential numpy emulation of the C++ architecture ---
    from tamcmc_tpu.refimpl import SequentialSampler
    spec_np = np.asarray(problem.spec, dtype=np.float64)
    nu_np = np.asarray(problem.nu, dtype=np.float64)
    model_fn = jax.jit(problem.model_fn)

    free_idx = problem.free_idx
    p0 = np.asarray(problem.params0, dtype=np.float64)

    # pure-numpy model+likelihood (no jax) for the baseline
    def np_loglike(x):
        full = p0.copy()
        full[free_idx] = x
        m = _np_model(full, nu_np)
        m = np.maximum(m, 1e-12)
        return -np.sum(np.log(m) + spec_np / m)

    layout = problem.layout
    import tamcmc_tpu.ops.rotation as rot

    def _np_model(p, nu):
        """numpy mirror of model_MS_Global_a1etaa3_HarveyLike WITH the
        reference's algorithmic advantages (VERDICT round-1 weak item 2 /
        next item 6): each Lorentzian is evaluated only inside its
        truncation window c*Gamma (optimum_lorentzian_calc_* [U] —
        ~10-15%% of the grid per mode), and the per-(l,n,m) component loop
        body is one vectorised slice op, as Eigen vectorises the C++ inner
        loop.  This is the STRONG baseline: emulating the C++'s algorithm,
        not just its serial architecture."""
        def blk(name):
            o = layout.offset(name)
            return p[o:o + layout.size(name)]
        heights, widths = blk("heights"), blk("widths")
        vis = blk("visibilities")
        f0 = blk("freq_l0")
        inc = blk("inclination")[0]
        a1, sw, a3, asym = blk("rot")
        trunc = float(blk("trunc")[0]) if "trunc" in layout.names else 40.0
        total = np.zeros_like(nu)
        ci, si = np.cos(inc), np.sin(inc)
        eps_l = {0: np.array([1.0]),
                 1: np.array([0.5 * si**2, ci**2, 0.5 * si**2]),
                 2: np.array([3 / 8 * si**4, 1.5 * ci**2 * si**2,
                              0.25 * (3 * ci**2 - 1) ** 2,
                              1.5 * ci**2 * si**2, 3 / 8 * si**4])}
        for l in (0, 1, 2):
            fl = blk(f"freq_l{l}")
            if fl.size == 0:
                continue
            h = heights if l == 0 else np.interp(fl, f0, heights) * vis[l - 1]
            w = widths if l == 0 else np.interp(fl, f0, widths)
            m_arr = np.arange(-l, l + 1)
            p3 = (np.asarray(rot.rl_polynomials(l, 3)[2]) if l >= 2
                  else np.zeros(2 * l + 1))
            for i in range(fl.size):
                wi = max(w[i], 1e-6)
                nus = fl[i] + m_arr * a1 + a3 * p3
                half = trunc * wi                   # c*Gamma window [U]
                for j, eps in enumerate(eps_l[l]):
                    lo = np.searchsorted(nu, nus[j] - half)
                    hi = np.searchsorted(nu, nus[j] + half)
                    x = 2.0 * (nu[lo:hi] - nus[j]) / wi
                    total[lo:hi] += h[i] * eps / (1.0 + x * x)
        noise = blk("noise")
        for k in range(3):
            A, B, pw = noise[3 * k:3 * k + 3]
            if A > 0 and B > 0:
                total += A / (1 + (B * nu) ** pw)
        return total + max(noise[9], 0.0)

    def np_logprior(x):
        return 0.0  # flat inside support; adequate for throughput timing

    scales = np.asarray(
        __import__("tamcmc_tpu.sampler.mala", fromlist=["default_init_scales"]
                   ).default_init_scales(problem))
    x0 = p0[free_idx]
    seq = SequentialSampler(np_loglike, np_logprior, x0, scales,
                            n_temps=T, lambda_temp=hp.lambda_temp, seed=0)
    n_ref = 30
    t2 = time.time()
    for _ in range(n_ref):
        seq.step()
    ref_dt = time.time() - t2
    ref_steps_per_s = n_ref / ref_dt
    ref_ess_per_s = ess_per_step_per_walker * ref_steps_per_s  # 1 walker/rung

    result = {
        "metric": "eff_samples_per_s_per_chip",
        "value": round(ess_per_s, 2),
        "unit": "ESS/s",
        "vs_baseline": round(ess_per_s / max(ref_ess_per_s, 1e-12), 1),
        # headline-level so cross-round comparisons can't miss a precision
        # switch (round-4 advisor, low)
        "precision": precision,
        "detail": {
            "device": str(jax.devices()[0]),
            "precision": precision,
            "raw_steps_per_s": round(steps_per_s, 1),
            "walkers": int(Cc), "temps": int(T),
            "grid_bins": int(np.asarray(problem.nu).shape[0]),
            "free_dims": int(Df),
            "ess_median_per_param": round(ess_med, 1),
            "baseline_steps_per_s_numpy_sequential": round(ref_steps_per_s, 2),
            "warmup_s": round(t_warm, 1),
            "timed_s": round(dt, 1),
            # roofline + step anatomy (SURVEY section 7 stage 7)
            "achieved_gflops_f32": round(achieved_gflops, 1),
            "op_mix_speed_of_light_ms": round(sol_s_per_step * 1e3, 3),
            "frac_of_op_mix_sol": round(sol_frac, 3),
            "issue_speed_of_light_ms": round(issue_sol_s * 1e3, 3),
            "frac_of_issue_sol": round(issue_frac, 3),
            "ops_issue_peak_measured": round(ops_issue_peak_measured / 1e12,
                                             3),
            "ops_issue_peak_used_e12": round(ops_issue_peak / 1e12, 3),
            "issue_bench_suspect": bool(issue_bench_suspect),
            "issue_op_model": {"fwd_per_comp_bin": fwd_ops,
                               "bwd_per_comp_bin": bwd_ops,
                               "likelihood_per_bin": 24,
                               "precision_aware": True},
            "issue_model_note": ("op counts assume fully batched quiet "
                                 "bins; exact when the noise block is "
                                 "free (bench config), optimistic ceiling "
                                 "when noise is fixed.  PRECISION-AWARE "
                                 "(round-5): bf16-packed streams are "
                                 "charged 1/2 issue slot, f32 fma/"
                                 "accumulate streams full — "
                                 "frac_of_issue_sol again bounds the "
                                 "remaining gap in both modes"),
            "comp_bins_per_walker": int(comp_bins),
            "window_reduction": round(K * N / comp_bins, 2),
            "vpu_fma_peak_gflops_measured": round(vpu_peak_gflops, 1),
            "roofline_frac_of_vpu_fma": round(roofline_frac, 3),
            "fma_bench_suspect": bool(fma_bench_suspect),
            "lorentzian_components": int(K),
            # mesh-1x1 sharded/local steps-per-s ratios (driver-captured
            # scaling posture; ~1.0 = zero-communication annotation
            # overhead is nil, BASELINE.md round 4 real-chip table)
            **({f"mesh1x1_{k}_ratio": v for k, v in shard_ratios.items()}),
            "t_full_step_ms": round(t_step * 1e3, 3),
            **({"t_model_fwd_ms": round(t_fwd * 1e3, 3),
                "t_model_fwdbwd_ms": round(t_fwdbwd * 1e3, 3),
                "t_chol_refresh_ms": round(t_chol * 1e3, 3),
                "model_eval_frac_of_step": round(t_fwdbwd / t_step, 3)}
               if t_fwd is not None else {}),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
