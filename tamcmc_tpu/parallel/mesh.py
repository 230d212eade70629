"""Device mesh + sharding layout for the tempered-chain ensemble.

This is the rebuild's "distributed communication backend" (SURVEY.md
section 5.8 — the reference has NONE: one process, serial chain loop).

Mesh axes:
  temp  — temperature rungs shard across devices; tempering swaps become
          neighbour exchanges (collective-permute) on this axis
  chain — walker ensembles shard across devices; adaptation statistics
          (mu, Sigma, acceptance means) become psum reductions on this axis

Layout of the SamplerState pytree (T, C, Df leading axes):
  theta/gradL/gradP (T,C,Df) -> P('temp','chain',None)
  logL/logP         (T,C)    -> P('temp','chain')
  mu (T,C,Df), cov/chol (T,C,Df,Df), log_sigma/acc_rate (T,C)
                             -> P('temp','chain', ...) — per-walker
                                adaptation is fully local, no collective
  counters: replicated scalars / P('temp') vectors

Data (nu, spec) are replicated: grids are ~1e5 bins and fit in HBM; the
frequency axis is deliberately NOT sharded (SURVEY.md section 5.7).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tamcmc_tpu.sampler.state import SamplerState


def make_sampler_mesh(n_temp_shards: int, n_chain_shards: int = 1,
                      devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = n_temp_shards * n_chain_shards
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(n_temp_shards, n_chain_shards)
    return Mesh(dev, ("temp", "chain"))


def state_pspecs() -> SamplerState:
    """The ONE definition of the SamplerState partition layout, as plain
    PartitionSpecs (shard_map in/out specs use these directly;
    state_shardings wraps them in NamedShardings for GSPMD placement —
    a single source so the two runners can never disagree)."""
    return SamplerState(
        theta=P("temp", "chain", None),
        logL=P("temp", "chain"),
        logP=P("temp", "chain"),
        gradL=P("temp", "chain", None),
        gradP=P("temp", "chain", None),
        mu=P("temp", "chain", None),
        cov=P("temp", "chain", None, None),
        chol=P("temp", "chain", None, None),
        ichol=P("temp", "chain", None, None),
        log_sigma=P("temp", "chain"),
        step=P(),
        naccept=P("temp"),
        nprop=P(),
        acc_rate=P("temp", "chain"),
        nswap_att=P("temp"),
        nswap_acc=P("temp"),
        scales0=P(None),
        u_center=P(None),
        u_scale=P(None),
    )


def state_shardings(mesh: Mesh) -> SamplerState:
    """A SamplerState-shaped pytree of NamedShardings (from state_pspecs)."""
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        state_pspecs(),
                        is_leaf=lambda x: isinstance(x, P))
