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


def state_shardings(mesh: Mesh) -> SamplerState:
    """A SamplerState-shaped pytree of NamedShardings."""
    def s(*spec):
        return NamedSharding(mesh, P(*spec))
    return SamplerState(
        theta=s("temp", "chain", None),
        logL=s("temp", "chain"),
        logP=s("temp", "chain"),
        gradL=s("temp", "chain", None),
        gradP=s("temp", "chain", None),
        mu=s("temp", "chain", None),
        cov=s("temp", "chain", None, None),
        chol=s("temp", "chain", None, None),
        ichol=s("temp", "chain", None, None),
        log_sigma=s("temp", "chain"),
        step=s(),
        naccept=s("temp"),
        nprop=s(),
        acc_rate=s("temp", "chain"),
        nswap_att=s("temp"),
        nswap_acc=s("temp"),
        scales0=s(None),
        u_center=s(None),
        u_scale=s(None),
    )
