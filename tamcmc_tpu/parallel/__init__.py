from tamcmc_tpu.parallel.mesh import make_sampler_mesh, state_shardings  # noqa: F401
from tamcmc_tpu.parallel.sharded import make_sharded_phase_runner, shard_state  # noqa: F401
