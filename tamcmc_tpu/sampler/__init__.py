from tamcmc_tpu.sampler.state import SamplerState, MALAHyper  # noqa: F401
from tamcmc_tpu.sampler.problem import Problem  # noqa: F401
from tamcmc_tpu.sampler.mala import mala_step, init_state  # noqa: F401
from tamcmc_tpu.sampler.tempering import tempering_swap, make_beta_ladder  # noqa: F401
from tamcmc_tpu.sampler.driver import run_phase, run_phases, PhasePlan  # noqa: F401
