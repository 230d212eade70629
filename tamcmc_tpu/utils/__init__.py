from tamcmc_tpu.utils import constants  # noqa: F401
