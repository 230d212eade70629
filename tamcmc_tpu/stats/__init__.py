from tamcmc_tpu.stats.likelihoods import (  # noqa: F401
    likelihood_chi22p, likelihood_chi_square, get_likelihood,
)
from tamcmc_tpu.stats.priors import PriorTable, PriorKind  # noqa: F401
