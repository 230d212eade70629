from tamcmc_tpu.diagnostics.ess import effective_sample_size, autocorr_time  # noqa: F401
from tamcmc_tpu.diagnostics.summary import posterior_summary  # noqa: F401
