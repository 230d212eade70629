from tamcmc_tpu.io.data import read_spectrum, write_spectrum  # noqa: F401
from tamcmc_tpu.io.problemfile import read_problem_file, write_problem_file  # noqa: F401
from tamcmc_tpu.io.outputs import OutputWriter, read_bin_samples  # noqa: F401
from tamcmc_tpu.io.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
