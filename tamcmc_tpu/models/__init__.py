from tamcmc_tpu.models.registry import build_model, list_models, ModelFamily  # noqa: F401
