from .lm import LMConfig, MoELanguageModel, lm_loss_fn  # noqa: F401
