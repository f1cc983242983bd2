from .presets import PRESETS, ExperimentConfig, TrainConfig, get_preset  # noqa: F401
