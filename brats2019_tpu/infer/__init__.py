"""Inference package. ``Predictor`` is exported lazily: loading it eagerly
creates an import cycle (predictor -> models.cascade -> infer.tiling
re-enters this package) that breaks direct imports of models.cascade."""


def __getattr__(name):
    if name == "Predictor":
        from .predictor import Predictor

        return Predictor
    if name == "EnsemblePredictor":
        from .ensemble import EnsemblePredictor

        return EnsemblePredictor
    raise AttributeError(name)
