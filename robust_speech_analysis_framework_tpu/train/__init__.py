from .loops import (
    TrainConfig,
    Trainer,
    ReduceLROnPlateau,
    train_model,
    evaluate_model,
)

__all__ = [
    "TrainConfig",
    "Trainer",
    "ReduceLROnPlateau",
    "train_model",
    "evaluate_model",
]
