from .tpe import Study, Trial, TPESampler, create_study

__all__ = ["Study", "Trial", "TPESampler", "create_study"]
