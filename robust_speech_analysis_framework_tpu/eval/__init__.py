from .reproduce import compare_to_published, run_reproduction
from .splits import StratifiedKFold, train_test_indices
from .metrics import (
    accuracy_score,
    precision_recall_f1_macro,
    f1_macro,
    roc_auc_score,
    roc_curve,
    classification_metrics,
)

__all__ = [
    "compare_to_published",
    "run_reproduction",
    "StratifiedKFold",
    "train_test_indices",
    "accuracy_score",
    "precision_recall_f1_macro",
    "f1_macro",
    "roc_auc_score",
    "roc_curve",
    "classification_metrics",
]
