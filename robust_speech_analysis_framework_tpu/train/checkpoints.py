"""Model/result checkpointing.

Reference artifact schemas preserved (SURVEY.md §5 checkpoint/resume):

* final model files: dict {'hyperparameters', 'model_state_dict',
  'train_loss_history', 'val_loss_history'} (nb03 cell 4) — here the
  state dict is the flattened Flax parameter tree as numpy arrays, saved
  with pickle for the reference-compatible path and with Orbax for the
  TPU-native path (sharded arrays, async save, versioned).
* result pickles: {'results_df', 'predictions', 'weights'[, 'histories']}
  (src/dl_cv_strategies.py:344-354, 432-441).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def flatten_params(params: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flax param tree → {'a/b/kernel': ndarray} flat dict."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for path, leaf in flat:
        key = "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        out[key] = np.asarray(leaf)
    return out


def unflatten_params(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    """Rebuild a param tree shaped like ``template`` from a flat dict."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing parameter {key}")
        arr = np.asarray(flat[key])
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {arr.shape} vs model {leaf.shape}"
            )
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_model_checkpoint(
    path: str,
    hyperparameters: Dict[str, Any],
    variables: Any,
    train_loss_history,
    val_loss_history,
) -> None:
    """Reference-schema model artifact (pickle)."""
    payload = {
        "hyperparameters": dict(hyperparameters),
        "model_state_dict": flatten_params(variables),
        "train_loss_history": list(train_loss_history),
        "val_loss_history": list(val_loss_history),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        pickle.dump(payload, fh)


def load_model_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as fh:
        return pickle.load(fh)


def save_results_pickle(path: str, results_df, predictions, weights=None,
                        histories=None) -> None:
    """Reference-schema experiment results artifact."""
    payload: Dict[str, Any] = {
        "results_df": results_df,
        "predictions": predictions,
    }
    if weights is not None:
        payload["weights"] = np.asarray(weights)
    if histories is not None:
        payload["histories"] = histories
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        pickle.dump(payload, fh)


def load_results_pickle(path: str) -> Dict[str, Any]:
    with open(path, "rb") as fh:
        return pickle.load(fh)


# --- Orbax-backed TrainState checkpointing (TPU-native path) --------------

def save_train_state(directory: str, state, step: int = 0) -> None:
    """Orbax save of a full TrainState (params, batch_stats, opt_state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(path, f"state_{step}"),
            jax.tree.map(np.asarray, state),
            force=True,
        )


def restore_train_state(directory: str, template, step: int = 0):
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.join(path, f"state_{step}"), template
        )
