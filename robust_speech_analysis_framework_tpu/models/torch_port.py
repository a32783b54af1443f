"""Port reference PyTorch CNN-LSTM checkpoints into this framework.

The reference saves final models as torch ``state_dict``s inside a dict
{'hyperparameters', 'model_state_dict', ...} (nb03 cell 4; e.g.
``models/final_tuned_cnn_lstm_reading.pt``). This module maps those tensors
onto the Flax :class:`~.cnn_lstm.CNNLSTM` parameter tree so existing
checkpoints keep working on TPU:

* Conv1d ``(out, in, k)`` → Flax ``(k, in, out)`` kernels;
* BatchNorm weight/bias → scale/bias, running stats → batch_stats;
* LSTM ``weight_ih/weight_hh (4H, in)`` → ``wx/wh (in, 4H)`` transposed,
  ``bias_ih + bias_hh`` summed (both use gate order i,f,g,o);
* attention/fc linear weights transposed.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .cnn_lstm import CNNLSTM


def _t(sd: Mapping[str, Any], key: str) -> np.ndarray:
    v = sd[key]
    return np.asarray(v.numpy() if hasattr(v, "numpy") else v)


def _conv(sd, prefix):
    out = {"kernel": _t(sd, prefix + ".weight").transpose(2, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd, prefix + ".bias")
    else:
        out["bias"] = np.zeros(out["kernel"].shape[-1], np.float32)
    return out


def _bn(sd, prefix):
    params = {"scale": _t(sd, prefix + ".weight"), "bias": _t(sd, prefix + ".bias")}
    stats = {
        "mean": _t(sd, prefix + ".running_mean"),
        "var": _t(sd, prefix + ".running_var"),
    }
    return params, stats


def _lstm_layer(sd, layer: int, reverse: bool) -> Dict[str, np.ndarray]:
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    wx = _t(sd, f"lstm.weight_ih_{sfx}").T
    wh = _t(sd, f"lstm.weight_hh_{sfx}").T
    bias = _t(sd, f"lstm.bias_ih_{sfx}") + _t(sd, f"lstm.bias_hh_{sfx}")
    return {"wx": wx, "wh": wh, "bias": bias}


def port_torch_cnn_lstm(
    state_dict: Mapping[str, Any], lstm_layers: int = 2
) -> Dict[str, Any]:
    """torch state dict → Flax variables {'params', 'batch_stats'}."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    for block in ("res_block1", "res_block2"):
        p: Dict[str, Any] = {
            "conv1": _conv(state_dict, f"{block}.conv1"),
            "conv2": _conv(state_dict, f"{block}.conv2"),
        }
        s: Dict[str, Any] = {}
        p["bn1"], s["bn1"] = _bn(state_dict, f"{block}.bn1")
        p["bn2"], s["bn2"] = _bn(state_dict, f"{block}.bn2")
        if f"{block}.shortcut.0.weight" in state_dict:
            p["shortcut_conv"] = _conv(state_dict, f"{block}.shortcut.0")
            p["shortcut_bn"], s["shortcut_bn"] = _bn(state_dict, f"{block}.shortcut.1")
        params[block] = p
        batch_stats[block] = s

    lstm: Dict[str, Any] = {}
    for layer in range(lstm_layers):
        lstm[f"fwd_{layer}"] = _lstm_layer(state_dict, layer, reverse=False)
        lstm[f"bwd_{layer}"] = _lstm_layer(state_dict, layer, reverse=True)
    params["lstm"] = lstm

    params["attention_pooling"] = {
        "score": {
            "kernel": _t(state_dict, "attention_pooling.attention_weights.weight").T,
            "bias": _t(state_dict, "attention_pooling.attention_weights.bias"),
        }
    }
    params["fc"] = {
        "kernel": _t(state_dict, "fc.weight").T,
        "bias": _t(state_dict, "fc.bias"),
    }
    import jax.numpy as jnp
    import jax

    return {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, batch_stats),
    }


def infer_architecture(state_dict: Mapping[str, Any]) -> Dict[str, int]:
    """Recover (input_dim, cnn_out_channels, lstm_hidden_dim, lstm_layers,
    num_classes) from tensor shapes — the reference's saved-checkpoint
    decoding trick (SURVEY.md §6.3)."""
    conv1 = _t(state_dict, "res_block1.conv1.weight")  # (out, in, k)
    wih0 = _t(state_dict, "lstm.weight_ih_l0")  # (4H, C)
    fc = _t(state_dict, "fc.weight")
    n_layers = 0
    while f"lstm.weight_ih_l{n_layers}" in state_dict:
        n_layers += 1
    return {
        "input_dim": int(conv1.shape[1]),
        "cnn_out_channels": int(conv1.shape[0]),
        "lstm_hidden_dim": int(wih0.shape[0] // 4),
        "lstm_layers": n_layers,
        "num_classes": int(fc.shape[0]),
    }


def load_reference_checkpoint(path: str) -> Tuple[CNNLSTM, Dict[str, Any], Dict]:
    """Load a reference ``final_tuned_cnn_lstm_*.pt`` file.

    Returns (model, variables, hyperparameters). Requires torch for
    deserialization of the .pt container.
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload["model_state_dict"] if "model_state_dict" in payload else payload
    hp = payload.get("hyperparameters", {}) if isinstance(payload, dict) else {}
    arch = infer_architecture(sd)
    model = CNNLSTM(
        input_dim=arch["input_dim"],
        num_classes=arch["num_classes"],
        cnn_out_channels=arch["cnn_out_channels"],
        lstm_hidden_dim=arch["lstm_hidden_dim"],
        lstm_layers=arch["lstm_layers"],
        dropout_rate=float(hp.get("dropout_rate", 0.5)),
        activation_fn=str(hp.get("activation_fn", "silu")),
    )
    variables = port_torch_cnn_lstm(sd, lstm_layers=arch["lstm_layers"])
    return model, variables, hp
