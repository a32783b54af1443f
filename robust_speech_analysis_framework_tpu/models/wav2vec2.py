"""Wav2Vec2-base encoder in JAX/Flax, with HF checkpoint porting.

Replaces the reference's HuggingFace/PyTorch Wav2Vec2 inference path
(src/foundation_model_extractor.py:37-131, model facebook/wav2vec2-base-960h)
with a TPU-native implementation: 7-layer strided conv feature encoder
(receptive stride 320 ⇒ ~49.9 frames/s), feature projection to 768, grouped
positional conv embedding, and a 12-layer post-norm transformer encoder.

Batched ragged inference is exact, not approximate: the reference runs one
chunk at a time at its true length, so batching requires that padding not
perturb valid frames. Three properties make that hold here:

* the conv encoder uses VALID (no-pad) convolutions, so output frames below
  the true output length never see padded samples;
* GroupNorm (which torch computes over channels × *time*) is computed over
  valid frames only via ``lengths`` masking;
* the transformer masks padded keys, and padded hidden states are zeroed
  before the positional convolution — which matches unpadded semantics
  exactly because that convolution zero-pads its boundary anyway.

``port_hf_state_dict`` maps a ``transformers`` ``Wav2Vec2Model`` state dict
onto this module's parameter tree (used both for real checkpoints and for
randomly initialized parity tests against torch).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5
    # Computation dtype for matmuls/convs ("float32" or "bfloat16").
    # Params, norms, softmax and residual adds stay float32 either way;
    # bfloat16 halves activation HBM traffic on the MXU-heavy path at
    # ~1e-3-level output perturbation (see tests/test_wav2vec2.py).
    compute_dtype: str = "float32"

    @property
    def cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def output_length(self, n_samples) -> Any:
        """Conv-stack output frames for an input of ``n_samples`` samples."""
        t = n_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            t = (t - k) // s + 1
        return t


def _masked_channel_norm(
    x: jnp.ndarray, lengths: Optional[jnp.ndarray], eps: float
) -> jnp.ndarray:
    """Per-(sample, channel) normalization over valid time frames.

    Equivalent to torch GroupNorm(num_groups=C, C) on an unpadded sequence:
    each channel is normalized by its own mean/var across time.
    """
    if lengths is None:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
    else:
        t = x.shape[1]
        mask = (jnp.arange(t)[None, :, None] < lengths[:, None, None]).astype(x.dtype)
        n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * mask, axis=1, keepdims=True) / n
        var = jnp.sum(((x - mean) * mask) ** 2, axis=1, keepdims=True) / n
    return (x - mean) * jax.lax.rsqrt(var + eps)


class FeatureEncoder(nn.Module):
    """Strided conv stack over raw waveform: (B, L) → (B, T, conv_dim[-1])."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(
        self, waveform: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self.config
        h = waveform[:, :, None]  # (B, L, 1)
        cur_lengths = lengths
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            h = nn.Conv(
                dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                name=f"conv_{i}", dtype=cfg.cdtype,
            )(h)
            if cur_lengths is not None:
                cur_lengths = (cur_lengths - k) // s + 1
            if i == 0:
                # Channel norm in float32: bf16 mean/var over ~16k frames
                # would lose the small-variance channels.
                h = _masked_channel_norm(
                    h.astype(jnp.float32), cur_lengths, cfg.layer_norm_eps
                )
                scale = self.param("gn_scale", nn.initializers.ones, (dim,))
                bias = self.param("gn_bias", nn.initializers.zeros, (dim,))
                h = h * scale + bias
            h = nn.gelu(h, approximate=False)
        return h.astype(jnp.float32), cur_lengths


class FeatureProjection(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm")(x)
        return nn.Dense(
            cfg.hidden_size, name="projection", dtype=cfg.cdtype
        )(x).astype(jnp.float32)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding (kernel 128, groups 16, SAME-ish)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        k = cfg.pos_conv_kernel
        pad = k // 2
        h = nn.Conv(
            cfg.hidden_size,
            (k,),
            padding=[(pad, pad)],
            feature_group_count=cfg.pos_conv_groups,
            name="conv",
            dtype=cfg.cdtype,
        )(x).astype(jnp.float32)
        # Even kernel + symmetric padding yields one extra frame; torch drops
        # the trailing one.
        h = h[:, : x.shape[1], :]
        return nn.gelu(h, approximate=False)


class EncoderLayer(nn.Module):
    """Post-norm transformer block (wav2vec2-base: do_stable_layer_norm=False)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_heads
        head_dim = d // h
        cdt = cfg.cdtype

        q = nn.Dense(d, name="q", dtype=cdt)(x)
        k = nn.Dense(d, name="k", dtype=cdt)(x)
        v = nn.Dense(d, name="v", dtype=cdt)(x)

        b, t, _ = x.shape
        q = q.reshape(b, t, h, head_dim) * jnp.asarray(head_dim**-0.5, cdt)
        k = k.reshape(b, t, h, head_dim)
        v = v.reshape(b, t, h, head_dim)
        # Softmax in float32 regardless of compute dtype (bf16 exp/normalize
        # over 249 keys loses ~2 decimal digits of attention mass).
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(cdt), v
        ).reshape(b, t, d)
        ctx = nn.Dense(d, name="out", dtype=cdt)(ctx).astype(jnp.float32)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_norm")(x + ctx)
        ff = nn.Dense(cfg.intermediate_size, name="ff1", dtype=cdt)(x)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(d, name="ff2", dtype=cdt)(ff).astype(jnp.float32)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ff_norm")(x + ff)


class Wav2Vec2Model(nn.Module):
    """Full encoder: waveform (B, L) [+ lengths] → hidden states (B, T, 768).

    Returns ``(hidden, out_lengths)``; frames at index ≥ out_lengths[b] are
    garbage and must be dropped by the caller (the extractor does).
    """

    config: Wav2Vec2Config = Wav2Vec2Config()

    @nn.compact
    def __call__(
        self, waveform: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self.config
        feats, out_lengths = FeatureEncoder(cfg, name="feature_encoder")(
            waveform, lengths
        )
        h = FeatureProjection(cfg, name="feature_projection")(feats)

        t = h.shape[1]
        if out_lengths is not None:
            valid = jnp.arange(t)[None, :] < out_lengths[:, None]
            # Zero padded frames before the positional conv: matches unpadded
            # semantics because that conv zero-pads its boundary anyway.
            h = jnp.where(valid[:, :, None], h, 0.0)
            attn_bias = jnp.where(valid[:, None, None, :], 0.0, -1e30)
        else:
            attn_bias = None

        h = h + PositionalConvEmbedding(cfg, name="pos_conv")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_norm")(h)
        for i in range(cfg.num_layers):
            h = EncoderLayer(cfg, name=f"layer_{i}")(h, attn_bias)
        return h, out_lengths


# ---------------------------------------------------------------------------
# HF checkpoint porting
# ---------------------------------------------------------------------------

def port_hf_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a ``transformers.Wav2Vec2Model`` state dict to this param tree.

    Accepts a dict of numpy arrays (call ``{k: v.numpy() for k, v in
    model.state_dict().items()}`` on the torch side). Ignores the quantizer /
    masked-spec-embed entries that the reference's inference path never uses.
    Head-model state dicts whose backbone keys carry a ``wav2vec2.`` prefix
    (e.g. ``Wav2Vec2ForCTC``) are accepted by stripping the prefix.
    """
    if any(k.startswith("wav2vec2.") for k in state_dict):
        state_dict = {
            k[len("wav2vec2."):]: v
            for k, v in state_dict.items()
            if k.startswith("wav2vec2.")
        }
    if not any(k.startswith("feature_extractor.conv_layers.") for k in state_dict):
        raise ValueError(
            "state dict does not look like a transformers Wav2Vec2Model: no "
            "'feature_extractor.conv_layers.*' keys found (got e.g. "
            f"{sorted(state_dict)[:3]}...). Pass the bare backbone's "
            "state_dict()."
        )

    def t(name):
        return np.asarray(state_dict[name])

    p: Dict[str, Any] = {}

    n_convs = 1 + max(
        int(k.split(".")[2]) for k in state_dict if k.startswith("feature_extractor.conv_layers.")
    )
    n_layers = 1 + max(
        int(k.split(".")[2]) for k in state_dict if k.startswith("encoder.layers.")
    )

    fe: Dict[str, Any] = {}
    for i in range(n_convs):
        w = t(f"feature_extractor.conv_layers.{i}.conv.weight")  # (out,in,k)
        fe[f"conv_{i}"] = {"kernel": w.transpose(2, 1, 0)}  # → (k,in,out)
    fe["gn_scale"] = t("feature_extractor.conv_layers.0.layer_norm.weight")
    fe["gn_bias"] = t("feature_extractor.conv_layers.0.layer_norm.bias")
    p["feature_encoder"] = fe

    p["feature_projection"] = {
        "norm": {
            "scale": t("feature_projection.layer_norm.weight"),
            "bias": t("feature_projection.layer_norm.bias"),
        },
        "projection": {
            "kernel": t("feature_projection.projection.weight").T,
            "bias": t("feature_projection.projection.bias"),
        },
    }

    # Weight-normed positional conv: weight = g * v / ||v|| over (in, k) dims
    # per output channel. Newer torch exports use parametrizations.*.original{0,1}.
    sd_keys = state_dict.keys()
    if "encoder.pos_conv_embed.conv.weight_g" in sd_keys:
        g = t("encoder.pos_conv_embed.conv.weight_g")
        v = t("encoder.pos_conv_embed.conv.weight_v")
    else:
        g = t("encoder.pos_conv_embed.conv.parametrizations.weight.original0")
        v = t("encoder.pos_conv_embed.conv.parametrizations.weight.original1")
    # torch conv1d weight: (out, in/groups, k); weight_norm dim=2 → norm over
    # (out, in/groups) per k? HF uses dim=2, i.e. g has shape (1, 1, k).
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)
    p["pos_conv"] = {
        "conv": {
            "kernel": w.transpose(2, 1, 0),
            "bias": t("encoder.pos_conv_embed.conv.bias"),
        }
    }

    p["encoder_norm"] = {
        "scale": t("encoder.layer_norm.weight"),
        "bias": t("encoder.layer_norm.bias"),
    }

    for i in range(n_layers):
        pre = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "q": {
                "kernel": t(f"{pre}.attention.q_proj.weight").T,
                "bias": t(f"{pre}.attention.q_proj.bias"),
            },
            "k": {
                "kernel": t(f"{pre}.attention.k_proj.weight").T,
                "bias": t(f"{pre}.attention.k_proj.bias"),
            },
            "v": {
                "kernel": t(f"{pre}.attention.v_proj.weight").T,
                "bias": t(f"{pre}.attention.v_proj.bias"),
            },
            "out": {
                "kernel": t(f"{pre}.attention.out_proj.weight").T,
                "bias": t(f"{pre}.attention.out_proj.bias"),
            },
            "attn_norm": {
                "scale": t(f"{pre}.layer_norm.weight"),
                "bias": t(f"{pre}.layer_norm.bias"),
            },
            "ff1": {
                "kernel": t(f"{pre}.feed_forward.intermediate_dense.weight").T,
                "bias": t(f"{pre}.feed_forward.intermediate_dense.bias"),
            },
            "ff2": {
                "kernel": t(f"{pre}.feed_forward.output_dense.weight").T,
                "bias": t(f"{pre}.feed_forward.output_dense.bias"),
            },
            "ff_norm": {
                "scale": t(f"{pre}.final_layer_norm.weight"),
                "bias": t(f"{pre}.final_layer_norm.bias"),
            },
        }

    return jax.tree.map(jnp.asarray, {"params": p})
