"""Post-LN BERT-style self-attention utterance encoder.

TPU-native rebuild of the reference's `MELDTransEncoder` stack
(reference modules/Transformer.py:65-227):
  * learned positional nn.Embedding(max_len, hidden) added to the inputs,
  * per layer: multi-head self-attention with the additive `(1-mask)*-10000`
    convention (reference src/models.py:156-164), post-LN residual blocks,
  * exact-erf GELU FFN hidden -> 4*hidden -> hidden,
  * TF-style LayerNorm (eps inside sqrt, eps=1e-12).

The whole stack is a single fused XLA program: attention is one batched einsum
chain per layer (MXU-friendly, bf16), masking is additive so there is no
data-dependent control flow.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from facialmmt_tpu.config import EncoderConfig
from facialmmt_tpu.ops.layers import LayerNormTF, TorchLinear

Dtype = Any

ADDITIVE_MASK_VALUE = -10000.0  # reference convention (src/models.py:157)


def additive_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, S) binary mask -> (B, 1, 1, S) additive bias with -10000 on padding."""
    m = mask.astype(dtype)
    return ((1.0 - m) * ADDITIVE_MASK_VALUE)[:, None, None, :]


class SelfAttention(nn.Module):
    """Multi-head self-attention (reference modules/Transformer.py:65-116)."""

    config: EncoderConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, hidden_states, attention_bias, *, deterministic: bool = True):
        cfg = self.config
        h, nh = cfg.hidden_size, cfg.num_attention_heads
        hd = h // nh
        b, s, _ = hidden_states.shape

        q = TorchLinear(h, dtype=self.dtype, name="query")(hidden_states)
        k = TorchLinear(h, dtype=self.dtype, name="key")(hidden_states)
        v = TorchLinear(h, dtype=self.dtype, name="value")(hidden_states)

        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nh, hd)
        v = v.reshape(b, s, nh, hd)

        # 'auto' is SHAPE-gated: measured on v5e at the fusion-tower shapes
        # (batch 128, h=768, nh=12), the per-(b,h) kernel LOSES to XLA's
        # batched einsum — audio S=157 5L: 20.95 -> 25.07 ms (0.84x), vision
        # S=32 2L: 3.03 -> 4.09 ms (0.74x) (experiments/
        # fusion_attn_tpu_check.py).  The towers run at ~67 TFLOP/s, near the
        # measured 80 TFLOP/s matmul ceiling, so the (B, H, S, S) probs
        # round-trip the kernel saves is negligible while S<256 blocks waste
        # MXU lanes (157 pads to 256, D=64 is half a lane tile).  The kernel
        # only wins from ~text-tower scale (S=512: 0.94 vs 1.54 ms), hence
        # the Sk >= 256 gate; 'on' forces it for experiments.
        use_fused = (cfg.fused_attention == "on" or
                     (cfg.fused_attention == "auto"
                      and jax.default_backend() == "tpu" and s >= 256))
        # attention-prob dropout isn't expressible inside the fused kernel;
        # train mode with it active falls back to the XLA path (same gate as
        # the text tower, models/text_encoder.py:55-61)
        if use_fused and (deterministic or
                          cfg.attention_probs_dropout_prob == 0.0):
            from facialmmt_tpu.ops.pallas.attention import fused_attention

            scale = 1.0 / jnp.sqrt(jnp.asarray(hd, hidden_states.dtype))
            ctx = fused_attention(
                (q * scale).transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                attention_bias[:, 0, 0, :])
            return ctx.transpose(0, 2, 1, 3).reshape(b, s, h)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        scores = scores + attention_bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1).astype(hidden_states.dtype)
        probs = nn.Dropout(cfg.attention_probs_dropout_prob)(
            probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return ctx.reshape(b, s, h)


class EncoderLayer(nn.Module):
    """attention -> dense+dropout+LN(res) -> gelu FFN -> dense+dropout+LN(res)
    (reference modules/Transformer.py:178-193)."""

    config: EncoderConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, attention_bias, *, deterministic: bool = True):
        cfg = self.config
        attn_out = SelfAttention(cfg, dtype=self.dtype, name="selfatt")(
            x, attention_bias, deterministic=deterministic)
        attn_out = TorchLinear(cfg.hidden_size, dtype=self.dtype,
                               name="attn_dense")(attn_out)
        attn_out = nn.Dropout(cfg.hidden_dropout_prob)(
            attn_out, deterministic=deterministic)
        x = LayerNormTF(cfg.layer_norm_eps, name="attn_norm")(attn_out + x)

        inter = TorchLinear(cfg.intermediate_size, dtype=self.dtype,
                            name="intermediate")(x)
        inter = jax.nn.gelu(inter, approximate=False)  # exact erf gelu
        out = TorchLinear(cfg.hidden_size, dtype=self.dtype, name="output")(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        return LayerNormTF(cfg.layer_norm_eps, name="out_norm")(out + x)


class UttTransEncoder(nn.Module):
    """Learned-positional post-LN encoder stack (reference modules/Transformer.py:196-227)."""

    config: EncoderConfig
    num_layers: int
    max_len: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feature_input, mask=None, *, deterministic: bool = True):
        """feature_input: (B, S, H); mask: (B, S) binary, 1 = valid."""
        cfg = self.config
        b, s, _ = feature_input.shape
        pos_emb = self.param(
            "position_embeddings", nn.initializers.normal(stddev=1.0),
            (self.max_len, cfg.hidden_size), jnp.float32)
        x = feature_input + pos_emb[:s].astype(feature_input.dtype)[None]

        if mask is None:
            bias = jnp.zeros((b, 1, 1, s), jnp.float32)
        else:
            bias = additive_mask(mask)

        for i in range(self.num_layers):
            x = EncoderLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                x, bias, deterministic=deterministic)
        return x
