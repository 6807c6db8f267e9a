"""Native JAX RoBERTa/BERT dialogue text encoder.

The reference calls HuggingFace's torch `RobertaModel`/`BertModel` over the whole
dialogue token sequence (reference src/models.py:72-77, 99-104) and uses only the
last hidden state.  Here the encoder is implemented natively (one fused XLA program,
bf16 on the MXU); released HF torch checkpoints are mapped into this module's pytree
by checkpoint/torch_convert.py::convert_hf_text_encoder.

Faithful semantics:
  * RoBERTa position ids: pad positions get padding_idx, real tokens get
    padding_idx + cumulative-position (HF create_position_ids_from_input_ids);
  * BERT position ids: plain arange; token-type embeddings all-zero-type;
  * post-LN encoder blocks, exact-erf GELU, LayerNorm eps from config
    (1e-5 roberta / 1e-12 bert);
  * returns the full last hidden state (the pooler is unused by the reference).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from facialmmt_tpu.config import TextEncoderConfig
from facialmmt_tpu.ops.layers import LayerNormTF, TorchLinear

Dtype = Any
BIG_NEG = -1e30


def roberta_position_ids(input_ids: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    mask = (input_ids != padding_idx).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + padding_idx


class TextEncoderLayer(nn.Module):
    config: TextEncoderConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, bias, deterministic: bool = True):
        # `deterministic` is positional so nn.remat can mark it static
        cfg = self.config
        h, nh = cfg.hidden_size, cfg.num_heads
        hd = h // nh
        b, s, _ = x.shape

        q = TorchLinear(h, dtype=self.dtype, name="query")(x).reshape(b, s, nh, hd)
        k = TorchLinear(h, dtype=self.dtype, name="key")(x).reshape(b, s, nh, hd)
        v = TorchLinear(h, dtype=self.dtype, name="value")(x).reshape(b, s, nh, hd)

        use_fused = (cfg.fused_attention == "on" or
                     (cfg.fused_attention == "auto"
                      and jax.default_backend() == "tpu"))
        # dropout on attention probs isn't expressible inside the fused kernel;
        # train mode (attn dropout active) falls back to the XLA path
        if use_fused and (deterministic or
                          cfg.attention_probs_dropout_prob == 0.0):
            from facialmmt_tpu.ops.pallas.attention import fused_attention

            scale = 1.0 / jnp.sqrt(jnp.asarray(hd, x.dtype))
            ctx = fused_attention(
                (q * scale).transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                bias[:, 0, 0, :])
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32)) + bias
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            probs = nn.Dropout(cfg.attention_probs_dropout_prob)(
                probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, h)

        attn_out = TorchLinear(h, dtype=self.dtype, name="attn_out")(ctx)
        attn_out = nn.Dropout(cfg.hidden_dropout_prob)(
            attn_out, deterministic=deterministic)
        x = LayerNormTF(cfg.layer_norm_eps, name="attn_norm")(attn_out + x)

        inter = TorchLinear(cfg.intermediate_size, dtype=self.dtype,
                            name="intermediate")(x)
        inter = jax.nn.gelu(inter, approximate=False)
        out = TorchLinear(h, dtype=self.dtype, name="output")(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        return LayerNormTF(cfg.layer_norm_eps, name="out_norm")(out + x)


class TextEncoder(nn.Module):
    """Returns the last hidden state (B, S, hidden_size)."""

    config: TextEncoderConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask, *, deterministic: bool = True):
        cfg = self.config
        word_emb = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                            embedding_init=nn.initializers.normal(0.02),
                            name="word_embeddings")(input_ids)
        if cfg.model_type == "roberta":
            pos_ids = roberta_position_ids(input_ids, cfg.pad_token_id)
        else:
            pos_ids = jnp.arange(input_ids.shape[1], dtype=jnp.int32)[None, :]
            pos_ids = jnp.broadcast_to(pos_ids, input_ids.shape)
        pos_emb = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                           embedding_init=nn.initializers.normal(0.02),
                           name="position_embeddings")(pos_ids)
        type_emb = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                            embedding_init=nn.initializers.normal(0.02),
                            name="token_type_embeddings")(
                                jnp.zeros_like(input_ids))
        x = word_emb + pos_emb + type_emb
        x = LayerNormTF(cfg.layer_norm_eps, name="embeddings_norm")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        bias = ((1.0 - attention_mask.astype(jnp.float32)) * BIG_NEG)[:, None, None, :]
        # rematerialize each layer in the backward pass: recompute activations
        # instead of storing 24 layers x 512 tokens of residuals (jax.checkpoint;
        # required to train roberta-large-size towers at large batches in
        # 16 GB HBM).  'auto': only above 4096 tokens — small multimodal
        # microbatches (4 dialogues x 512) skip the re-forward
        # (TextEncoderConfig.remat note)
        from facialmmt_tpu.config import resolve_remat

        layer_cls = (nn.remat(TextEncoderLayer, static_argnums=(3,))
                     if resolve_remat(cfg.remat,
                                      input_ids.shape[0] * input_ids.shape[1],
                                      4096)
                     else TextEncoderLayer)
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, dtype=self.dtype, name=f"layer_{i}")(
                x, bias, deterministic)
        return x
