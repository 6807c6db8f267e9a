"""Pre-LN crossmodal (MulT-style) transformer encoder.

TPU-native rebuild of the reference's `CrossModalTransformerEncoder`
(reference modules/CrossmodalTransformer.py:9-96) with the fairseq-derived
multi-head attention (reference modules/multihead_attention.py:9-158) and
sinusoidal positional embedding (reference modules/position_embedding.py:8-80).

Faithfully preserved semantics (parity checklist, SURVEY.md §7):
  * inputs scaled by sqrt(embed_dim) BEFORE the positional embedding is added;
  * positions derive from the feature's 0th channel treated as token ids with
    padding_idx=0: position i gets sinusoidal row (i+1) when x[i, 0] != 0 and the
    all-zero row 0 otherwise (make_positions quirk, position_embedding.py:8-27);
  * q/k/v projections share one packed (3E, E) weight — preserved here as a single
    (E, 3E) kernel so torch checkpoint rows map by slicing;
  * NO key-padding mask inside the encoder — masking is deferred to the final
    additive-attention pooling (reference src/models.py:168-183);
  * pre-LN layers where the SAME first LayerNorm is applied to q, k and v inputs
    in cross-attention mode (CrossmodalTransformer.py:144-151);
  * final LayerNorm after the stack (torch nn.LayerNorm, eps=1e-5).

Layout note: the reference runs (seq, batch, dim); here everything is
(batch, seq, dim) — batch-major is the natural layout for a batched, sharded
TPU program (batch axis maps onto the 'data' mesh axis).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from facialmmt_tpu.ops.layers import LayerNormTF, XavierLinear

Dtype = Any


def sinusoidal_table(num_rows: int, embedding_dim: int,
                     zero_row0: bool = True) -> np.ndarray:
    """fairseq/tensor2tensor sinusoidal table: [sin block | cos block], row 0 zeroed
    (reference modules/position_embedding.py:44-60)."""
    half_dim = embedding_dim // 2
    emb = math.log(10000) / (half_dim - 1)
    freq = np.exp(np.arange(half_dim, dtype=np.float64) * -emb)
    angles = np.arange(num_rows, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(angles), np.cos(angles)], axis=1)
    if embedding_dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_rows, 1))], axis=1)
    if zero_row0:
        table[0, :] = 0
    return table.astype(np.float32)


def channel0_positional_embedding(x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Positional embedding keyed off channel 0 of the features.

    x: (B, S, D).  Valid position i (x[:, i, 0] != 0) selects table row i+1;
    positions whose channel-0 value is exactly 0 select the zero row — exactly the
    reference's make_positions-over-features quirk
    (reference modules/CrossmodalTransformer.py:65-74).
    """
    b, s, _ = x.shape
    nonpad = x[:, :, 0] != 0                          # (B, S)
    rows = jnp.arange(1, s + 1, dtype=jnp.int32)[None, :]  # (1, S)
    idx = jnp.where(nonpad, rows, 0)                  # (B, S)
    return jnp.take(table, idx, axis=0)               # (B, S, D)


class PackedMultiheadAttention(nn.Module):
    """fairseq-style MHA with one packed qkv projection
    (reference modules/multihead_attention.py:9-158).

    Kernel layout: (E, 3E) = transpose of torch's in_proj_weight (3E, E), so the
    checkpoint converter maps `in_proj_weight.T` straight in.  Slices [0:E]=q,
    [E:2E]=k, [2E:3E]=v match torch's row slicing (_in_proj, multihead_attention.py:152-158).
    """

    embed_dim: int
    num_heads: int
    attn_dropout: float = 0.0
    fused_attention: str = "auto"  # 'auto' | 'on' | 'off' (Pallas kernel)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, query, key, value, attn_bias=None, *,
                 deterministic: bool = True):
        """query: (B, Tq, E); key/value: (B, Tk, E); attn_bias: (Tq, Tk) additive or None."""
        e, nh = self.embed_dim, self.num_heads
        hd = e // nh
        b, tq, _ = query.shape
        tk = key.shape[1]

        in_kernel = self.param("in_proj_kernel", nn.initializers.xavier_uniform(),
                               (e, 3 * e), jnp.float32)
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,),
                             jnp.float32)
        cdtype = self.dtype or query.dtype
        wk = in_kernel.astype(cdtype)
        bk = in_bias.astype(cdtype)

        q = jnp.dot(query.astype(cdtype), wk[:, :e]) + bk[:e]
        k = jnp.dot(key.astype(cdtype), wk[:, e:2 * e]) + bk[e:2 * e]
        v = jnp.dot(value.astype(cdtype), wk[:, 2 * e:]) + bk[2 * e:]

        q = q * (hd ** -0.5)
        q = q.reshape(b, tq, nh, hd)
        k = k.reshape(b, tk, nh, hd)
        v = v.reshape(b, tk, nh, hd)

        # 'auto' is SHAPE-gated (Tk >= 256): at the crossmodal shapes
        # (T38 x A157, batch 128) the kernel measured 4.75 -> 6.25 ms (0.76x)
        # vs XLA — same lane-padding story as the self-attn towers
        # (ops/encoder.py gate comment, experiments/fusion_attn_tpu_check.py)
        use_fused = (self.fused_attention == "on" or
                     (self.fused_attention == "auto"
                      and jax.default_backend() == "tpu" and tk >= 256))
        # the kernel takes a (B, Tk) padding bias only — the banded (Tq, Tk)
        # future mask (attn_mask mode, non-default) stays on the XLA path, as
        # does train mode with attention-prob dropout active (same gate as the
        # text tower, models/text_encoder.py:55-61)
        if (use_fused and attn_bias is None and
                (deterministic or self.attn_dropout == 0.0)):
            from facialmmt_tpu.ops.pallas.attention import fused_attention

            ctx = fused_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), jnp.zeros((b, tk), jnp.float32))
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, tq, e)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            if attn_bias is not None:
                scores = scores + attn_bias.astype(scores.dtype)[None, None]
            probs = jax.nn.softmax(scores, axis=-1).astype(cdtype)
            probs = nn.Dropout(self.attn_dropout)(probs,
                                                  deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, tq, e)
        out = XavierLinear(e, dtype=self.dtype, name="out_proj")(ctx)
        return out


def banded_future_mask(tq: int, tk: int) -> jnp.ndarray:
    """buffered_future_mask: -inf strictly above diagonal offset 1+|tk-tq|
    (reference modules/CrossmodalTransformer.py:178-185).  Additive (Tq, Tk)."""
    i = np.arange(tq)[:, None]
    j = np.arange(tk)[None, :]
    band = j - i >= 1 + abs(tk - tq)
    return jnp.where(jnp.asarray(band), jnp.float32(-1e30), jnp.float32(0.0))


class CrossModalLayer(nn.Module):
    """Pre-LN block (reference modules/CrossmodalTransformer.py:98-171)."""

    embed_dim: int
    num_heads: int
    attn_dropout: float = 0.0
    gelu_dropout: float = 0.0
    res_dropout: float = 0.0
    attn_mask: bool = False
    fused_attention: str = "auto"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, x_k=None, x_v=None, *, deterministic: bool = True):
        ln0 = LayerNormTF(1e-5, name="ln0")  # torch nn.LayerNorm semantics
        ln1 = LayerNormTF(1e-5, name="ln1")
        attn = PackedMultiheadAttention(
            self.embed_dim, self.num_heads, self.attn_dropout,
            fused_attention=self.fused_attention, dtype=self.dtype,
            name="self_attn")
        drop_res = nn.Dropout(self.res_dropout)
        drop_gelu = nn.Dropout(self.gelu_dropout)

        residual = x
        xq = ln0(x)
        if self.attn_mask:
            tk = xq.shape[1] if x_k is None else x_k.shape[1]
            bias = banded_future_mask(xq.shape[1], tk)
        else:
            bias = None
        if x_k is None and x_v is None:
            h = attn(xq, xq, xq, bias, deterministic=deterministic)
        else:
            # the SAME ln0 normalizes the key/value streams (reference :149-151)
            h = attn(xq, ln0(x_k), ln0(x_v), bias, deterministic=deterministic)
        x = residual + drop_res(h, deterministic=deterministic)

        residual = x
        h = ln1(x)
        h = jax.nn.gelu(XavierLinear(4 * self.embed_dim, dtype=self.dtype,
                                     name="fc1")(h), approximate=False)
        h = drop_gelu(h, deterministic=deterministic)
        h = XavierLinear(self.embed_dim, dtype=self.dtype, name="fc2")(h)
        h = drop_res(h, deterministic=deterministic)
        return residual + h


class CrossModalTransformerEncoder(nn.Module):
    """Full crossmodal stack (reference modules/CrossmodalTransformer.py:9-96).

    Call with (x,) for self-attention mode or (x, x_k, x_v) for cross-attention.
    Shapes are (batch, seq, embed_dim).
    """

    embed_dim: int
    num_heads: int
    layers: int
    attn_dropout: float = 0.0
    gelu_dropout: float = 0.0
    res_dropout: float = 0.0
    embed_dropout: float = 0.0
    attn_mask: bool = False
    fused_attention: str = "auto"
    max_positions: int = 1024
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_in, x_in_k=None, x_in_v=None, *, deterministic: bool = True):
        scale = math.sqrt(self.embed_dim)
        table = jnp.asarray(sinusoidal_table(self.max_positions + 1, self.embed_dim))
        drop_embed = nn.Dropout(self.embed_dropout)

        def embed(z, *, det):
            pe = channel0_positional_embedding(z, table).astype(z.dtype)
            return drop_embed(scale * z + pe, deterministic=det)

        x = embed(x_in, det=deterministic)
        cross = x_in_k is not None and x_in_v is not None
        if cross:
            x_k = embed(x_in_k, det=deterministic)
            x_v = embed(x_in_v, det=deterministic)

        for i in range(self.layers):
            layer = CrossModalLayer(
                self.embed_dim, self.num_heads, self.attn_dropout,
                self.gelu_dropout, self.res_dropout, self.attn_mask,
                fused_attention=self.fused_attention,
                dtype=self.dtype, name=f"layer_{i}")
            if cross:
                x = layer(x, x_k, x_v, deterministic=deterministic)
            else:
                x = layer(x, deterministic=deterministic)

        return LayerNormTF(1e-5, name="final_norm")(x)
