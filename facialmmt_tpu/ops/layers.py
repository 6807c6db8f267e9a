"""Core layers shared across the framework.

All modules are flax.linen, fully batched and static-shape; masking is explicit so
XLA sees no data-dependent control flow.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax grads NaN-free in bf16


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default weight init (kaiming_uniform with a=sqrt(5)), expressed
    on the flax kernel layout (in_features, out_features).

    fan_in = shape[0]; bound = 1/sqrt(fan_in) after the gain algebra collapses.
    Used so training-from-scratch matches the reference's init statistics.
    """
    fan_in = shape[0]
    gain = math.sqrt(2.0 / (1 + 5.0))  # leaky-relu gain with a=sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """nn.Dense with torch nn.Linear default initialization (overridable).

    Keeping init statistics identical to the reference matters for from-scratch
    training parity; converted checkpoints overwrite these anyway.  Modules that
    re-init their linears (e.g. Swin's trunc_normal _init_weights, reference
    Swin_Transformer.py:498-505) pass kernel_init/bias_init explicitly.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k_init = self.kernel_init or torch_linear_kernel_init
        kernel = self.param("kernel", k_init,
                            (in_features, self.features), self.param_dtype)
        y_dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(y_dtype), kernel.astype(y_dtype),
                    preferred_element_type=y_dtype)
        if self.use_bias:
            b_init = self.bias_init or torch_linear_bias_init(in_features)
            bias = self.param("bias", b_init, (self.features,), self.param_dtype)
            y = y + bias.astype(y_dtype)
        return y


class XavierLinear(nn.Module):
    """Linear with xavier_uniform kernel + zero bias, as the crossmodal stack uses
    (reference modules/CrossmodalTransformer.py:188-193)."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (in_features, self.features), self.param_dtype)
        y_dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(y_dtype), kernel.astype(y_dtype),
                    preferred_element_type=y_dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              self.param_dtype)
            y = y + bias.astype(y_dtype)
        return y


class LayerNormTF(nn.Module):
    """TF-style LayerNorm: epsilon inside the square root, biased variance
    (reference modules/Transformer.py:48-61).  Stats in fp32 for bf16 stability."""

    eps: float = 1e-12
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (dim,), self.param_dtype)
        xf = x.astype(jnp.float32)
        u = jnp.mean(xf, axis=-1, keepdims=True)
        s = jnp.mean(jnp.square(xf - u), axis=-1, keepdims=True)
        y = (xf - u) * jax.lax.rsqrt(s + self.eps)
        y = weight * y + bias
        return y.astype(x.dtype)


class AdditiveAttention(nn.Module):
    """Masked additive-attention pooling (reference modules/Transformer.py:8-45).

    score_t = v^T tanh(P(x_t) + Q(q));  alpha = softmax(score + mask);  out = alpha @ x.

    The reference early-returns the squeezed input when seq_len == 1
    (modules/Transformer.py:32-33); seq lengths are static under jit so the same
    branch is resolved at trace time.
    """

    inputs_dim: int
    hidden_dim: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, mask=None):
        # inputs: (batch, seq, inputs_dim); mask: (batch, seq) with 1=valid
        _, seq_len, _ = inputs.shape
        if seq_len == 1:
            return jnp.squeeze(inputs, axis=1), jnp.ones(
                (inputs.shape[0], 1), dtype=inputs.dtype)

        query = self.param("query_vector", nn.initializers.normal(stddev=1.0),
                           (self.inputs_dim,), self.param_dtype)
        p = TorchLinear(self.hidden_dim, dtype=self.dtype, name="P")(inputs)
        q = TorchLinear(self.hidden_dim, dtype=self.dtype, name="Q")(
            query.astype(inputs.dtype))
        h = jnp.tanh(p + q)
        scores = TorchLinear(1, dtype=self.dtype, name="value")(h)[..., 0]  # (B, S)
        if mask is not None:
            scores = jnp.where(mask == 0, jnp.asarray(NEG_INF, scores.dtype), scores)
        alpha = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(inputs.dtype)
        out = jnp.einsum("bs,bsd->bd", alpha, inputs)
        return out, alpha
