"""Unit tests for core layers against independent NumPy/torch re-derivations of the
reference math (SURVEY.md §4: golden-output unit tests per op)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from facialmmt_tpu.ops.layers import AdditiveAttention, LayerNormTF, TorchLinear


def test_layernorm_tf_matches_manual(rng):
    x = rng.normal(size=(4, 9, 32)).astype(np.float32)
    ln = LayerNormTF(eps=1e-12)
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # non-trivial weight/bias
    w = rng.normal(size=(32,)).astype(np.float32)
    b = rng.normal(size=(32,)).astype(np.float32)
    params = {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}
    got = np.asarray(ln.apply(params, jnp.asarray(x)))

    u = x.mean(-1, keepdims=True)
    s = ((x - u) ** 2).mean(-1, keepdims=True)
    want = w * ((x - u) / np.sqrt(s + 1e-12)) + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_layernorm_matches_torch_layernorm(rng):
    """eps=1e-5 instance must equal torch nn.LayerNorm (crossmodal stack norms)."""
    x = rng.normal(size=(3, 7, 16)).astype(np.float32)
    ln = LayerNormTF(eps=1e-5)
    w = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    params = {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}
    got = np.asarray(ln.apply(params, jnp.asarray(x)))

    tln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tln.weight.copy_(torch.from_numpy(w))
        tln.bias.copy_(torch.from_numpy(b))
        want = tln(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_torch_linear_init_stats():
    """kaiming_uniform(a=sqrt(5)) ==> U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    lin = TorchLinear(64)
    params = lin.init(jax.random.PRNGKey(0), jnp.zeros((1, 256)))
    k = np.asarray(params["params"]["kernel"])
    bound = 1.0 / np.sqrt(256)
    assert np.abs(k).max() <= bound + 1e-6
    assert np.abs(k).max() > bound * 0.95  # actually fills the range


def additive_attention_numpy(x, mask, P, Pb, Q, Qb, v, vb, query):
    """Literal re-derivation of reference modules/Transformer.py:23-45."""
    h = np.tanh(x @ P + Pb + (query @ Q + Qb))
    scores = (h @ v + vb)[..., 0]
    scores = np.where(mask == 0, -np.inf, scores)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    alpha = e / e.sum(-1, keepdims=True)
    return np.einsum("bs,bsd->bd", alpha, x), alpha


def test_additive_attention_matches_numpy(rng):
    b, s, d = 3, 11, 16
    x = rng.normal(size=(b, s, d)).astype(np.float32)
    mask = (rng.random((b, s)) > 0.3).astype(np.int32)
    mask[:, 0] = 1  # at least one valid
    att = AdditiveAttention(inputs_dim=d, hidden_dim=d)
    params = att.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(mask))
    got, alpha = att.apply(params, jnp.asarray(x), jnp.asarray(mask))

    p = params["params"]
    want, want_alpha = additive_attention_numpy(
        x, mask,
        np.asarray(p["P"]["kernel"]), np.asarray(p["P"]["bias"]),
        np.asarray(p["Q"]["kernel"]), np.asarray(p["Q"]["bias"]),
        np.asarray(p["value"]["kernel"]), np.asarray(p["value"]["bias"]),
        np.asarray(p["query_vector"]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), want_alpha, rtol=1e-4, atol=1e-6)


def test_additive_attention_seq1_early_return(rng):
    """seq_len==1 returns the squeezed input untouched (reference :32-33)."""
    x = rng.normal(size=(4, 1, 8)).astype(np.float32)
    att = AdditiveAttention(inputs_dim=8, hidden_dim=8)
    params = att.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, _ = att.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x[:, 0], rtol=1e-6)
