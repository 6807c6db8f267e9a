"""Golden tests for the post-LN utterance encoder against a NumPy re-derivation of
the reference math (modules/Transformer.py:65-227)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from facialmmt_tpu.config import EncoderConfig
from facialmmt_tpu.ops.encoder import UttTransEncoder, additive_mask

CFG = EncoderConfig(hidden_size=32, num_attention_heads=4, intermediate_size=64)


def np_layernorm(x, w, b, eps=1e-12):
    u = x.mean(-1, keepdims=True)
    s = ((x - u) ** 2).mean(-1, keepdims=True)
    return w * ((x - u) / np.sqrt(s + eps)) + b


def np_gelu(x):
    from scipy.special import erf  # noqa: F401
    return x * 0.5 * (1.0 + erf_np(x / math.sqrt(2.0)))


def erf_np(x):
    import math as m
    v = np.vectorize(m.erf)
    return v(x).astype(x.dtype)


def np_encoder(x, mask, params, num_layers, cfg: EncoderConfig):
    """Independent NumPy forward of the whole stack."""
    h, nh = cfg.hidden_size, cfg.num_attention_heads
    hd = h // nh
    b, s, _ = x.shape
    pos = np.asarray(params["position_embeddings"])[:s]
    x = x + pos[None]
    bias = ((1.0 - mask.astype(np.float32)) * -10000.0)[:, None, None, :]
    for i in range(num_layers):
        p = params[f"layer_{i}"]

        def lin(name, z, pp=None):
            pp = pp if pp is not None else p
            return z @ np.asarray(pp[name]["kernel"]) + np.asarray(pp[name]["bias"])

        q = lin("query", x, p["selfatt"]).reshape(b, s, nh, hd)
        k = lin("key", x, p["selfatt"]).reshape(b, s, nh, hd)
        v = lin("value", x, p["selfatt"]).reshape(b, s, nh, hd)
        scores = np.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd) + bias
        e = np.exp(scores - scores.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        ctx = np.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, h)
        attn_out = lin("attn_dense", ctx)
        x = np_layernorm(attn_out + x, np.asarray(p["attn_norm"]["weight"]),
                         np.asarray(p["attn_norm"]["bias"]), cfg.layer_norm_eps)
        inter = np_gelu(lin("intermediate", x))
        out = lin("output", inter)
        x = np_layernorm(out + x, np.asarray(p["out_norm"]["weight"]),
                         np.asarray(p["out_norm"]["bias"]), cfg.layer_norm_eps)
    return x


def test_encoder_matches_numpy(rng):
    b, s = 2, 9
    x = rng.normal(size=(b, s, CFG.hidden_size)).astype(np.float32)
    mask = (rng.random((b, s)) > 0.3).astype(np.int32)
    mask[:, 0] = 1
    enc = UttTransEncoder(CFG, num_layers=2, max_len=16)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    got = np.asarray(enc.apply(params, jnp.asarray(x), jnp.asarray(mask)))
    want = np_encoder(x, mask, params["params"], 2, CFG)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_additive_mask_value():
    m = jnp.asarray([[1, 1, 0]])
    bias = np.asarray(additive_mask(m))
    np.testing.assert_allclose(bias[0, 0, 0], [0.0, 0.0, -10000.0])


def test_encoder_dropout_active_in_train_mode(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, CFG.hidden_size)).astype(np.float32))
    enc = UttTransEncoder(CFG, num_layers=1, max_len=8)
    params = enc.init(jax.random.PRNGKey(0), x)
    a = enc.apply(params, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    b = enc.apply(params, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
