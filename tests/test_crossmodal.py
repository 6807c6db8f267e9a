"""Golden tests for the crossmodal (MulT-style) stack against NumPy re-derivations
of the reference math (modules/CrossmodalTransformer.py, multihead_attention.py,
position_embedding.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from facialmmt_tpu.ops.crossmodal import (CrossModalTransformerEncoder,
                                          banded_future_mask,
                                          channel0_positional_embedding,
                                          sinusoidal_table)


def np_sinusoidal(num_rows, dim):
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freq = np.exp(np.arange(half) * -emb)
    ang = np.arange(num_rows)[:, None] * freq[None, :]
    t = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        t = np.concatenate([t, np.zeros((num_rows, 1))], axis=1)
    t[0] = 0
    return t.astype(np.float32)


def test_sinusoidal_table_matches_fairseq_formula():
    got = sinusoidal_table(17, 32)
    np.testing.assert_allclose(got, np_sinusoidal(17, 32), rtol=1e-6, atol=1e-6)


def test_channel0_pe_quirk(rng):
    """Position i gets row i+1 iff x[i, 0] != 0, else the zero row
    (reference make_positions over features, position_embedding.py:8-27)."""
    x = rng.normal(size=(2, 6, 8)).astype(np.float32)
    x[0, 2, 0] = 0.0  # "padding" by the channel-0 convention
    x[1, 5, 0] = 0.0
    table = jnp.asarray(sinusoidal_table(7, 8))
    pe = np.asarray(channel0_positional_embedding(jnp.asarray(x), table))
    tab = np.asarray(table)
    for bi in range(2):
        for i in range(6):
            want = np.zeros(8) if x[bi, i, 0] == 0 else tab[i + 1]
            np.testing.assert_allclose(pe[bi, i], want, atol=1e-6)


def np_ln(x, w, b, eps=1e-5):
    u = x.mean(-1, keepdims=True)
    s = ((x - u) ** 2).mean(-1, keepdims=True)
    return w * ((x - u) / np.sqrt(s + eps)) + b


def np_gelu(x):
    import math as m
    v = np.vectorize(m.erf)
    return x * 0.5 * (1.0 + v(x / math.sqrt(2.0)).astype(x.dtype))


def np_crossmodal(xq, xk, xv, params, layers, e, nh):
    """Independent NumPy forward: embed-scale, channel-0 PE, pre-LN layers with
    packed qkv and shared first LN, final LN."""
    hd = e // nh
    table = np_sinusoidal(xq.shape[1] + 1, e)

    def embed(z):
        s = z.shape[1]
        tab = np_sinusoidal(max(xq.shape[1], xk.shape[1]) + 1, e)
        pe = np.zeros_like(z)
        for bi in range(z.shape[0]):
            for i in range(s):
                pe[bi, i] = 0 if z[bi, i, 0] == 0 else tab[i + 1]
        return math.sqrt(e) * z + pe

    x, k_in, v_in = embed(xq), embed(xk), embed(xv)
    for li in range(layers):
        p = params[f"layer_{li}"]
        w = np.asarray(p["self_attn"]["in_proj_kernel"])
        bias = np.asarray(p["self_attn"]["in_proj_bias"])
        ow = np.asarray(p["self_attn"]["out_proj"]["kernel"])
        ob = np.asarray(p["self_attn"]["out_proj"]["bias"])
        ln0w, ln0b = np.asarray(p["ln0"]["weight"]), np.asarray(p["ln0"]["bias"])
        ln1w, ln1b = np.asarray(p["ln1"]["weight"]), np.asarray(p["ln1"]["bias"])

        res = x
        q = np_ln(x, ln0w, ln0b)
        kk = np_ln(k_in, ln0w, ln0b)
        vv = np_ln(v_in, ln0w, ln0b)
        qp = (q @ w[:, :e] + bias[:e]) * hd ** -0.5
        kp = kk @ w[:, e:2 * e] + bias[e:2 * e]
        vp = vv @ w[:, 2 * e:] + bias[2 * e:]
        b_, tq = qp.shape[0], qp.shape[1]
        tk = kp.shape[1]
        qp = qp.reshape(b_, tq, nh, hd)
        kp = kp.reshape(b_, tk, nh, hd)
        vp = vp.reshape(b_, tk, nh, hd)
        sc = np.einsum("bqhd,bkhd->bhqk", qp, kp)
        ee = np.exp(sc - sc.max(-1, keepdims=True))
        pr = ee / ee.sum(-1, keepdims=True)
        ctx = np.einsum("bhqk,bkhd->bqhd", pr, vp).reshape(b_, tq, e)
        x = res + (ctx @ ow + ob)

        res = x
        h = np_ln(x, ln1w, ln1b)
        h = np_gelu(h @ np.asarray(p["fc1"]["kernel"]) + np.asarray(p["fc1"]["bias"]))
        h = h @ np.asarray(p["fc2"]["kernel"]) + np.asarray(p["fc2"]["bias"])
        x = res + h
    return np_ln(x, np.asarray(params["final_norm"]["weight"]),
                 np.asarray(params["final_norm"]["bias"]))


def test_crossmodal_matches_numpy(rng):
    e, nh, layers = 32, 4, 2
    xq = rng.normal(size=(2, 5, e)).astype(np.float32)
    xk = rng.normal(size=(2, 9, e)).astype(np.float32)
    enc = CrossModalTransformerEncoder(embed_dim=e, num_heads=nh, layers=layers,
                                       max_positions=16)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(xq), jnp.asarray(xk),
                      jnp.asarray(xk))
    got = np.asarray(enc.apply(params, jnp.asarray(xq), jnp.asarray(xk),
                               jnp.asarray(xk)))
    want = np_crossmodal(xq, xk, xk, params["params"], layers, e, nh)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_crossmodal_self_mode(rng):
    """Self-attention mode (x only) runs and differs from cross mode."""
    e = 32
    x = rng.normal(size=(2, 5, e)).astype(np.float32)
    enc = CrossModalTransformerEncoder(embed_dim=e, num_heads=4, layers=1,
                                       max_positions=16)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = enc.apply(params, jnp.asarray(x))
    assert out.shape == x.shape


def test_banded_future_mask_matches_reference_formula():
    """triu(-inf, offset=1+|tk-tq|) (reference CrossmodalTransformer.py:178-185)."""
    m = np.asarray(banded_future_mask(4, 7))
    want = np.zeros((4, 7), np.float32)
    for i in range(4):
        for j in range(7):
            if j - i >= 1 + 3:
                want[i, j] = -1e30
    np.testing.assert_allclose(m, want)


def test_shared_crossmodal_weights_both_directions(rng):
    """One encoder instance used T->A and A->T (reference src/models.py:171-177):
    both calls must use the same parameters (same apply, different arg order)."""
    e = 32
    t = rng.normal(size=(2, 5, e)).astype(np.float32)
    a = rng.normal(size=(2, 7, e)).astype(np.float32)
    enc = CrossModalTransformerEncoder(embed_dim=e, num_heads=4, layers=1,
                                       max_positions=16)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(t), jnp.asarray(a),
                      jnp.asarray(a))
    out_ta = enc.apply(params, jnp.asarray(t), jnp.asarray(a), jnp.asarray(a))
    out_at = enc.apply(params, jnp.asarray(a), jnp.asarray(t), jnp.asarray(t))
    assert out_ta.shape == (2, 5, e)
    assert out_at.shape == (2, 7, e)
