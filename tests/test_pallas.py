"""Pallas kernel numerics (interpret mode on CPU; compiled path exercised on
TPU by bench.py / the real pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np

from facialmmt_tpu.ops.pallas.attention import (_reference_attention,
                                                fused_attention)
from facialmmt_tpu.ops.pallas.window_attention import (_reference,
                                                       fused_window_attention)


def test_fused_attention_matches_reference(rng):
    b, h, s, d = 2, 4, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    bias = jnp.asarray(
        np.where(rng.random((b, s)) > 0.2, 0, -1e9).astype(np.float32))
    got = fused_attention(q, k, v, bias, True)
    want = _reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_fused_attention_grads_match(rng):
    b, h, s, d = 1, 2, 16, 8
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    bias = jnp.zeros((b, s))
    g1 = jax.grad(lambda q: fused_attention(q, k, v, bias, True).sum())(q)
    g2 = jax.grad(lambda q: _reference_attention(q, k, v, bias).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-5)


def test_fused_window_attention_matches_reference(rng):
    w, h, n, hd, nw = 8, 3, 49, 32, 4
    q = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nw, h, n, n)).astype(np.float32))
    got = fused_window_attention(q, k, v, bias, 4, True)
    want = _reference(q, k, v, bias.astype(jnp.bfloat16).astype(jnp.float32))
    # kernel stores bias in bf16; compare against the bf16-bias reference
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3,
                               atol=2e-3)


def test_fused_window_attention_bias_indexing(rng):
    """Window wi must use bias row wi % nW."""
    w, h, n, hd, nw = 4, 1, 49, 32, 2
    q = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    # huge bias on row 1 masks everything except the first key
    bias = np.zeros((nw, h, n, n), np.float32)
    bias[1, :, :, 1:] = -1e9
    got = np.asarray(fused_window_attention(q, k, v, jnp.asarray(bias), 2,
                                            True))
    # windows 1 and 3 use bias row 1 => output rows equal v[:, :, 0]
    np.testing.assert_allclose(got[1, 0, 5], np.asarray(v)[1, 0, 0], rtol=1e-4)
    np.testing.assert_allclose(got[3, 0, 7], np.asarray(v)[3, 0, 0], rtol=1e-4)


def test_auto_group_fits_budget():
    from facialmmt_tpu.ops.pallas.window_attention import (_auto_group,
                                                           _padded_bytes)

    for (w, h, nw) in [(16384, 3, 64), (4096, 6, 16), (1024, 12, 4),
                       (256, 24, 1)]:
        g = _auto_group(w, h, 49, 32, nw)
        assert w % g == 0 and g >= 1
        n_p = 64
        bias = nw * h * n_p * 128 * 2 * 2
        assert 4 * 2 * _padded_bytes(g, h, 49, 32, 2) + bias <= 10 * 1024 * 1024


def test_fused_window_attention_v2_matches_reference(rng):
    from facialmmt_tpu.ops.pallas.window_attention import \
        fused_window_attention_v2

    w, h, n, hd, nw = 8, 3, 49, 32, 4
    q = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nw, h, n, n)).astype(np.float32))
    got = jax.jit(lambda q, k, v, b: fused_window_attention_v2(
        q, k, v, b, 4, True))(q, k, v, bias)
    want = _reference(q, k, v, bias.astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3,
                               atol=2e-3)

def test_paired_window_attention_matches_reference(rng):
    from facialmmt_tpu.ops.pallas.window_attention import \
        paired_window_attention

    w, h, n, hd, nw = 8, 3, 49, 32, 4
    q = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nw, h, n, n)).astype(np.float32))
    got = jax.jit(lambda q, k, v, b: paired_window_attention(
        q, k, v, b, 2, True))(q, k, v, bias)
    want = _reference(q, k, v, bias.astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3,
                               atol=2e-3)


def test_paired_window_attention_bias_indexing(rng):
    """Pair (2c, 2c+1) must use bias rows (2c % nW, 2c+1 % nW) — the
    block-diagonal grouping may not straddle or reorder bias rows."""
    from facialmmt_tpu.ops.pallas.window_attention import \
        paired_window_attention

    w, h, n, hd, nw = 8, 1, 49, 32, 4
    q = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    bias = np.zeros((nw, h, n, n), np.float32)
    bias[3, :, :, 1:] = -1e9   # windows 3 and 7 attend only to key 0
    got = np.asarray(paired_window_attention(q, k, v, jnp.asarray(bias), 2,
                                             True))
    np.testing.assert_allclose(got[3, 0, 5], np.asarray(v)[3, 0, 0], rtol=1e-4)
    np.testing.assert_allclose(got[7, 0, 9], np.asarray(v)[7, 0, 0], rtol=1e-4)


def test_paired_window_attention_grads_match(rng):
    from facialmmt_tpu.ops.pallas.window_attention import \
        paired_window_attention

    w, h, n, hd, nw = 4, 2, 49, 32, 2
    q = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(w, h, n, hd)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nw, h, n, n)).astype(np.float32))
    g1 = jax.grad(lambda q: paired_window_attention(
        q, k, v, bias, 2, True).sum())(q)
    g2 = jax.grad(lambda q: _reference(q, k, v, bias).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-3,
                               atol=2e-3)


def test_swin_block_pair_impl_matches_xla(rng):
    """WindowAttention fused='pair' == lane-slice XLA inside a real shifted
    SwinBlock (CPU interpret not available through the module path, so force
    the kernel via interpret-capable shapes on the pallas fn level is covered
    above; here we check the module-level wiring picks legal pair shapes)."""
    from facialmmt_tpu.ops.swin import WindowAttention

    w, n, c, heads = 8, 49, 96, 3
    x = jnp.asarray(rng.normal(size=(w, n, c)).astype(np.float32))
    mask = jnp.asarray(rng.normal(size=(4, n, n)).astype(np.float32))
    attn_x = WindowAttention(dim=c, window_size=7, num_heads=heads,
                             fused="off")
    attn_p = WindowAttention(dim=c, window_size=7, num_heads=heads,
                             fused="pair")
    params = attn_x.init(jax.random.PRNGKey(0), x, mask)
    ref = attn_x.apply(params, x, mask)
    # interpret-mode run of the same wiring: monkeypatch the kernel entry to
    # force interpret=True (no TPU on CI)
    import facialmmt_tpu.ops.pallas.window_attention as wa
    orig = wa.paired_window_attention
    try:
        wa.paired_window_attention = (
            lambda q, k, v, b, pairs=8, interpret=False:
            orig(q, k, v, b, pairs, True))
        got = attn_p.apply(params, x, mask)
    finally:
        wa.paired_window_attention = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3,
                               atol=5e-3)


def test_fused_ln_mlp_residual_matches_reference(rng):
    from facialmmt_tpu.ops.pallas.block_mlp import (_reference,
                                                    fused_ln_mlp_residual)

    t, c = 256, 96
    x = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng.normal(size=(4 * c,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)).astype(np.float32)) * 0.1
    b2 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    got = fused_ln_mlp_residual(x, gamma, beta, w1, b1, w2, b2, None,
                                1e-5, True)
    want = _reference(x, gamma, beta, w1, b1, w2, b2, None, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2,
                               atol=2e-2)

    # per-token stochastic-depth keep operand (train-mode stop-grad path)
    keep = jnp.asarray((rng.random(t) > 0.3) / 0.7, jnp.float32)
    got_k = fused_ln_mlp_residual(x, gamma, beta, w1, b1, w2, b2, keep,
                                  1e-5, True)
    want_k = _reference(x, gamma, beta, w1, b1, w2, b2, keep, 1e-5)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k),
                               rtol=2e-2, atol=2e-2)
    dropped = np.asarray(keep) == 0.0
    np.testing.assert_allclose(np.asarray(got_k)[dropped],
                               np.asarray(x)[dropped], rtol=1e-6, atol=1e-6)


def test_fused_ln_mlp_residual_pads_awkward_token_count(rng):
    """Token counts that don't divide the tile zero-pad and slice back."""
    from facialmmt_tpu.ops.pallas.block_mlp import (_reference,
                                                    fused_ln_mlp_residual)

    t, c = 49, 8   # deliberately tiny + tile-unaligned
    x = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)).astype(np.float32)) * 0.1
    b1 = jnp.zeros((4 * c,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)).astype(np.float32)) * 0.1
    b2 = jnp.zeros((c,), jnp.float32)
    got = fused_ln_mlp_residual(x, gamma, beta, w1, b1, w2, b2, None,
                                1e-5, True)
    want = _reference(x, gamma, beta, w1, b1, w2, b2, None, 1e-5)
    assert got.shape == (t, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2,
                               atol=2e-2)


def test_fused_whole_block_matches_reference(rng):
    """The whole-block kernel (attention half + LN2/MLP/residual, interpret
    mode on CPU) matches the exact-math XLA formulation.  Measured NEUTRAL vs
    the split on TPU (fused_block.py ledger) so it is default-off; the parity
    test keeps the recorded variant honest."""
    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.ops.pallas.fused_block import (_whole_reference,
                                                      fused_whole_block)

    c, h, nw, n, w = 96, 3, 4, 49, 8
    hid = 4 * c
    x = jnp.asarray(rng.normal(size=(w, n, c)), jnp.float32)
    args = (
        jnp.asarray(rng.normal(size=(c,)) * 0.02 + 1, jnp.float32),
        jnp.zeros((c,), jnp.float32),
        jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.02, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32),
        jnp.asarray(rng.normal(size=(c, c)) * 0.02, jnp.float32),
        jnp.zeros((c,), jnp.float32),
        jnp.asarray(rng.normal(size=(nw, h, n, n)) * 0.5, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.02 + 1, jnp.float32),
        jnp.zeros((c,), jnp.float32),
        jnp.asarray(rng.normal(size=(c, hid)) * 0.02, jnp.float32),
        jnp.zeros((hid,), jnp.float32),
        jnp.asarray(rng.normal(size=(hid, c)) * 0.02, jnp.float32),
        jnp.zeros((c,), jnp.float32))
    want = _whole_reference(x, *args, 1e-5)
    got = fused_whole_block(x, *args, interpret=True)
    rel = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert rel < 2e-3, rel


def test_fused_attention_block_matches_xla_swinblock(monkeypatch, rng):
    """The mega-fused block kernel (LN1+qkv+pair-attn+proj+residual, forced
    via interpret mode on CPU) matches the full XLA SwinBlock attention half,
    for both regular and shifted windows."""
    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.ops import swin
    from facialmmt_tpu.ops.pallas import fused_block

    monkeypatch.setattr(swin, "_fused_block_backend_ok", lambda: True)
    orig = fused_block.fused_attention_block
    monkeypatch.setattr(
        fused_block, "fused_attention_block",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    h = w = 14  # 2x2 windows of 7x7 -> shifted mask has nW=4 (even)
    for shift_block in (0, 1):
        block_kw = dict(dim=96, input_resolution=(h, w), num_heads=3,
                        window_size=7, shift_size=3 * shift_block,
                        drop_path=0.0)
        x = jnp.asarray(rng.normal(size=(2, h * w, 96)), jnp.float32)
        base = swin.SwinBlock(fused_attention="off", fused_mlp="off",
                              **block_kw)
        params = base.init(jax.random.PRNGKey(0), x, True)["params"]
        want = base.apply({"params": params}, x, True)
        fused = swin.SwinBlock(fused_attention="auto", fused_mlp="off",
                               **block_kw)
        got = fused.apply({"params": params}, x, True)
        rel = float(jnp.max(jnp.abs(got - want))) / float(
            jnp.max(jnp.abs(want)))
        assert rel < 2e-2, f"shift={shift_block}: rel={rel}"
        assert not np.allclose(np.asarray(got), np.asarray(x)), "no-op?"


def test_fused_attention_block_keep_operand(rng):
    """The per-window stochastic-depth `keep` operand: kernel (interpret)
    matches the exact-math reference, and keep=0 windows pass x through."""
    import jax.numpy as jnp

    from facialmmt_tpu.ops.pallas.fused_block import (_reference,
                                                      fused_attention_block)

    w, n, c, h, nw = 8, 49, 96, 3, 4
    x = jnp.asarray(rng.normal(size=(w, n, c)), jnp.float32)
    args = (
        jnp.asarray(rng.normal(size=(c,)) * 0.02 + 1, jnp.float32),
        jnp.zeros((c,), jnp.float32),
        jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.02, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32),
        jnp.asarray(rng.normal(size=(c, c)) * 0.02, jnp.float32),
        jnp.zeros((c,), jnp.float32),
        jnp.asarray(rng.normal(size=(nw, h, n, n)) * 0.5, jnp.float32))
    keep = jnp.asarray([0.0, 1.25, 1.25, 0.0, 1.25, 0.0, 1.25, 1.25],
                       jnp.float32)
    got = fused_attention_block(x, *args, keep, interpret=True)
    want = _reference(x, *args, keep, 1e-5)
    rel = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert rel < 2e-2, rel
    dropped = np.asarray(keep) == 0.0
    np.testing.assert_allclose(np.asarray(got)[dropped],
                               np.asarray(x)[dropped], rtol=1e-6, atol=1e-6)


def test_swin_block_fused_train_mode_matches_eval_when_droppath_zero(
        monkeypatch, rng):
    """With drop_path=0 and dropout 0.0 (the reference Swin config), the
    fused kernels now ENGAGE on train-mode forwards (the stop-grad FER
    extraction path) and must equal the eval forward exactly."""
    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.ops import swin
    from facialmmt_tpu.ops.pallas import block_mlp, fused_block

    monkeypatch.setattr(swin, "_fused_block_backend_ok", lambda: True)
    orig_attn = fused_block.fused_attention_block
    monkeypatch.setattr(
        fused_block, "fused_attention_block",
        lambda *a, **k: orig_attn(*a, **{**k, "interpret": True}))
    del block_mlp  # MLP kernel off here; covered by the wiring test below

    h = w = 14
    block = swin.SwinBlock(dim=96, input_resolution=(h, w), num_heads=3,
                           window_size=7, shift_size=0, drop_path=0.0,
                           fused_attention="auto", fused_mlp="off")
    x = jnp.asarray(rng.normal(size=(2, h * w, 96)), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, True)["params"]
    out_eval = block.apply({"params": params}, x, True)
    out_train = block.apply({"params": params}, x, False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_train))


def test_swin_block_fused_train_mode_droppath_wiring(monkeypatch, rng):
    """Per-image stochastic depth through the fused kernels: with a pinned
    keep vector [0, 1/keep_prob], the dropped image's output is exactly its
    input (both residual branches zeroed) and the kept image's is not.
    Kernel-level keep math is covered by the kernel tests; this pins the
    SwinBlock expansion (per-window / per-token repeat) and rng plumbing."""
    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.ops import swin
    from facialmmt_tpu.ops.pallas import block_mlp, fused_block

    monkeypatch.setattr(swin, "_fused_block_backend_ok", lambda: True)
    orig_attn = fused_block.fused_attention_block
    monkeypatch.setattr(
        fused_block, "fused_attention_block",
        lambda *a, **k: orig_attn(*a, **{**k, "interpret": True}))
    orig_mlp = block_mlp.fused_ln_mlp_residual
    monkeypatch.setattr(
        block_mlp, "fused_ln_mlp_residual",
        lambda *a, **k: orig_mlp(*a, **{**k, "interpret": True}))
    fixed = jnp.asarray([0.0, 1.0 / 0.7], jnp.float32)
    monkeypatch.setattr(swin.SwinBlock, "_drop_path_keep",
                        lambda self, b, det: None if det else fixed)

    h = w = 14
    for shift in (0, 3):
        block = swin.SwinBlock(dim=96, input_resolution=(h, w), num_heads=3,
                               window_size=7, shift_size=shift,
                               drop_path=0.3, fused_attention="auto",
                               fused_mlp="on")
        x = jnp.asarray(rng.normal(size=(2, h * w, 96)), jnp.float32)
        params = block.init(jax.random.PRNGKey(0), x, True)["params"]
        out = block.apply({"params": params}, x, False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0]),
                                   rtol=1e-6, atol=1e-6)
        assert not np.allclose(np.asarray(out[1]), np.asarray(x[1]))


# ------------------------------------------------- Pallas backward kernels --

def _attn_block_args(rng, w=8, n=49, c=96, h=3, nw=4):
    x = jnp.asarray(rng.normal(size=(w, n, c)), jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.05, jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.05, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nw, h, n, n)) * 0.5, jnp.float32)
    return x, gamma, beta, wqkv, bqkv, wproj, bproj, bias


def test_fused_attention_block_pallas_bwd_grads_match(rng):
    """The flash-style Pallas backward (interpret mode) matches XLA autodiff
    of the exact reference math for EVERY cotangent — x, both LN params, the
    packed qkv weights, proj weights, and (window-summed, per the group-0
    convention) the bias."""
    from facialmmt_tpu.ops.pallas import fused_block

    x, *args = _attn_block_args(rng)
    args = tuple(args)
    dy = jnp.asarray(rng.normal(size=x.shape), jnp.bfloat16)
    for keep in (None,
                 jnp.asarray(rng.choice([0.0, 1.43], size=(x.shape[0],)),
                             jnp.float32)):
        ref = lambda *a: fused_block._reference(*a, keep, 1e-5)
        fused = lambda *a: fused_block.fused_attention_block(
            *a, keep, 16, 1e-5, True)
        _, vjp_a = jax.vjp(ref, x, *args)
        _, vjp_b = jax.vjp(fused, x, *args)
        ga, gb = vjp_a(dy), vjp_b(dy)
        for nm, a, b in zip("x gamma beta wqkv bqkv wproj bproj bias".split(),
                            ga, gb):
            if nm == "bias":
                a, b = a.sum(0), b.sum(0)   # group-0 convention: sum-exact
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            denom = np.abs(a).max() or 1.0
            assert np.abs(a - b).max() / denom < 2e-2, nm


def test_fused_attention_block_spill_bwd_grads_match(rng):
    """The SPILL backward variant (stage-3 widths: weight grads formed
    outside the kernel from emitted xn/dqkv/attn) matches XLA autodiff for
    every cotangent, with and without the drop-path keep operand."""
    from facialmmt_tpu.ops.pallas import fused_block

    x, *args = _attn_block_args(rng)
    args = tuple(args)
    dy = jnp.asarray(rng.normal(size=x.shape), jnp.bfloat16)
    for keep in (None,
                 jnp.asarray(rng.choice([0.0, 1.43], size=(x.shape[0],)),
                             jnp.float32)):
        ref = lambda *a: fused_block._reference(*a, keep, 1e-5)
        _, vjp_a = jax.vjp(ref, x, *args)
        ga = vjp_a(dy)
        gamma, beta, wqkv, bqkv, wproj, bproj, bias = args
        gb = fused_block._bwd_impl_spill(
            x, gamma, beta, wqkv, bqkv, wproj, bias, keep, dy,
            pairs=2, eps=1e-5, interpret=True)
        # spill returns (dx, dg, db, dwqkv, dbqkv, dwp, dbp, dbias, dkeep);
        # the reference vjp has no keep slot and bproj sits before bias
        gb = gb[:6] + (gb[6], gb[7])
        for nm, a, b in zip("x gamma beta wqkv bqkv wproj bproj bias".split(),
                            ga, gb):
            if nm == "bias":
                a, b = a.sum(0), b.sum(0)   # group-0 convention: sum-exact
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            denom = np.abs(a).max() or 1.0
            assert np.abs(a - b).max() / denom < 2e-2, nm


def test_fused_attention_block_bias_grad_reaches_table(rng):
    """Table-level gradient through the real consumer shape
    (full_bias = bias_hnn[None] + constant_mask[:, None], the SwinBlock
    wiring): the Pallas backward's group-0 bias cotangent must give the SAME
    table gradient as XLA autodiff, because the broadcast vjp sums over the
    window axis."""
    from facialmmt_tpu.ops.pallas import fused_block

    w, n, c, h, nw = 8, 49, 96, 3, 4
    x, gamma, beta, wqkv, bqkv, wproj, bproj, _ = _attn_block_args(
        rng, w, n, c, h, nw)
    bias_hnn = jnp.asarray(rng.normal(size=(h, n, n)) * 0.5, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((nw, n, n)) > 0.7, -100.0, 0.0), jnp.float32)

    def through(bias_hnn, f):
        full = bias_hnn[None] + mask[:, None]
        return jnp.sum(f(x, gamma, beta, wqkv, bqkv, wproj, bproj, full)
                       .astype(jnp.float32) ** 2)

    g_ref = jax.grad(through)(
        bias_hnn, lambda *a: fused_block._reference(*a, None, 1e-5))
    g_pal = jax.grad(through)(
        bias_hnn, lambda *a: fused_block.fused_attention_block(
            *a, None, 16, 1e-5, True))
    denom = np.abs(np.asarray(g_ref)).max() or 1.0
    assert np.abs(np.asarray(g_ref) - np.asarray(g_pal)).max() / denom < 2e-2


def test_fused_ln_mlp_residual_pallas_bwd_grads_match(rng):
    """MLP-half Pallas backward vs XLA autodiff, including the zero-padded
    awkward-token-count path (inert pad rows)."""
    from facialmmt_tpu.ops.pallas import block_mlp

    for t, c in ((256, 96), (300, 96)):
        c4 = 4 * c
        x = jnp.asarray(rng.normal(size=(t, c)), jnp.bfloat16)
        gamma = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(c, c4)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(c4,)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(c4, c)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32)
        dy = jnp.asarray(rng.normal(size=(t, c)), jnp.bfloat16)
        keep = jnp.asarray(rng.choice([0.0, 1.43], size=(t,)), jnp.float32)
        ref = lambda *a: block_mlp._reference(*a, keep, 1e-5)
        fused = lambda *a: block_mlp.fused_ln_mlp_residual(
            *a, keep, 1e-5, True)
        _, vjp_a = jax.vjp(ref, x, gamma, beta, w1, b1, w2, b2)
        _, vjp_b = jax.vjp(fused, x, gamma, beta, w1, b1, w2, b2)
        for nm, a, b in zip("x gamma beta w1 b1 w2 b2".split(),
                            vjp_a(dy), vjp_b(dy)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            denom = np.abs(a).max() or 1.0
            assert np.abs(a - b).max() / denom < 2e-2, (nm, t)


def test_pallas_bwd_fit_gates():
    """Stage-fit gates: the resident backward kernels engage at swin-tiny
    stages 0-2; at stage 3 (fp32 weight-grad accumulators exceed VMEM) the
    attention half engages the SPILL variant and the MLP half falls back to
    XLA (whose T x {768, 3072} backward matmuls are already MXU-efficient)."""
    from facialmmt_tpu.ops.pallas.block_mlp import _bwd_tile_for
    from facialmmt_tpu.ops.pallas.fused_block import (_pick_pairs_bwd,
                                                      _pick_pairs_bwd_spill)

    stages = [(16384, 3, 96, 32), (4096, 6, 192, 8), (1024, 12, 384, 2),
              (256, 24, 768, 1)]
    for i, (w, h, c, groups) in enumerate(stages):
        pairs = _pick_pairs_bwd(w, h, 49, c, groups, 16)
        tile = _bwd_tile_for(c, 4 * c, w * 49)
        if i < 3:
            assert pairs > 0, i
            assert tile >= 128, i
        else:
            assert pairs == 0
            assert _pick_pairs_bwd_spill(w, h, 49, c, groups, 8) > 0
            assert tile == 0


def test_swin_block_auto_grad_grads_match_xla(monkeypatch, rng):
    """'auto_grad' wiring: a grad-bearing SwinBlock forward engages the fused
    kernels (where the Pallas backwards fit) and produces the same parameter
    and input gradients as the pure-XLA block, for both regular and shifted
    windows."""
    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.ops import swin
    from facialmmt_tpu.ops.pallas import block_mlp, fused_block

    monkeypatch.setattr(swin, "_fused_block_backend_ok", lambda: True)
    orig_attn = fused_block.fused_attention_block
    monkeypatch.setattr(
        fused_block, "fused_attention_block",
        lambda *a, **k: orig_attn(*a, **{**k, "interpret": True}))
    orig_mlp = block_mlp.fused_ln_mlp_residual
    monkeypatch.setattr(
        block_mlp, "fused_ln_mlp_residual",
        lambda *a, **k: orig_mlp(*a, **{**k, "interpret": True}))

    h = w = 14
    x = jnp.asarray(rng.normal(size=(2, h * w, 96)), jnp.bfloat16)
    for shift in (0, 3):
        mk = lambda fa, fm: swin.SwinBlock(
            dim=96, input_resolution=(h, w), num_heads=3, window_size=7,
            shift_size=shift, drop_path=0.0, fused_attention=fa, fused_mlp=fm,
            dtype=jnp.bfloat16)
        ref_block = mk("off", "off")
        ag_block = mk("auto_grad", "auto_grad")
        params = ref_block.init(jax.random.PRNGKey(0), x, True)["params"]

        def loss(block, params, x):
            out = block.apply({"params": params}, x, False,
                              rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(out.astype(jnp.float32) ** 2)

        (la, ga), gxa = (jax.value_and_grad(
            lambda p, x: loss(ref_block, p, x), argnums=(0,))(params, x),
            jax.grad(lambda x: loss(ref_block, params, x))(x))
        (lb, gb), gxb = (jax.value_and_grad(
            lambda p, x: loss(ag_block, p, x), argnums=(0,))(params, x),
            jax.grad(lambda x: loss(ag_block, params, x))(x))
        assert abs(la - lb) / abs(la) < 2e-2
        # l2-relative: the two paths are DIFFERENT bf16 formulations of the
        # same math, so long-cancellation sums (bias grads over hundreds of
        # windows) carry random-walk rounding noise; exact same-math parity
        # is pinned by the kernel-level tests above
        def l2rel(a, b):
            a = np.asarray(a, np.float32).ravel()
            b = np.asarray(b, np.float32).ravel()
            return np.linalg.norm(a - b) / (np.linalg.norm(a) or 1.0)

        flat_a = jax.tree_util.tree_leaves_with_path(ga)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(gb))
        for path, a in flat_a:
            assert l2rel(a, flat_b[path]) < 5e-2, (shift, path)
        assert l2rel(gxa, gxb) < 5e-2


def test_shift_permute_matches_take(rng):
    """shift_permute (interpret) is BITWISE the jnp.take row gather with
    shifted_window_perms, both directions + round trip + vjp.  The kernel is
    a measured-negative record (0.58-0.97x the take on v5e — see its module
    docstring) and default-off, but its exactness is pinned so it stays a
    valid building block."""
    from facialmmt_tpu.ops.pallas.shift_permute import shift_permute
    from facialmmt_tpu.ops.swin import shifted_window_perms

    for (h, w, ws, s, c) in [(56, 56, 7, 3, 96), (14, 14, 7, 3, 384),
                             (21, 14, 7, 2, 8)]:
        x = jnp.asarray(rng.normal(size=(2, h * w, c)), jnp.float32)
        perm, inv = shifted_window_perms(h, w, ws, s)
        ref_f = jnp.take(x, jnp.asarray(perm), axis=1)
        ref_i = jnp.take(x, jnp.asarray(inv), axis=1)
        got_f = shift_permute(x, h, w, ws, s, False, True)
        got_i = shift_permute(x, h, w, ws, s, True, True)
        assert bool(jnp.all(got_f == ref_f)), (h, w, c)
        assert bool(jnp.all(got_i == ref_i)), (h, w, c)
        rt = shift_permute(got_f, h, w, ws, s, True, True)
        assert bool(jnp.all(rt == x))
        g = jax.grad(lambda x: jnp.sum(
            shift_permute(x, h, w, ws, s, False, True) * ref_i))(x)
        g_ref = jax.grad(lambda x: jnp.sum(
            jnp.take(x, jnp.asarray(perm), axis=1) * ref_i))(x)
        assert bool(jnp.all(g == g_ref))


def test_fused_cross_attention_matches_reference(rng):
    """Sq != Sk (crossmodal MulT shapes): kernel == unfused einsum chain."""
    b, h, sq, sk, d = 2, 3, 10, 24, 16
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32)) * 0.2
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    bias = jnp.asarray(
        np.where(rng.random((b, sk)) > 0.2, 0, -1e9).astype(np.float32))
    got = fused_attention(q, k, v, bias, True)
    want = _reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_fused_cross_attention_grads_match(rng):
    b, h, sq, sk, d = 1, 2, 6, 12, 8
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
    bias = jnp.zeros((b, sk))
    for arg in range(3):
        g1 = jax.grad(lambda *a: fused_attention(*a, bias, True).sum(),
                      argnums=arg)(q, k, v)
        g2 = jax.grad(lambda *a: _reference_attention(*a, bias).sum(),
                      argnums=arg)(q, k, v)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                                   atol=1e-5)


def _force_interpret_attention(monkeypatch):
    from facialmmt_tpu.ops.pallas import attention as attn_mod

    orig = attn_mod.fused_attention
    monkeypatch.setattr(attn_mod, "fused_attention",
                        lambda q, k, v, bias, interpret=False:
                        orig(q, k, v, bias, True))


def test_self_attention_tower_fused_matches_xla(monkeypatch, rng):
    """ops/encoder.py SelfAttention 'on' (interpret) == 'off' XLA path."""
    from facialmmt_tpu.config import EncoderConfig
    from facialmmt_tpu.ops.encoder import UttTransEncoder, additive_mask

    _force_interpret_attention(monkeypatch)
    x = jnp.asarray(rng.normal(size=(3, 12, 32)).astype(np.float32))
    mask = jnp.asarray((rng.random((3, 12)) > 0.3).astype(np.float32))
    outs = {}
    for mode in ("off", "on"):
        cfg = EncoderConfig(hidden_size=32, num_attention_heads=4,
                            intermediate_size=64, fused_attention=mode)
        enc = UttTransEncoder(cfg, num_layers=2, max_len=12)
        params = enc.init(jax.random.PRNGKey(0), x, mask)
        outs[mode] = np.asarray(enc.apply(params, x, mask))
    np.testing.assert_allclose(outs["on"], outs["off"], rtol=2e-5, atol=2e-5)


def test_crossmodal_fused_matches_xla(monkeypatch, rng):
    """PackedMultiheadAttention 'on' (interpret, Sq != Sk) == XLA path."""
    from facialmmt_tpu.ops.crossmodal import CrossModalTransformerEncoder

    _force_interpret_attention(monkeypatch)
    xq = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
    xk = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    outs = {}
    for mode in ("off", "on"):
        enc = CrossModalTransformerEncoder(embed_dim=32, num_heads=4, layers=2,
                                           fused_attention=mode,
                                           max_positions=16)
        params = enc.init(jax.random.PRNGKey(0), xq, xk, xk)
        outs[mode] = np.asarray(enc.apply(params, xq, xk, xk))
    np.testing.assert_allclose(outs["on"], outs["off"], rtol=2e-5, atol=2e-5)


def test_crossmodal_banded_mask_stays_on_xla_path(monkeypatch, rng):
    """attn_mask=True (banded future mask) must NOT enter the kernel: force
    the kernel to raise and check 'on' still runs the XLA path."""
    from facialmmt_tpu.ops.pallas import attention as attn_mod
    from facialmmt_tpu.ops.crossmodal import CrossModalTransformerEncoder

    def boom(*a, **k):
        raise AssertionError("kernel must not be used with a banded mask")

    monkeypatch.setattr(attn_mod, "fused_attention", boom)
    x = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
    enc = CrossModalTransformerEncoder(embed_dim=32, num_heads=4, layers=1,
                                       attn_mask=True, fused_attention="on",
                                       max_positions=16)
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == x.shape


def test_fused_merge_matches_reference(rng):
    """Patch-merge LN+reduction kernel (interpret) == fp32-LN/bf16-matmul
    reference, including the token-padding path (T not a tile multiple)."""
    from facialmmt_tpu.ops.pallas import merge_kernel

    for (b, l, c4, c2) in [(2, 49, 384, 192), (1, 196, 768, 384)]:
        x = jnp.asarray(rng.normal(size=(b, l, c4)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(c4,)).astype(np.float32))
        be = jnp.asarray(rng.normal(size=(c4,)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(c4, c2)).astype(np.float32)) * 0.05
        got = merge_kernel.fused_merge(x, g, be, w, 1e-5, True)
        want = merge_kernel._reference(x, g, be, w)
        # both sides run bf16 matmuls; tile-vs-flat accumulation order gives
        # bf16-scale drift at K=768 (max ~2e-3 observed)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=4e-3, atol=4e-3)
        gr1 = jax.grad(lambda x: merge_kernel.fused_merge(
            x, g, be, w, 1e-5, True).sum())(x)
        gr2 = jax.grad(lambda x: merge_kernel._reference(x, g, be, w).sum())(x)
        np.testing.assert_allclose(np.asarray(gr1), np.asarray(gr2),
                                   rtol=2e-4, atol=2e-4)
