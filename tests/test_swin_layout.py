"""Window-resident Swin layout equivalence: the static permutations of
shifted_window_perms must reproduce roll -> partition -> reverse -> roll-back
(reference Swin_Transformer.py:233-257) exactly."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from facialmmt_tpu.ops.swin import (shifted_window_perms, window_partition,
                                    window_reverse)


@pytest.mark.parametrize("h,w,ws,shift", [(14, 14, 7, 3), (8, 8, 4, 2),
                                          (28, 28, 7, 3), (8, 12, 4, 2)])
def test_shifted_perm_matches_roll_partition(h, w, ws, shift, rng):
    b, c = 3, 5
    x_grid = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))

    # reference chain: roll -> partition (window layout of the shifted grid)
    rolled = jnp.roll(x_grid, (-shift, -shift), axis=(1, 2))
    want = window_partition(rolled, ws).reshape(b, h * w, c)

    # window-resident chain: partition once, then one gather
    x_win = window_partition(x_grid, ws).reshape(b, h * w, c)
    perm, inv = shifted_window_perms(h, w, ws, shift)
    got = jnp.take(x_win, jnp.asarray(perm), axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # inverse: gather back, reverse, roll-back must return the original grid
    back = jnp.take(got, jnp.asarray(inv), axis=1)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x_win))
    grid_back = jnp.roll(
        window_reverse(want.reshape(-1, ws * ws, c), ws, h, w),
        (shift, shift), axis=(1, 2))
    np.testing.assert_array_equal(
        np.asarray(window_partition(grid_back, ws).reshape(b, h * w, c)),
        np.asarray(back))


@pytest.mark.parametrize("sh,ws_s,ws_n", [(56, 7, 7), (28, 7, 7), (14, 7, 7),
                                          (8, 4, 4)])
def test_merge_gather_index_matches_raster_merge(sh, ws_s, ws_n, rng):
    """merge_gather_index must reproduce window_reverse -> 2x2 strided
    slices/concat -> window_partition EXACTLY (row permutation only)."""
    from facialmmt_tpu.ops.swin import merge_gather_index

    b, c = 2, 3
    sw = sh
    x_win = jnp.asarray(rng.normal(size=(b, sh * sw, c)).astype(np.float32))

    # reference chain
    grid = window_reverse(x_win.reshape(-1, ws_s * ws_s, c), ws_s, sh, sw)
    x0 = grid[:, 0::2, 0::2]
    x1 = grid[:, 1::2, 0::2]
    x2 = grid[:, 0::2, 1::2]
    x3 = grid[:, 1::2, 1::2]
    merged = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    want = window_partition(merged, ws_n).reshape(b, (sh // 2) ** 2, 4 * c)

    idx = merge_gather_index(sh, sw, ws_s, ws_n)
    got = jnp.take(x_win, jnp.asarray(idx.reshape(-1)),
                   axis=1).reshape(b, (sh // 2) ** 2, 4 * c)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_swin_merge_impl_window_equals_raster(rng):
    """Full backbone: merge_impl='window' output == 'raster' output exactly
    (same params; the per-row math is identical, only the transition layout
    differs)."""
    import dataclasses

    import jax

    from facialmmt_tpu.config import SwinConfig
    from facialmmt_tpu.ops.swin import SwinTransformer

    cfg = SwinConfig(img_size=32, patch_size=4, embed_dim=8,
                     depths=(1, 1, 1), num_heads=(1, 2, 2), window_size=4,
                     drop_path_rate=0.0, out_feature_dim=16,
                     attention_impl="xla", mlp_impl="xla",
                     merge_impl="raster")
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    model_r = SwinTransformer(cfg)
    variables = model_r.init(jax.random.PRNGKey(0), x)
    out_r = model_r.apply(variables, x, use_running_average=True)

    model_w = SwinTransformer(dataclasses.replace(cfg, merge_impl="window"))
    out_w = model_w.apply(variables, x, use_running_average=True)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_w))
