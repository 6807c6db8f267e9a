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
