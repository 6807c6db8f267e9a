"""shift_permute Pallas kernel vs the jnp.take row gather, per Swin stage.

Times one perm+inverse round trip (the per-shifted-block cost) with the
standard chained-jit harness.  Run: python experiments/shift_perm_bench.py [faces]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

ITERS = 16

STAGES = [  # (grid, C)
    (56, 96),
    (28, 192),
    (14, 384),
]


def timed(jitted, x):
    import jax.numpy as jnp
    out = jitted(x)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jitted(x)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def main(faces=256):
    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.ops.pallas.shift_permute import shift_permute
    from facialmmt_tpu.ops.swin import shifted_window_perms

    print(f"backend: {jax.default_backend()}, {faces} faces, "
          f"perm+inverse round trip", flush=True)
    for grid, c in STAGES:
        ws, s = 7, 3
        x = jax.jit(lambda k: jax.random.normal(
            k, (faces, grid * grid, c), jnp.bfloat16))(jax.random.PRNGKey(0))
        perm, inv = shifted_window_perms(grid, grid, ws, s)
        perm, inv = jnp.asarray(perm), jnp.asarray(inv)

        def take_rt(x):
            return jnp.take(jnp.take(x, perm, axis=1), inv, axis=1)

        def kern_rt(x):
            y = shift_permute(x, grid, grid, ws, s, False)
            return shift_permute(y, grid, grid, ws, s, True)

        def chain(body):
            @jax.jit
            def f(x):
                return jax.lax.fori_loop(
                    0, ITERS, lambda _, x: (body(x) * 1.0).astype(x.dtype), x)
            return f

        # correctness on-chip first
        a = jax.jit(take_rt)(x)
        b = jax.jit(kern_rt)(x)
        exact = bool(jnp.all(a == b))
        t_take = timed(chain(take_rt), x)
        t_kern = timed(chain(kern_rt), x)
        print(f"stage grid={grid:2d} C={c:3d}: take {t_take:6.2f} ms   "
              f"kernel {t_kern:6.2f} ms   ({t_take / t_kern:4.2f}x)  "
              f"exact={exact}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
