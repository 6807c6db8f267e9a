"""SwinBlock end-to-end vs its raw kernels: find the per-block overhead.

swin_sections.py showed stage-0's two blocks cost ~152.7 ms/1024 faces while
the raw fused kernels measure ~115 (fused_block_bench --whole x4) — this
times one SwinBlock.apply (regular and shifted) at the same shapes to see
where the rest lives.

Run: python experiments/block_overhead.py [faces]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

ITERS = 8


def main(faces=256):
    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.ops.swin import SwinBlock

    grid, c, h = 56, 96, 3
    b = faces
    l = grid * grid
    x = jax.jit(lambda k: jax.random.normal(k, (b, l, c), jnp.bfloat16))(
        jax.random.PRNGKey(0))
    print(f"backend: {jax.default_backend()}, {faces} faces, stage0 block",
          flush=True)

    for shift in (0, 3):
        block = SwinBlock(dim=c, input_resolution=(grid, grid), num_heads=h,
                          window_size=7, shift_size=shift, drop_path=0.0,
                          fused_attention="auto", fused_mlp="auto",
                          dtype=jnp.bfloat16)
        params = jax.jit(block.init, static_argnums=(2,))(jax.random.PRNGKey(0), x, True)["params"]

        @jax.jit
        def chain(params, x, carry):
            def body(i, carry):
                out = block.apply({"params": params}, x + carry * 1e-9, deterministic=True)
                return jnp.sum(out.astype(jnp.float32)) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, carry)

        def run():
            float(chain(params, x, jnp.float32(0)))

        run()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"shift={shift}: {best * 1e3:7.2f} ms/block", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
