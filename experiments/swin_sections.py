"""Split Swin backbone time into per-stage blocks vs everything between them.

Times the raw SwinTransformer at eval-bench scale (1024 faces) for depth
variants: zeroing one stage's depth removes exactly that stage's blocks while
keeping patch embed, window partition/reverse, all patch-merges and the head
— so full - variant = that stage's block cost, and the all-zeros variant is
the pure plumbing cost (embed + layout + merges + head).

Run: python experiments/swin_sections.py [n_faces]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

ITERS = 8


def main(n_faces=1024):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.config import SwinConfig
    from facialmmt_tpu.ops.swin import SwinTransformer

    faces = jax.jit(lambda k: jax.random.normal(
        k, (n_faces, 224, 224, 3), jnp.float32))(jax.random.PRNGKey(0))
    print(f"backend: {jax.default_backend()}, {n_faces} faces", flush=True)

    def timed_variant(name, depths):
        cfg = dataclasses.replace(SwinConfig(), depths=depths)
        model = SwinTransformer(cfg, dtype=jnp.bfloat16)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), faces[:2])

        @jax.jit
        def chain(variables, faces, carry):
            def body(i, carry):
                out = model.apply(variables, faces + carry * 1e-9)
                return jnp.sum(out.astype(jnp.float32)) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, carry)

        def run():
            float(chain(variables, faces, jnp.float32(0)))

        run()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{name:22s} depths={depths}: {best * 1e3:7.2f} ms", flush=True)
        return best * 1e3

    full = timed_variant("full", (2, 2, 6, 2))
    none = timed_variant("plumbing only", (0, 0, 0, 0))
    s0 = timed_variant("minus stage0", (0, 2, 6, 2))
    s1 = timed_variant("minus stage1", (2, 0, 6, 2))
    s2 = timed_variant("minus stage2", (2, 2, 0, 2))
    s3 = timed_variant("minus stage3", (2, 2, 6, 0))
    print(f"\nblocks: stage0 {full - s0:6.2f}  stage1 {full - s1:6.2f}  "
          f"stage2 {full - s2:6.2f}  stage3 {full - s3:6.2f}  "
          f"plumbing {none:6.2f}  sum "
          f"{(full - s0) + (full - s1) + (full - s2) + (full - s3) + none:6.2f}"
          f" vs full {full:6.2f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
