"""Whole-backbone A/B of SwinConfig.merge_impl ('raster' vs 'window') at the
bench's packed-face scale.  Chained-jit harness (one jit, fori chain, single
readback).

Run: setsid nohup python experiments/merge_e2e.py > /tmp/merge_e2e.log 2>&1 &
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

ITERS = 8


def timed(run, n=ITERS):
    run()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main(faces=1024):
    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.config import SwinConfig
    from facialmmt_tpu.ops.swin import SwinTransformer

    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(
        k, (faces, 224, 224, 3), jnp.bfloat16))(key)

    outs = {}
    for impl in ("raster", "window"):
        cfg = SwinConfig(merge_impl=impl)
        model = SwinTransformer(cfg, dtype=jnp.bfloat16)
        if impl == "raster":
            variables = jax.jit(model.init)(key, x)
        out0 = jax.jit(lambda v, x: model.apply(
            v, x, use_running_average=True))(variables, x)
        outs[impl] = out0

        @jax.jit
        def chain(v, x):
            def body(i, carry):
                out = model.apply(v, x + carry * 1e-9,
                                  use_running_average=True)
                return jnp.sum(out).astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
        t = timed(lambda: float(chain(variables, x)))
        print(f"backbone {impl:7s}: {t:7.2f} ms / {faces} faces", flush=True)
    d = float(jnp.max(jnp.abs(outs["raster"].astype(jnp.float32)
                              - outs["window"].astype(jnp.float32))))
    print(f"max|delta| {d}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
