"""Single-request serving latency per bucket (BASELINE.md latency table).

Refreshes EmotionServer.benchmark_latency across the three bucket configs on
the real chip — the round-4b fp16 feature wire cuts each probe's serial
host->device transfer, so the table moves independently of the compute
kernels (serving.py transfer_dtype docstring).

Run: setsid nohup python experiments/serving_latency.py > /tmp/serving_lat.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline
    from facialmmt_tpu.serving import EmotionServer

    print("backend:", jax.default_backend(), flush=True)
    cfg = FacialMMTConfig()
    model = FacialMMTPipeline(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        _make_batch(cfg, b=2))
    print("params ready", flush=True)

    for max_batch, cap in ((1, 12), (8, 64), (32, 256)):
        t0 = time.perf_counter()
        server = EmotionServer(cfg, variables, max_batch=max_batch,
                               face_capacity=cap)
        warm = time.perf_counter() - t0
        stats = server.benchmark_latency(iters=30)
        print(f"bucket ({max_batch:2d}, {cap:3d}): warm {warm:6.1f}s | "
              f"p50 {stats['p50_ms']:7.1f} ms | p99 {stats['p99_ms']:7.1f} ms"
              f" | mean {stats['mean_ms']:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
