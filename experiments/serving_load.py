"""Serving under concurrent load (VERDICT r3 weak #4 / next #5).

Drives serving.benchmark_load (AsyncBatchServer + Poisson arrivals) against
the bucket configs from BASELINE.md's latency table, at several offered
rates, on the real chip with the full-size model (random weights — timing
only).  The point: the padded (8,64)/(32,256) buckets must EARN their
single-request latency premium by sustaining throughput when the packer
fills the slots.

Run: setsid nohup python experiments/serving_load.py > /tmp/serving_load.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from facialmmt_tpu.utils.tunnel import (enable_compilation_cache,
                                            probe_backend)

    probe_backend(emit_json=False)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _make_batch
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline
    from facialmmt_tpu.serving import EmotionServer, benchmark_load

    print("backend:", jax.default_backend(), flush=True)
    cfg = FacialMMTConfig()
    model = FacialMMTPipeline(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        _make_batch(cfg, b=2))
    print("params ready", flush=True)

    # `python serving_load.py router` skips the per-bucket rate sweeps and
    # runs only the router section (the bucket executables still warm once);
    # `routerab` additionally A/Bs the boundary policies back-to-back at each
    # rate — paired within one process so tunnel-speed drift (which can be
    # 2-3x day-to-day) cancels out of the comparison
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    router_only = mode in ("router", "routerab", "midbucket")
    servers = []
    for max_batch, cap, rates in ((1, 12, (5, 10)),
                                  (8, 64, (20, 40, 80)),
                                  (32, 256, (40, 80, 160))):
        t0 = time.perf_counter()
        server = EmotionServer(cfg, variables, max_batch=max_batch,
                               face_capacity=cap)
        servers.append(server)
        print(f"\nbucket ({max_batch}, {cap}): warm in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        for rate in rates if not router_only else ():
            stats = benchmark_load(server, rate_utt_per_s=float(rate),
                                   duration_s=12.0, batch_deadline_ms=10.0)
            print(f"  rate {rate:4d}/s -> {stats['achieved_utt_per_s']:7.1f} "
                  f"utt/s | p50 {stats['p50_ms']:7.1f} ms | "
                  f"p99 {stats['p99_ms']:7.1f} ms | fill "
                  f"{stats['mean_batch_fill']:.2f} | n={stats['n_requests']}",
                  flush=True)

    if mode == "midbucket":
        # VERDICT r5 #5: the transition region (offered 15-30 utt/s) pays a
        # head-of-line premium in the 3-bucket router (r4 table: p50
        # 1.1-2.3 s at rate 20 vs 473 ms on a dedicated (8,64)).  Paired A/B:
        # does a (16,128) middle bucket — one medium step ≈ half the big
        # step's latency, twice the medium capacity — close it?  Alternating
        # order per rate so tunnel warm-drift cancels pairwise.
        t0 = time.perf_counter()
        mid16 = EmotionServer(cfg, variables, max_batch=16, face_capacity=128)
        print(f"\nbucket (16, 128): warm in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        stats = benchmark_load(servers[1], rate_utt_per_s=20.0,
                               duration_s=12.0, batch_deadline_ms=10.0)
        print(f"  dedicated (8,64) @20/s (reference) -> "
              f"{stats['achieved_utt_per_s']:7.1f} utt/s | "
              f"p50 {stats['p50_ms']:7.1f} ms | p99 {stats['p99_ms']:7.1f} ms",
              flush=True)
        four = servers + [mid16]
        for i, rate in enumerate((15, 20, 30)):
            variants = (("3bkt", servers), ("4bkt", four))
            for name, ss in (variants if i % 2 == 0 else variants[::-1]):
                stats = benchmark_load(ss, rate_utt_per_s=float(rate),
                                       duration_s=12.0,
                                       batch_deadline_ms=10.0)
                print(f"  rate {rate:4d}/s {name} -> "
                      f"{stats['achieved_utt_per_s']:7.1f} utt/s | "
                      f"p50 {stats['p50_ms']:7.1f} ms | "
                      f"p99 {stats['p99_ms']:7.1f} ms | "
                      f"buckets {stats.get('bucket_counts')} | "
                      f"n={stats['n_requests']}", flush=True)
        return

    # bucket ROUTER: one front-end over all three executables — light load
    # should see the small bucket's latency, saturation the big bucket's
    # throughput (AsyncBatchServer router docstring)
    print("\nbucket router (1,12)+(8,64)+(32,256):", flush=True)
    policies = ("backlog", "greedy") if mode == "routerab" else ("backlog",)
    for i, rate in enumerate((5, 20, 40, 80, 160)):
        # alternate A/B order per rate so warm-drift cancels pairwise
        for policy in (policies if i % 2 == 0 else policies[::-1]):
            stats = benchmark_load(servers, rate_utt_per_s=float(rate),
                                   duration_s=12.0, batch_deadline_ms=10.0,
                                   boundary_policy=policy)
            print(f"  rate {rate:4d}/s {policy:8s} -> "
                  f"{stats['achieved_utt_per_s']:7.1f} "
                  f"utt/s | p50 {stats['p50_ms']:7.1f} ms | "
                  f"p99 {stats['p99_ms']:7.1f} ms | fill "
                  f"{stats['mean_batch_fill']:.2f} | "
                  f"buckets {stats.get('bucket_counts')} | "
                  f"n={stats['n_requests']}", flush=True)


if __name__ == "__main__":
    main()
