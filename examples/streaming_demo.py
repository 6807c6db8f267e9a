"""Streaming video -> emotion demo (BASELINE.json config 5).

Simulates a live multi-party conversation feed: each tick delivers one
utterance's face crops + precomputed audio/vision features + dialogue tokens,
and the fixed-latency EmotionServer returns the emotion distribution.  Every
request executes the SAME pre-compiled static-shape program, so latency is
constant regardless of content (the TPU-native online-serving pattern).

Run:  python examples/streaming_demo.py [--ticks 20] [--tiny]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ticks", type=int, default=10)
    p.add_argument("--tiny", action="store_true",
                   help="tiny config (CPU-friendly smoke run)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline
    from facialmmt_tpu.serving import EmotionServer
    from facialmmt_tpu.train.metrics import MELD_EMOTIONS

    cfg = FacialMMTConfig.tiny() if args.tiny else FacialMMTConfig()
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    model = FacialMMTPipeline(cfg, dtype=dtype)

    rng = np.random.default_rng(0)
    d = cfg.data
    # random-weights init (a real deployment loads converted checkpoints via
    # facialmmt_tpu.tools convert-checkpoint)
    from __graft_entry__ import _make_batch

    init_batch = _make_batch(cfg, b=2)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        init_batch)

    t0 = time.perf_counter()
    server = EmotionServer(cfg, variables, max_batch=4, face_capacity=32,
                           dtype=dtype)
    print(f"server warm in {time.perf_counter() - t0:.1f}s "
          f"(compile happens once, before the stream starts)")

    latencies = []
    for tick in range(args.ticks):
        n_faces = int(rng.integers(1, 6))
        request = {
            "faces": rng.integers(0, 255, (n_faces, 160, 160, 3),
                                  dtype=np.uint8),
            "audio": rng.normal(size=(int(rng.integers(5, 20)),
                                      d.audio_feat_dim)),
            "vision": rng.normal(size=(n_faces, d.vision_feat_dim)),
            "input_ids": rng.integers(2, cfg.text.vocab_size, size=(40,)),
            "sep_mask": np.eye(40)[12],
        }
        t0 = time.perf_counter()
        probs = server.predict([request])[0]
        ms = (time.perf_counter() - t0) * 1000
        latencies.append(ms)
        top = int(np.argmax(probs))
        print(f"tick {tick:2d} | {n_faces} faces | {ms:7.1f} ms | "
              f"{MELD_EMOTIONS[top]:8s} {probs[top]:.2f}")

    arr = np.asarray(latencies[1:])  # drop first (host-side warmup jitter)
    print(f"\nlatency p50 {np.percentile(arr, 50):.1f} ms | "
          f"p99 {np.percentile(arr, 99):.1f} ms | mean {arr.mean():.1f} ms")


if __name__ == "__main__":
    main()
