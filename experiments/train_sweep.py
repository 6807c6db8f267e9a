"""Sweep the joint-training and aux-step configurations on the real chip.

Joint training: accum x batch combinations (accum=1 is the single fused step
with remat; accum>1 the microbatch lax.scan).  Aux: batch sizes.

Run: python experiments/train_sweep.py
"""

import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from __graft_entry__ import _make_batch
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline

    cfg = FacialMMTConfig()
    model = FacialMMTPipeline(cfg, dtype=jnp.bfloat16)
    batch = _make_batch(cfg, b=8, utts_per_dia=8, faces_per_utt=8)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)
    print(f"backend: {jax.default_backend()}", flush=True)

    for accum, b in ((1, 32), (2, 32), (1, 64)):
        try:
            st = bench._joint_train_throughput(jax, jnp, model, cfg,
                                               variables, b, accum=accum)
            print(f"joint accum={accum} batch={b}: {st['best']:.1f} utt/s "
                  f"(median {st['median']:.1f})", flush=True)
        except Exception as e:
            print(f"joint accum={accum} batch={b}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    for b in (300,):
        try:
            st = bench._aux_throughput(jax, jnp, model, cfg, variables, b)
            print(f"aux batch={b}: {st['best']:.1f} img/s "
                  f"(median {st['median']:.1f})", flush=True)
        except Exception as e:
            print(f"aux batch={b}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
