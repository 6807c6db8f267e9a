"""Time the full Swin backbone (256 faces) per attention_impl on the chip,
and check xla-vs-pair numerical agreement."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import dataclasses
from facialmmt_tpu.config import FacialMMTConfig
from facialmmt_tpu.models.swin_fer import SwinForAffwildClassification

print("backend:", jax.default_backend(), flush=True)
ITERS = 10
imgs = jax.jit(lambda k: jax.random.normal(k, (256, 224, 224, 3), jnp.float32))(
    jax.random.PRNGKey(0))

outs = {}
for impl in ("xla", "auto"):
    cfg = FacialMMTConfig()
    cfg = dataclasses.replace(
        cfg, swin=dataclasses.replace(cfg.swin, attention_impl=impl))
    swin = SwinForAffwildClassification(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(swin.init, static_argnames=("is_trg_task",))(
        {"params": jax.random.PRNGKey(0)}, imgs, is_trg_task=False)

    @jax.jit
    def chain(variables, imgs, eps):
        # fori_loop + explicit args keep the serialized HLO small (the dev
        # tunnel rejects large compile payloads; closed-over arrays embed as
        # HLO constants); the carry still serializes iterations
        def body(i, carry):
            x, acc = carry
            logits = swin.apply(variables, x, is_trg_task=False)
            acc = acc + jnp.sum(logits).astype(jnp.float32)
            return (x + acc * 1e-12, acc)

        _, acc = jax.lax.fori_loop(0, ITERS, body, (imgs + eps,
                                                    jnp.float32(0)))
        return acc

    float(chain(variables, imgs, jnp.float32(0)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(variables, imgs, jnp.float32(1e-9)))
        best = min(best, time.perf_counter() - t0)
    print(f"{impl:5s}: {best*1000/ITERS:7.1f} ms / 256 faces", flush=True)

    one = jax.jit(lambda v, x: swin.apply(v, x, is_trg_task=False))
    outs[impl] = one(variables, imgs)

d = float(jnp.max(jnp.abs(outs["xla"].astype(jnp.float32)
                          - outs["auto"].astype(jnp.float32))))
r = float(jnp.max(jnp.abs(outs["xla"].astype(jnp.float32))))
print(f"max abs diff xla vs auto(pair): {d:.3e}  (max |out| {r:.3e})")
