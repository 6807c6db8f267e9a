"""Gumbel-softmax (reference src/models.py:31-32 uses F.gumbel_softmax(logits, tau)).

The reference *samples* gumbel noise even at eval time (under torch.no_grad), making
its reported W-F1 seed-dependent (SURVEY.md §7 hard part 3).  Both behaviors are
supported here:
  * sampled mode (parity): y = softmax((logits + g)/tau), g = -log(-log(U));
  * deterministic mode: y = softmax(logits/tau)  (runtime.deterministic_gumbel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(key, logits, tau: float = 1.0, *, deterministic: bool = False):
    """Soft gumbel-softmax sample, matching torch F.gumbel_softmax(hard=False)."""
    if deterministic:
        return jax.nn.softmax(logits / tau, axis=-1)
    # torch: gumbels = -log(Exp(1)); Exp(1) = -log(U)
    u = jax.random.uniform(key, logits.shape, dtype=jnp.float32,
                           minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
    g = -jnp.log(-jnp.log(u))
    y = (logits.astype(jnp.float32) + g) / tau
    return jax.nn.softmax(y, axis=-1).astype(logits.dtype)
