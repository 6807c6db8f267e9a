"""Gumbel-softmax tests (reference src/models.py:31-32)."""

import jax
import jax.numpy as jnp
import numpy as np

from facialmmt_tpu.ops.gumbel import gumbel_softmax


def test_deterministic_mode_is_tempered_softmax(rng):
    logits = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    out = gumbel_softmax(None, logits, tau=2.0, deterministic=True)
    want = jax.nn.softmax(logits / 2.0, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)


def test_sampled_mode_statistics(rng):
    """Mean of many gumbel-softmax samples approaches the softmax probabilities
    (property of the gumbel trick), and rows sum to 1."""
    logits = jnp.asarray(np.array([[2.0, 0.0, -1.0]], np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    samples = jax.vmap(lambda k: gumbel_softmax(k, logits, tau=1.0))(keys)
    s = np.asarray(samples)[:, 0]
    np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-5)
    # argmax frequency equals softmax probability in distribution (gumbel-max)
    freq = np.bincount(s.argmax(-1), minlength=3) / len(s)
    want = np.asarray(jax.nn.softmax(logits, -1))[0]
    np.testing.assert_allclose(freq, want, atol=0.03)


def test_sampled_mode_seed_dependent():
    logits = jnp.zeros((2, 7))
    a = gumbel_softmax(jax.random.PRNGKey(1), logits)
    b = gumbel_softmax(jax.random.PRNGKey(2), logits)
    assert not np.allclose(np.asarray(a), np.asarray(b))
