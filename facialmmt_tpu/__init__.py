"""FacialMMT-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for facial-expression-aware
multimodal multi-task emotion recognition in conversations.

Re-designed from scratch with the capabilities of NUSTM/FacialMMT (ACL 2023):
  * frame-level facial-expression recognition (Swin-tiny) auxiliary task,
  * RoBERTa/BERT dialogue text encoding with per-utterance span extraction,
  * wav2vec2 audio / InceptionResnet vision utterance encoders,
  * MulT-style pairwise crossmodal transformer fusion,
  * multi-task training with frame-importance filtering.

Everything is fully batched, static-shape and jit/pjit-compiled; the reference's
per-utterance Python-loop orchestration (reference train.py:60-133, src/models.py:117-150)
is replaced by masked vectorized ops, and parallelism is expressed with
jax.sharding.Mesh + named shardings instead of single-GPU loops.
"""

__version__ = "0.1.0"

from facialmmt_tpu.config import FacialMMTConfig
