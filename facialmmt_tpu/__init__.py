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

from facialmmt_tpu.config import (CrossModalConfig, DataConfig, EncoderConfig,
                                  FacialMMTConfig, OptimConfig, ParallelConfig,
                                  RuntimeConfig, SwinConfig, TextEncoderConfig)


def __getattr__(name):
    """Lazy top-level API: heavyweight submodules import on first use."""
    api = {
        "FacialMMTPipeline": ("facialmmt_tpu.models.pipeline",
                              "FacialMMTPipeline"),
        "MultiModalTransformerForClassification": (
            "facialmmt_tpu.models.multimodal",
            "MultiModalTransformerForClassification"),
        "MeldUttTransformer": ("facialmmt_tpu.models.unimodal",
                               "MeldUttTransformer"),
        "SwinForAffwildClassification": ("facialmmt_tpu.models.swin_fer",
                                         "SwinForAffwildClassification"),
        "DialogueMultiModalTransformer": ("facialmmt_tpu.models.dialogue",
                                          "DialogueMultiModalTransformer"),
        "TextEncoder": ("facialmmt_tpu.models.text_encoder", "TextEncoder"),
        "Trainer": ("facialmmt_tpu.train.trainer", "Trainer"),
        "DialogueTrainer": ("facialmmt_tpu.train.trainer", "DialogueTrainer"),
        "EmotionServer": ("facialmmt_tpu.serving", "EmotionServer"),
        "eval_meld": ("facialmmt_tpu.train.metrics", "eval_meld"),
        "build_mesh": ("facialmmt_tpu.parallel.mesh", "build_mesh"),
        "CheckpointManager": ("facialmmt_tpu.checkpoint.orbax_io",
                              "CheckpointManager"),
    }
    if name in api:
        import importlib

        module, attr = api[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'facialmmt_tpu' has no attribute {name!r}")
