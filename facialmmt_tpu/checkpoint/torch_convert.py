"""Torch checkpoint -> JAX pytree conversion.

The reference persists whole-module pickles (torch.save(model), reference
utils/util.py:121-159) and loads the pretrained Ms-Celeb-1M Swin via a
'backbone.'-prefix state_dict remap (reference train.py:316-331).  This module
maps those tensors into our flax parameter trees so released checkpoints can be
evaluated for W-F1 parity (SURVEY.md §7 hard part 1).

Every function operates on a flat {torch_name: np.ndarray} state dict — shape
conventions:
  * torch Linear weight (out, in)  -> flax kernel (in, out)  [transpose]
  * torch Conv2d weight (O, I, H, W) -> flax (H, W, I, O)
  * packed crossmodal in_proj_weight (3E, E) -> in_proj_kernel (E, 3E)
  * BatchNorm running_mean/var -> batch_stats {mean, var}
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from facialmmt_tpu.config import FacialMMTConfig, TextEncoderConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint (state_dict or whole-module pickle) as numpy.

    Whole-module pickles need the reference classes importable; we inject
    /root/reference and stub its missing deps (timm, pytorch_lightning) — the
    stubs only need to satisfy unpickling, never to run.
    """
    import sys
    import types

    import torch

    if "timm" not in sys.modules:  # minimal stub for unpickling reference Swin
        import importlib.machinery

        def _stub_module(name):
            m = types.ModuleType(name)
            # a real ModuleSpec so importlib.util.find_spec (used by
            # transformers' optional-dep probing) doesn't choke on the stub
            m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            return m

        timm = _stub_module("timm")
        models = _stub_module("timm.models")
        layers = _stub_module("timm.models.layers")

        def to_2tuple(x):
            return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x

        def trunc_normal_(tensor, mean=0., std=1., a=-2., b=2.):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std, b * std)
            return tensor

        # resolvable pickle identity: parity harnesses SYNTHESIZE reference
        # checkpoints (torch.save of models built against this stub), and
        # pickle-by-reference must find the class at its stated location
        DropPath.__module__ = "timm.models.layers"
        DropPath.__qualname__ = "DropPath"
        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        sd = obj.get("state_dict", obj)
    else:  # whole nn.Module pickle
        sd = obj.state_dict()
    return {k: np.asarray(v.detach().cpu().float().numpy())
            for k, v in sd.items() if hasattr(v, "detach")}


# ---------------------------------------------------------------- primitives --

def convert_linear(sd: Mapping[str, np.ndarray], prefix: str,
                   bias: bool = True) -> Dict[str, Any]:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def convert_norm(sd: Mapping[str, np.ndarray], prefix: str,
                 flax_style: str = "weight") -> Dict[str, Any]:
    """flax_style 'weight' for LayerNormTF, 'scale' for flax nn.LayerNorm/BatchNorm."""
    key = "weight" if flax_style == "weight" else "scale"
    return {key: sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_embedding(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {"embedding": sd[f"{prefix}.weight"]}


# ------------------------------------------------------------------- modules --

def convert_utt_encoder(sd, prefix: str, num_layers: int) -> Dict[str, Any]:
    """MELDTransEncoder (reference modules/Transformer.py:196-227) -> UttTransEncoder."""
    p = prefix + "." if prefix else ""
    out: Dict[str, Any] = {
        "position_embeddings": sd[f"{p}position_embeddings.weight"]}
    for i in range(num_layers):
        lp = f"{p}layer.{i}"
        out[f"layer_{i}"] = {
            "selfatt": {
                "query": convert_linear(sd, f"{lp}.transformer_self_attention.selfatt.query"),
                "key": convert_linear(sd, f"{lp}.transformer_self_attention.selfatt.key"),
                "value": convert_linear(sd, f"{lp}.transformer_self_attention.selfatt.value"),
            },
            "attn_dense": convert_linear(sd, f"{lp}.transformer_self_attention.dense_norm.dense"),
            "attn_norm": convert_norm(sd, f"{lp}.transformer_self_attention.dense_norm.LayerNorm"),
            "intermediate": convert_linear(sd, f"{lp}.intermediate.dense"),
            "output": convert_linear(sd, f"{lp}.output.dense"),
            "out_norm": convert_norm(sd, f"{lp}.output.LayerNorm"),
        }
    return out


def convert_additive_attention(sd, prefix: str) -> Dict[str, Any]:
    """AdditiveAttention (reference modules/Transformer.py:8-45)."""
    p = prefix + "." if prefix else ""
    return {
        "query_vector": sd[f"{p}query_vector"],
        "P": convert_linear(sd, f"{p}P"),
        "Q": convert_linear(sd, f"{p}Q"),
        "value": convert_linear(sd, f"{p}value"),
    }


def convert_crossmodal(sd, prefix: str, layers: int) -> Dict[str, Any]:
    """CrossModalTransformerEncoder (reference modules/CrossmodalTransformer.py:9-96)."""
    p = prefix + "." if prefix else ""
    out: Dict[str, Any] = {
        "final_norm": convert_norm(sd, f"{p}layer_norm")}
    for i in range(layers):
        lp = f"{p}layers.{i}"
        out[f"layer_{i}"] = {
            "self_attn": {
                "in_proj_kernel": np.ascontiguousarray(
                    sd[f"{lp}.self_attn.in_proj_weight"].T),
                "in_proj_bias": sd[f"{lp}.self_attn.in_proj_bias"],
                "out_proj": convert_linear(sd, f"{lp}.self_attn.out_proj"),
            },
            "fc1": convert_linear(sd, f"{lp}.fc1"),
            "fc2": convert_linear(sd, f"{lp}.fc2"),
            "ln0": convert_norm(sd, f"{lp}.layer_norms.0"),
            "ln1": convert_norm(sd, f"{lp}.layer_norms.1"),
        }
    return out


def convert_swin_backbone(sd, prefix: str, cfg: FacialMMTConfig):
    """SwinTransformer (reference modules/SwinTransformer/Swin_Transformer.py:434-541).

    Returns (params, batch_stats) for ops/swin.py::SwinTransformer.
    """
    sw = cfg.swin
    p = prefix + "." if prefix else ""
    params: Dict[str, Any] = {
        "patch_embed": {
            # torch conv weight (E, C, p, p) -> patch-matmul kernel (p, p, C, E)
            "proj_kernel": np.ascontiguousarray(
                sd[f"{p}patch_embed.proj.weight"].transpose(2, 3, 1, 0)),
            "proj_bias": sd[f"{p}patch_embed.proj.bias"],
        },
    }
    if sw.patch_norm:
        params["patch_embed"]["norm"] = convert_norm(
            sd, f"{p}patch_embed.norm", "scale")

    for s in range(len(sw.depths)):
        for d in range(sw.depths[s]):
            bp = f"{p}layers.{s}.blocks.{d}"
            params[f"stage_{s}_block_{d}"] = {
                "norm1": convert_norm(sd, f"{bp}.norm1", "scale"),
                "norm2": convert_norm(sd, f"{bp}.norm2", "scale"),
                "attn": {
                    "qkv": convert_linear(sd, f"{bp}.attn.qkv"),
                    "proj": convert_linear(sd, f"{bp}.attn.proj"),
                    "relative_position_bias_table":
                        sd[f"{bp}.attn.relative_position_bias_table"],
                },
                "mlp_fc1": convert_linear(sd, f"{bp}.mlp.fc1"),
                "mlp_fc2": convert_linear(sd, f"{bp}.mlp.fc2"),
            }
        if s < len(sw.depths) - 1:
            dp = f"{p}layers.{s}.downsample"
            params[f"stage_{s}_downsample"] = {
                "norm": convert_norm(sd, f"{dp}.norm", "scale"),
                "reduction": convert_linear(sd, f"{dp}.reduction", bias=False),
            }

    # head: output_layer.0 LN, .2 Linear, .3 BatchNorm1d (reference :491-494)
    params["head_norm"] = convert_norm(sd, f"{p}output_layer.0", "scale")
    params["head_linear"] = convert_linear(sd, f"{p}output_layer.2")
    params["head_bn"] = convert_norm(sd, f"{p}output_layer.3", "scale")
    batch_stats = {
        "head_bn": {
            "mean": sd[f"{p}output_layer.3.running_mean"],
            "var": sd[f"{p}output_layer.3.running_var"],
        }
    }
    return params, batch_stats


def convert_swin_fer(sd, cfg: FacialMMTConfig):
    """SwinForAffwildClassification (reference src/models.py:14-37).
    Returns {'params': ..., 'batch_stats': ...} for models/swin_fer.py."""
    swin_params, swin_stats = convert_swin_backbone(sd, "swin", cfg)
    params = {
        "swin": swin_params,
        "linear": convert_linear(sd, "linear"),
        "classifier": convert_linear(sd, "classifier"),
    }
    return {"params": params, "batch_stats": {"swin": swin_stats}}


def convert_pretrained_swin_backbone(sd, cfg: FacialMMTConfig):
    """Ms-Celeb-1M pretrained checkpoint: keys are 'backbone.*'; classifier keys
    skipped (reference train.py:316-331).  Returns the same structure as
    convert_swin_fer minus the untrained head linears."""
    stripped = {k[len("backbone."):]: v for k, v in sd.items()
                if k.startswith("backbone.")}
    swin_params, swin_stats = convert_swin_backbone(stripped, "", cfg)
    return {"params": {"swin": swin_params},
            "batch_stats": {"swin": swin_stats}}


def convert_hf_text_encoder(sd, prefix: str,
                            cfg: TextEncoderConfig) -> Dict[str, Any]:
    """HF torch RobertaModel/BertModel state dict -> models/text_encoder.py tree.
    The pooler is skipped (the reference uses only outputs[0], src/models.py:106)."""
    p = prefix + "." if prefix else ""
    out: Dict[str, Any] = {
        "word_embeddings": convert_embedding(sd, f"{p}embeddings.word_embeddings"),
        "position_embeddings": convert_embedding(
            sd, f"{p}embeddings.position_embeddings"),
        "token_type_embeddings": convert_embedding(
            sd, f"{p}embeddings.token_type_embeddings"),
        "embeddings_norm": convert_norm(sd, f"{p}embeddings.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layer.{i}"
        out[f"layer_{i}"] = {
            "query": convert_linear(sd, f"{lp}.attention.self.query"),
            "key": convert_linear(sd, f"{lp}.attention.self.key"),
            "value": convert_linear(sd, f"{lp}.attention.self.value"),
            "attn_out": convert_linear(sd, f"{lp}.attention.output.dense"),
            "attn_norm": convert_norm(sd, f"{lp}.attention.output.LayerNorm"),
            "intermediate": convert_linear(sd, f"{lp}.intermediate.dense"),
            "output": convert_linear(sd, f"{lp}.output.dense"),
            "out_norm": convert_norm(sd, f"{lp}.output.LayerNorm"),
        }
    return out


def load_pretrained_hf_text_tower(model_dir: str,
                                  text_cfg: TextEncoderConfig
                                  ) -> Dict[str, Any]:
    """Local HF pretrained dir -> TextEncoder param tree, for FROM-SCRATCH
    training.  The reference always builds its text tower from pretrained PLM
    weights (`RobertaModel.from_pretrained` / `BertModel.from_pretrained`,
    reference src/models.py:72-77; chinese-roberta at
    (Appendix)CCAC2023/src/models.py:51) — random init cannot reach the W-F1
    target, so every training path grafts this tree into its init params
    (train/trainer.py).

    Validates the HF config against `text_cfg` before converting so a wrong
    `--plm_name` / dir pairing fails with the dimension diff, not a cryptic
    shape error mid-graft.
    """
    from transformers import AutoModel

    model = AutoModel.from_pretrained(model_dir)
    hf = model.config
    checks = [
        ("hidden_size", text_cfg.hidden_size, hf.hidden_size),
        ("num_layers", text_cfg.num_layers, hf.num_hidden_layers),
        ("num_heads", text_cfg.num_heads, hf.num_attention_heads),
        ("intermediate_size", text_cfg.intermediate_size,
         hf.intermediate_size),
        ("vocab_size", text_cfg.vocab_size, hf.vocab_size),
        ("max_position_embeddings", text_cfg.max_position_embeddings,
         hf.max_position_embeddings),
    ]
    bad = [f"{name}: ours {ours} vs HF {theirs}"
           for name, ours, theirs in checks if ours != theirs]
    if bad:
        raise ValueError(
            f"pretrained text model at {model_dir} does not match the "
            f"resolved text-tower config ({'; '.join(bad)}) — check "
            f"--plm_name / --pretrainedtextmodel_path")
    sd = {k: np.asarray(v.detach().cpu().float().numpy())
          for k, v in model.state_dict().items()}
    return convert_hf_text_encoder(sd, "", text_cfg)


def convert_unimodal(sd, cfg: FacialMMTConfig):
    """meld_utt_transformer (reference src/models.py:192-223)."""
    params = {
        "modality_linear": convert_linear(sd, "modality_linear"),
        "utt_transformer": convert_utt_encoder(
            sd, "utt_transformer", cfg.vision_utt_transformer_num),
        "attention": convert_additive_attention(sd, "attention"),
        "classifier": convert_linear(sd, "classifier"),
    }
    return {"params": params}


def convert_multimodal(sd, cfg: FacialMMTConfig,
                       text_cfg: "TextEncoderConfig" = None):
    """MultiModalTransformerForClassification (reference src/models.py:41-188).
    text_cfg overrides the tower config (tests use tiny towers)."""
    if text_cfg is None:
        # sniff the tower from the checkpoint itself — the reference's
        # attribute is named after the class it loaded (src/models.py:49-52:
        # self.roberta vs self.bert), so the state-dict prefix is
        # authoritative; fall back to cfg.plm_name when ambiguous
        has_bert = any(k.startswith("bert.") for k in sd)
        has_roberta = any(k.startswith("roberta.") for k in sd)
        if has_bert != has_roberta:
            want_roberta = has_roberta
        else:
            want_roberta = cfg.plm_name == "roberta-large"
        text_cfg = (TextEncoderConfig.roberta_large() if want_roberta
                    else TextEncoderConfig.bert_large())
    hf_prefix = "roberta" if text_cfg.model_type == "roberta" else "bert"
    params: Dict[str, Any] = {
        "text_encoder": convert_hf_text_encoder(sd, hf_prefix, text_cfg),
        "text_linear": convert_linear(sd, "text_linear"),
        "audio_linear": convert_linear(sd, "audio_linear"),
        "audio_utt_transformer": convert_utt_encoder(
            sd, "audio_utt_transformer", cfg.audio_utt_transformer_num),
        "vision_linear": convert_linear(sd, "vision_linear"),
        "vision_utt_transformer": convert_utt_encoder(
            sd, "vision_utt_transformer", cfg.vision_utt_transformer_num),
        "attention": convert_additive_attention(sd, "attention"),
        "CrossModalTrans_TA": convert_crossmodal(
            sd, "CrossModalTrans_TA", cfg.crossmodal_ta.layers),
        "CrossModalTrans_TA_V": convert_crossmodal(
            sd, "CrossModalTrans_TA_V", cfg.crossmodal_ta_v.layers),
        "classifier": convert_linear(sd, "classifier"),
    }
    return {"params": params}
