"""JAX pytree -> torch state_dict export (the inverse of torch_convert.py).

Lets models trained in this framework be evaluated by the reference's own
code on machines that have the released MELD data: export a state_dict .pt,
then on the reference side build the module and `load_state_dict` it
(reference utils/util.py:121-159 persists/loads these tensors; the reference's
`--doEval` path consumes the same weights).  This is the cleanest external
W-F1 parity check available (VERDICT r2 missing #3).

Shape conventions are the exact inverses of torch_convert.py:
  * flax kernel (in, out)   -> torch Linear weight (out, in)   [transpose]
  * patch-matmul kernel (p, p, C, E) -> torch Conv2d (E, C, p, p)
  * in_proj_kernel (E, 3E)  -> packed in_proj_weight (3E, E)
  * batch_stats {mean, var} -> BatchNorm running_mean/running_var
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


# ---------------------------------------------------------------- primitives --

def export_linear(tree: Mapping[str, Any], out: Dict[str, np.ndarray],
                  prefix: str) -> None:
    out[f"{prefix}.weight"] = _np(tree["kernel"]).T.copy()
    if "bias" in tree:
        out[f"{prefix}.bias"] = _np(tree["bias"])


def export_norm(tree: Mapping[str, Any], out: Dict[str, np.ndarray],
                prefix: str) -> None:
    """Handles both LayerNormTF ('weight') and flax nn.LayerNorm/BatchNorm
    ('scale') parameter names."""
    out[f"{prefix}.weight"] = _np(tree["weight"] if "weight" in tree
                                  else tree["scale"])
    out[f"{prefix}.bias"] = _np(tree["bias"])


def export_embedding(tree: Mapping[str, Any], out: Dict[str, np.ndarray],
                     prefix: str) -> None:
    out[f"{prefix}.weight"] = _np(tree["embedding"])


# ------------------------------------------------------------------- modules --

def _num_layers(tree) -> int:
    """Layer count derived from the tree itself (layer_{i} keys), so export
    works for any checkpoint size without config plumbing."""
    return sum(1 for k in tree if str(k).startswith("layer_"))


def export_utt_encoder(tree, out, prefix: str) -> None:
    """Inverse of convert_utt_encoder (reference modules/Transformer.py:196-227)."""
    p = prefix + "." if prefix else ""
    out[f"{p}position_embeddings.weight"] = _np(tree["position_embeddings"])
    for i in range(_num_layers(tree)):
        lt = tree[f"layer_{i}"]
        lp = f"{p}layer.{i}"
        for name in ("query", "key", "value"):
            export_linear(lt["selfatt"][name], out,
                          f"{lp}.transformer_self_attention.selfatt.{name}")
        export_linear(lt["attn_dense"], out,
                      f"{lp}.transformer_self_attention.dense_norm.dense")
        export_norm(lt["attn_norm"], out,
                    f"{lp}.transformer_self_attention.dense_norm.LayerNorm")
        export_linear(lt["intermediate"], out, f"{lp}.intermediate.dense")
        export_linear(lt["output"], out, f"{lp}.output.dense")
        export_norm(lt["out_norm"], out, f"{lp}.output.LayerNorm")


def export_additive_attention(tree, out, prefix: str) -> None:
    p = prefix + "." if prefix else ""
    out[f"{p}query_vector"] = _np(tree["query_vector"])
    export_linear(tree["P"], out, f"{p}P")
    export_linear(tree["Q"], out, f"{p}Q")
    export_linear(tree["value"], out, f"{p}value")


def export_crossmodal(tree, out, prefix: str) -> None:
    p = prefix + "." if prefix else ""
    export_norm(tree["final_norm"], out, f"{p}layer_norm")
    # persistent buffers the reference module's strict load_state_dict expects
    # (reference CrossmodalTransformer.py:44; position_embedding.py:42 — the
    # _float_tensor is an uninitialized device/dtype sentinel, value unused)
    out[f"{p}version"] = np.asarray([2.0], np.float32)
    out[f"{p}embed_positions._float_tensor"] = np.zeros((1,), np.float32)
    for i in range(_num_layers(tree)):
        lt = tree[f"layer_{i}"]
        lp = f"{p}layers.{i}"
        out[f"{lp}.self_attn.in_proj_weight"] = \
            _np(lt["self_attn"]["in_proj_kernel"]).T.copy()
        out[f"{lp}.self_attn.in_proj_bias"] = \
            _np(lt["self_attn"]["in_proj_bias"])
        export_linear(lt["self_attn"]["out_proj"], out,
                      f"{lp}.self_attn.out_proj")
        export_linear(lt["fc1"], out, f"{lp}.fc1")
        export_linear(lt["fc2"], out, f"{lp}.fc2")
        export_norm(lt["ln0"], out, f"{lp}.layer_norms.0")
        export_norm(lt["ln1"], out, f"{lp}.layer_norms.1")


def export_swin_backbone(params, batch_stats, out, prefix: str) -> None:
    """Inverse of convert_swin_backbone (reference Swin_Transformer.py:434-541).
    Stage/block structure is derived from the stage_{s}_block_{d} keys; so are
    the window size (bias-table rows = (2ws-1)^2) and the per-stage grid
    resolution (head_linear fan-in = final_tokens * final_dim), which the
    persistent index/mask buffers below need."""
    p = prefix + "." if prefix else ""
    depths = []
    s = 0
    while f"stage_{s}_block_0" in params:
        d = 0
        while f"stage_{s}_block_{d}" in params:
            d += 1
        depths.append(d)
        s += 1
    out[f"{p}patch_embed.proj.weight"] = \
        _np(params["patch_embed"]["proj_kernel"]).transpose(3, 2, 0, 1).copy()
    out[f"{p}patch_embed.proj.bias"] = _np(params["patch_embed"]["proj_bias"])
    if "norm" in params["patch_embed"]:
        export_norm(params["patch_embed"]["norm"], out, f"{p}patch_embed.norm")

    # geometry for the reference modules' persistent buffers
    # (Swin_Transformer.py:103 relative_position_index, :231 attn_mask):
    from facialmmt_tpu.ops.swin import (relative_position_index,
                                        shifted_window_mask)
    embed_dim = int(np.asarray(params["patch_embed"]["proj_kernel"]).shape[3])
    c_final = embed_dim * 2 ** (len(depths) - 1)
    head_in = int(np.asarray(params["head_linear"]["kernel"]).shape[0])
    final_res = int(round(np.sqrt(head_in // c_final)))

    for s in range(len(depths)):
        res = final_res * 2 ** (len(depths) - 1 - s)
        for d in range(depths[s]):
            bt = params[f"stage_{s}_block_{d}"]
            bp = f"{p}layers.{s}.blocks.{d}"
            export_norm(bt["norm1"], out, f"{bp}.norm1")
            export_norm(bt["norm2"], out, f"{bp}.norm2")
            export_linear(bt["attn"]["qkv"], out, f"{bp}.attn.qkv")
            export_linear(bt["attn"]["proj"], out, f"{bp}.attn.proj")
            table = np.asarray(bt["attn"]["relative_position_bias_table"])
            out[f"{bp}.attn.relative_position_bias_table"] = _np(table)
            ws = (int(round(np.sqrt(table.shape[0]))) + 1) // 2
            ws_eff = min(ws, res)
            out[f"{bp}.attn.relative_position_index"] = \
                relative_position_index(ws_eff).astype(np.int64)
            # shifted blocks carry the SW-MSA mask buffer; non-shifted blocks
            # register None, which torch omits from the state_dict
            shift = 0 if (d % 2 == 0 or res <= ws) else ws // 2
            if shift > 0:
                out[f"{bp}.attn_mask"] = shifted_window_mask(
                    res, res, ws_eff, shift).astype(np.float32)
            export_linear(bt["mlp_fc1"], out, f"{bp}.mlp.fc1")
            export_linear(bt["mlp_fc2"], out, f"{bp}.mlp.fc2")
        if s < len(depths) - 1:
            dt = params[f"stage_{s}_downsample"]
            dp = f"{p}layers.{s}.downsample"
            export_norm(dt["norm"], out, f"{dp}.norm")
            export_linear(dt["reduction"], out, f"{dp}.reduction")

    export_norm(params["head_norm"], out, f"{p}output_layer.0")
    export_linear(params["head_linear"], out, f"{p}output_layer.2")
    export_norm(params["head_bn"], out, f"{p}output_layer.3")
    out[f"{p}output_layer.3.running_mean"] = \
        _np(batch_stats["head_bn"]["mean"])
    out[f"{p}output_layer.3.running_var"] = _np(batch_stats["head_bn"]["var"])
    # torch BatchNorm1d state_dicts carry this; harmless for inference
    out[f"{p}output_layer.3.num_batches_tracked"] = np.asarray(0, np.int64)


def export_swin_fer(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_swin_fer (reference src/models.py:14-37)."""
    out: Dict[str, np.ndarray] = {}
    export_swin_backbone(variables["params"]["swin"],
                         variables["batch_stats"]["swin"], out, "swin")
    export_linear(variables["params"]["linear"], out, "linear")
    export_linear(variables["params"]["classifier"], out, "classifier")
    return out


def export_hf_text_encoder(tree, out, prefix: str) -> None:
    """Inverse of convert_hf_text_encoder.  The HF pooler never existed in
    our tree (the reference uses only outputs[0]); load with strict=False on
    the torch side or delete the pooler from the reference module first."""
    p = prefix + "." if prefix else ""
    export_embedding(tree["word_embeddings"], out,
                     f"{p}embeddings.word_embeddings")
    export_embedding(tree["position_embeddings"], out,
                     f"{p}embeddings.position_embeddings")
    export_embedding(tree["token_type_embeddings"], out,
                     f"{p}embeddings.token_type_embeddings")
    export_norm(tree["embeddings_norm"], out, f"{p}embeddings.LayerNorm")
    for i in range(_num_layers(tree)):
        lt = tree[f"layer_{i}"]
        lp = f"{p}encoder.layer.{i}"
        export_linear(lt["query"], out, f"{lp}.attention.self.query")
        export_linear(lt["key"], out, f"{lp}.attention.self.key")
        export_linear(lt["value"], out, f"{lp}.attention.self.value")
        export_linear(lt["attn_out"], out, f"{lp}.attention.output.dense")
        export_norm(lt["attn_norm"], out, f"{lp}.attention.output.LayerNorm")
        export_linear(lt["intermediate"], out, f"{lp}.intermediate.dense")
        export_linear(lt["output"], out, f"{lp}.output.dense")
        export_norm(lt["out_norm"], out, f"{lp}.output.LayerNorm")


def export_unimodal(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_unimodal (reference src/models.py:192-223)."""
    params = variables["params"]
    out: Dict[str, np.ndarray] = {}
    export_linear(params["modality_linear"], out, "modality_linear")
    export_utt_encoder(params["utt_transformer"], out, "utt_transformer")
    export_additive_attention(params["attention"], out, "attention")
    export_linear(params["classifier"], out, "classifier")
    return out


def export_multimodal(variables, plm_name: str = "roberta-large"
                      ) -> Dict[str, np.ndarray]:
    """Inverse of convert_multimodal (reference src/models.py:41-188).
    plm_name picks the text-tower attribute name the reference uses
    ('roberta' vs 'bert', reference src/models.py:73-76)."""
    hf_prefix = "roberta" if "roberta" in plm_name else "bert"
    params = variables["params"]
    out: Dict[str, np.ndarray] = {}
    export_hf_text_encoder(params["text_encoder"], out, hf_prefix)
    export_linear(params["text_linear"], out, "text_linear")
    export_linear(params["audio_linear"], out, "audio_linear")
    export_utt_encoder(params["audio_utt_transformer"], out,
                       "audio_utt_transformer")
    export_linear(params["vision_linear"], out, "vision_linear")
    export_utt_encoder(params["vision_utt_transformer"], out,
                       "vision_utt_transformer")
    export_additive_attention(params["attention"], out, "attention")
    export_crossmodal(params["CrossModalTrans_TA"], out, "CrossModalTrans_TA")
    export_crossmodal(params["CrossModalTrans_TA_V"], out,
                      "CrossModalTrans_TA_V")
    export_linear(params["classifier"], out, "classifier")
    return out


def save_state_dict_pt(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write a torch state_dict .pt (tensors, not a whole-module pickle —
    loadable with `module.load_state_dict(torch.load(path))` on the
    reference side, and by our own load_torch_state_dict)."""
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)
