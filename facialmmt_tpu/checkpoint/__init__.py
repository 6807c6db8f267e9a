from facialmmt_tpu.checkpoint.torch_convert import (
    convert_additive_attention, convert_crossmodal, convert_hf_text_encoder,
    convert_linear, convert_multimodal, convert_pretrained_swin_backbone,
    convert_swin_backbone, convert_swin_fer, convert_unimodal,
    convert_utt_encoder, load_torch_state_dict)
