from facialmmt_tpu.ops.layers import AdditiveAttention, LayerNormTF
from facialmmt_tpu.ops.encoder import UttTransEncoder
from facialmmt_tpu.ops.crossmodal import CrossModalTransformerEncoder
from facialmmt_tpu.ops.gumbel import gumbel_softmax
from facialmmt_tpu.ops.span_extract import extract_utt_spans, spans_from_sep_mask
from facialmmt_tpu.ops.frame_filter import frame_importance_filter
