from facialmmt_tpu.ops.pallas.attention import fused_attention
