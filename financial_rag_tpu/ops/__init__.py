from financial_rag_tpu.ops.pool_norm import masked_mean_l2_normalize
from financial_rag_tpu.ops.topk import (
    bucketed_topk,
    bucketed_topk_fused,
    packed_topk_fused,
    topk_matmul,
    topk_matmul_reference,
)
from financial_rag_tpu.ops.flash_attention import flash_attention
from financial_rag_tpu.ops.causal_flash import causal_flash_prefill

__all__ = [
    "masked_mean_l2_normalize",
    "bucketed_topk",
    "bucketed_topk_fused",
    "packed_topk_fused",
    "topk_matmul",
    "topk_matmul_reference",
    "flash_attention",
    "causal_flash_prefill",
]
