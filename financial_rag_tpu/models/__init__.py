from financial_rag_tpu.models.bert import (
    BertParams,
    bert_encode,
    bert_forward,
    cross_encoder_forward,
)
from financial_rag_tpu.models.checkpoint import (
    load_params,
    random_params,
    params_from_torch_state_dict,
)

__all__ = [
    "BertParams",
    "bert_forward",
    "bert_encode",
    "cross_encoder_forward",
    "load_params",
    "random_params",
    "params_from_torch_state_dict",
]
