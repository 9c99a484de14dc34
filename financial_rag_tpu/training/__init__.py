from financial_rag_tpu.training.contrastive import (
    contrastive_loss,
    make_train_step,
    param_sharding_rules,
)
from financial_rag_tpu.training.data import PairBatcher, pseudo_pairs_from_children
from financial_rag_tpu.training.rerank_ft import (
    ListwiseBatcher,
    make_rerank_train_step,
    mine_feedback_triples,
)

__all__ = [
    "contrastive_loss",
    "make_train_step",
    "param_sharding_rules",
    "PairBatcher",
    "pseudo_pairs_from_children",
    "ListwiseBatcher",
    "make_rerank_train_step",
    "mine_feedback_triples",
]
