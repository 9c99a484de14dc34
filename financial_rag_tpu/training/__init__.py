from financial_rag_tpu.training.contrastive import (
    contrastive_loss,
    make_train_step,
    param_sharding_rules,
)

__all__ = ["contrastive_loss", "make_train_step", "param_sharding_rules"]
