from financial_rag_tpu.parallel.mesh import make_mesh
from financial_rag_tpu.parallel.sharded_index import ShardedFlatIndex
from financial_rag_tpu.parallel.sharded_ivf import ShardedIVFIndex

__all__ = ["make_mesh", "ShardedFlatIndex", "ShardedIVFIndex"]
