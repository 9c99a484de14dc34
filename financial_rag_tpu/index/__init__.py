from financial_rag_tpu.index.flat import FlatIndex
from financial_rag_tpu.index.ivf import IVFIndex

__all__ = ["FlatIndex", "IVFIndex"]
