from financial_rag_tpu.index.flat import FlatIndex
from financial_rag_tpu.index.ivf import IVFIndex
from financial_rag_tpu.index.multivector import MultiVectorIndex

__all__ = ["FlatIndex", "IVFIndex", "MultiVectorIndex"]
