from financial_rag_tpu.serving.app import create_app

__all__ = ["create_app"]
