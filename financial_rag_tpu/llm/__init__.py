from financial_rag_tpu.llm.provider import LLMProvider, NullLLM, get_provider
from financial_rag_tpu.llm.gemini import GeminiProvider
from financial_rag_tpu.llm.local_llm import LocalLLM

__all__ = ["LLMProvider", "NullLLM", "GeminiProvider", "LocalLLM", "get_provider"]
