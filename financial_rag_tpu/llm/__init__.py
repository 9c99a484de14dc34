from financial_rag_tpu.llm.provider import LLMProvider, NullLLM, get_provider
from financial_rag_tpu.llm.gemini import GeminiProvider

__all__ = ["LLMProvider", "NullLLM", "GeminiProvider", "get_provider"]
