from financial_rag_tpu.store.snowflake import SnowflakeGenerator
from financial_rag_tpu.store.parent_store import ParentStore
from financial_rag_tpu.store.child_meta import ChildMetaStore

__all__ = ["SnowflakeGenerator", "ParentStore", "ChildMetaStore"]
