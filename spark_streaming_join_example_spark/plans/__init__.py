from .registry import REGISTRY, QuerySpec, oracle_sql_dict, queries_dict, register

__all__ = ["REGISTRY", "QuerySpec", "register", "queries_dict", "oracle_sql_dict"]
