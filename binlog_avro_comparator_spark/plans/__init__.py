from .registry import queries, oracle_sql, flagship

__all__ = ["queries", "oracle_sql", "flagship"]
