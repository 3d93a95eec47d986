from .skew import salted_aggregate, salted_broadcastable_join

__all__ = ["salted_aggregate", "salted_broadcastable_join"]
