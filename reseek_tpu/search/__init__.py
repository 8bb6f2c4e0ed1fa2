from reseek_tpu.search.driver import SearchDriver, self_search, query_search

__all__ = ["SearchDriver", "self_search", "query_search"]
