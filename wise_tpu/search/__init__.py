from .query_parser import parse_search_query

__all__ = ["parse_search_query"]
