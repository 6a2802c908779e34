from .registry import ORACLES, QUERIES, load_tables, query

__all__ = ["QUERIES", "ORACLES", "query", "load_tables"]
