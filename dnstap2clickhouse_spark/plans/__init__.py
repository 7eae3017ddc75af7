from . import tpch, events_analytics

__all__ = ["tpch", "events_analytics"]
