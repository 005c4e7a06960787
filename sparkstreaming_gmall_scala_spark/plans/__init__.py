from .catalog import REGISTRY, Query, register

__all__ = ["REGISTRY", "Query", "register"]
