from .registry import REGISTRY, QuerySpec  # noqa: F401
