from .registry import REGISTRY, QuerySpec  # noqa: F401
from . import extensions  # noqa: F401  (registers extension queries)
