from .registry import ORACLE, QUERIES  # noqa: F401
