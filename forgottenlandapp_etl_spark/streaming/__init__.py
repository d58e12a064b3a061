from . import online  # noqa: F401
