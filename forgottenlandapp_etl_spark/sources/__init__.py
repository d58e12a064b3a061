from . import sinks  # noqa: F401
