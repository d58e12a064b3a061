from . import dates, num, scalar  # noqa: F401
