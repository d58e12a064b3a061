from . import aggregates, filters, joins, setops, windows  # noqa: F401
