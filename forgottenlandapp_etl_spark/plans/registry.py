"""Merged query registry: reference-derived operators + extensions.

``QUERIES[name] -> (spark, sf_dir) -> DataFrame`` and ``ORACLE[name]`` the
equivalent DuckDB SQL (absent for genuinely non-SQL-expressible ops, which
the driver checks rows-only).
"""

from __future__ import annotations

from . import extension_queries, reference_queries, relational_queries

QUERIES = dict(reference_queries.QUERIES)
QUERIES.update(relational_queries.QUERIES)
QUERIES.update(extension_queries.QUERIES)

ORACLE = dict(reference_queries.ORACLE)
ORACLE.update(relational_queries.ORACLE)
ORACLE.update(extension_queries.ORACLE)
