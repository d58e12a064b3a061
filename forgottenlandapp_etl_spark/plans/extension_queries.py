"""LLM-data-pipeline extension operators (SURVEY.md §7.6) — filled in
incrementally: dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash),
similarity search over embeddings, text analysis."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict[str, str] = {}
