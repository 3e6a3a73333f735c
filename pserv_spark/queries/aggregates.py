"""DataFrame-API re-expressions — aggregates (filled in incrementally)."""

from __future__ import annotations

QUERIES: dict = {}
