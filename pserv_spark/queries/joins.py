"""DataFrame-API re-expressions — joins (filled in incrementally)."""

from __future__ import annotations

QUERIES: dict = {}
