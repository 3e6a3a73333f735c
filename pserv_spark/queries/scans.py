"""DataFrame-API re-expressions — scans (filled in incrementally)."""

from __future__ import annotations

QUERIES: dict = {}
