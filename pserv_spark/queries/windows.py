"""DataFrame-API re-expressions — windows (filled in incrementally)."""

from __future__ import annotations

QUERIES: dict = {}
