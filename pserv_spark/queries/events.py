"""DataFrame-API re-expressions — events (filled in incrementally)."""

from __future__ import annotations

QUERIES: dict = {}
