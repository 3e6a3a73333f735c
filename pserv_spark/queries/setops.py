"""DataFrame-API re-expressions — setops (filled in incrementally)."""

from __future__ import annotations

QUERIES: dict = {}
