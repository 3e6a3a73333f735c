"""DataFrame-API re-expressions — scalar_fns (filled in incrementally)."""

from __future__ import annotations

QUERIES: dict = {}
