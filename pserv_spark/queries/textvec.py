"""DataFrame-API re-expressions — textvec (filled in incrementally)."""

from __future__ import annotations

QUERIES: dict = {}
