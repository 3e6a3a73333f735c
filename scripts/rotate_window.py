#!/usr/bin/env python
"""Round-start helper: recompute the DRIVER_VERIFIED snapshot.

The external driver hash-checks only the first 50 registry entries
each round and records the results in ``CORRECTNESS_r{N}.json``.
``pserv_spark.registry.DRIVER_VERIFIED`` is a deliberate literal
snapshot of every id that already has a green driver row (rows +
schema + hash all true, err null); ``build_queries()`` pushes those
behind the not-yet-verified priority window so each round's prefix
yields 50 NEW hard-signal rows.

Run this at the start of each round, after the driver has written the
previous round's CORRECTNESS file:

    python scripts/rotate_window.py          # report drift
    python scripts/rotate_window.py --write  # patch registry.py in place

``--write`` rewrites the DRIVER_VERIFIED tuple literal with the union
of all green ids across every committed CORRECTNESS_r*.json (original
relative order preserved, new ids appended in registry order).  The
tuple stays a literal in source — reviewable, diffable, and immune to
a missing/renamed CORRECTNESS file at driver time.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def green_ids() -> list[str]:
    """All ids with a fully-green driver row, in first-seen order."""
    out: list[str] = []
    seen: set[str] = set()
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if name in seen or not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                seen.add(name)
                out.append(name)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--write", action="store_true", help="patch registry.py in place")
    args = ap.parse_args()

    from pserv_spark.registry import DRIVER_VERIFIED, build_queries

    verified = green_ids()
    registered = list(build_queries())
    unknown = [n for n in verified if n not in registered]
    if unknown:
        print(f"WARNING: green driver rows for unregistered ids: {unknown}")
        verified = [n for n in verified if n in registered]

    current = list(DRIVER_VERIFIED)
    missing = [n for n in verified if n not in current]
    stale = [n for n in current if n not in verified]
    print(f"CORRECTNESS files: green ids = {len(verified)}")
    print(f"registry snapshot: DRIVER_VERIFIED = {len(current)}")
    if stale:
        # A snapshotted id with no green row in any file would mean the
        # snapshot was hand-edited ahead of the evidence — flag it.
        print(f"STALE (snapshotted but no green row on record): {stale}")
    if not missing:
        print("snapshot is current; next window already rotates past all green ids.")
        return 0

    print(f"NEW green ids to add ({len(missing)}): {missing}")
    next_prefix = [n for n in registered if n not in set(current) | set(missing)][:50]
    print(f"next driver window after rotation (first 10): {next_prefix[:10]}")

    if not args.write:
        print("\n(re-run with --write to patch registry.py)")
        return 1

    reg_path = REPO / "pserv_spark" / "registry.py"
    src = reg_path.read_text()
    body = "\n".join(
        f'    "{n}",' for n in current + missing
    )
    new_literal = f"DRIVER_VERIFIED: tuple[str, ...] = (\n{body}\n)"
    patched, n = re.subn(
        r"DRIVER_VERIFIED: tuple\[str, \.\.\.\] = \(.*?\n\)",
        new_literal,
        src,
        count=1,
        flags=re.S,
    )
    if n != 1:
        print("ERROR: could not locate DRIVER_VERIFIED literal in registry.py")
        return 2
    reg_path.write_text(patched)
    print(f"patched {reg_path} (+{len(missing)} ids, total {len(current) + len(missing)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
