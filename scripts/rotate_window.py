#!/usr/bin/env python
"""Round-start helper: recompute the DRIVER_VERIFIED snapshot.

The external driver hash-checks only the first 50 registry entries
each round and records the results in ``CORRECTNESS_r{N}.json``.
``pserv_spark.registry.DRIVER_VERIFIED`` is a deliberate literal
snapshot of every id that already has a green driver row (rows +
schema + hash all true, err null); ``build_queries()`` pushes those
behind the not-yet-verified priority window so each round's prefix
yields 50 NEW hard-signal rows.

ROTATING REGRESSION WINDOW (round 9, VERDICT r8 #3): once every id is
verified, the snapshot's ORDER becomes the regression schedule — ids
sorted by the round of their LAST green driver row ascending (stalest
first; first-green order breaks ties), so the driver prefix
re-verifies the 50 least-recently-checked ids on current HEAD each
round and the whole exact surface re-confirms every ~6 rounds.

Run this at the start of each round, after the driver has written the
previous round's CORRECTNESS file:

    python scripts/rotate_window.py          # report drift
    python scripts/rotate_window.py --write  # patch registry.py in place

``--write`` rewrites the DRIVER_VERIFIED tuple literal from the
committed CORRECTNESS_r*.json files.  The tuple stays a literal in
source — reviewable, diffable, and immune to a missing/renamed
CORRECTNESS file at driver time.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def green_history() -> tuple[list[str], dict[str, int]]:
    """(first-seen-green order, id -> round index of LAST green row)."""
    first_seen: list[str] = []
    last_green: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", path.name).group(1))
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                if name not in last_green:
                    first_seen.append(name)
                last_green[name] = max(last_green.get(name, 0), rnd)
    return first_seen, last_green


def green_ids() -> list[str]:
    """All ids with a fully-green driver row, stalest-verified first
    (last green round ascending, first-green order as tiebreak)."""
    first_seen, last_green = green_history()
    rank = {n: i for i, n in enumerate(first_seen)}
    return sorted(first_seen, key=lambda n: (last_green[n], rank[n]))


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
    stale = [n for n in current if n not in verified]
    print(f"CORRECTNESS files: green ids = {len(verified)}")
    print(f"registry snapshot: DRIVER_VERIFIED = {len(current)}")
    if stale:
        # A snapshotted id with no green row in any file would mean the
        # snapshot was hand-edited ahead of the evidence — flag it.
        print(f"STALE (snapshotted but no green row on record): {stale}")
    if current == verified:
        print("snapshot is current (ids and staleness order both match).")
        return 0

    added = [n for n in verified if n not in current]
    if added:
        print(f"NEW green ids to add ({len(added)}): {added}")
    if [n for n in current if n in set(verified)] != [
        n for n in verified if n in set(current)
    ]:
        print("ORDER drift: staleness ranking changed since last rotation.")
    # The next driver window: unverified ids first, then the stalest
    # verified ids (mirrors registry.driver_window_order; rows-only
    # ids are demoted behind everything and never burn a slot).
    from pserv_spark.registry import build_oracles

    rows_only = set(registered) - set(build_oracles())
    unverified = [
        n for n in registered if n not in set(verified) and n not in rows_only
    ]
    next_prefix = (unverified + verified)[:50]
    print(f"next driver window after rotation (first 10): {next_prefix[:10]}")

    if not args.write:
        print("\n(re-run with --write to patch registry.py)")
        return 1

    reg_path = REPO / "pserv_spark" / "registry.py"
    src = reg_path.read_text()
    body = "\n".join(f'    "{n}",' for n in verified)
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
    print(f"patched {reg_path} ({len(verified)} ids, stalest-first order)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
