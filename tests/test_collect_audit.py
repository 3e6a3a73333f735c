"""Every driver-side materialization must carry a written reason.

An unbounded ``.collect()`` means the operator isn't distributed — the
class of bug that never shows at test scale and OOMs the driver at
100 TB.  scripts/audit_driver_collects.py keeps the exhaustive
per-site allowlist; this test runs its scan so adding a collect
without a documented boundedness reason fails CI, not just the
round-end audit.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

_SPEC = importlib.util.spec_from_file_location(
    "audit_driver_collects",
    Path(__file__).resolve().parent.parent / "scripts" / "audit_driver_collects.py",
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


def test_all_driver_collect_sites_are_documented():
    sites = _MOD.scan()
    undocumented = sorted({s["site"] for s in sites} - set(_MOD.ALLOWED))
    assert not undocumented, (
        "driver-side collect without a boundedness reason — add it to "
        f"scripts/audit_driver_collects.py ALLOWED with why: {undocumented}"
    )


def test_collect_allowlist_has_no_stale_entries():
    sites = {s["site"] for s in _MOD.scan()}
    stale = sorted(set(_MOD.ALLOWED) - sites)
    assert not stale, f"allowlist entries with no matching site: {stale}"


def test_collect_site_counts_match_allowlist_pins():
    """ADVICE r5: the allowlist pins an expected SITE COUNT per
    function, so a second collect added inside an already-allowlisted
    function must be re-justified instead of inheriting the old
    site's reason silently."""
    counts: dict[str, int] = {}
    for s in _MOD.scan():
        counts[s["site"]] = counts.get(s["site"], 0) + 1
    drift = {
        site: (n, _MOD.ALLOWED[site][0])
        for site, n in counts.items()
        if site in _MOD.ALLOWED and n != _MOD.ALLOWED[site][0]
    }
    assert not drift, f"collect-site count drift (found, pinned): {drift}"
