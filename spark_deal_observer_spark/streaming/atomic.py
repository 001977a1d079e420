"""Torn-write hygiene for the directory-per-batch sink protocol.

Every stateful sink here persists state as `<base>/<prefix>=<id>`
directories written by Spark jobs. Spark's commit protocol makes the
contents appear via per-file renames and writes the `_SUCCESS` marker
LAST — so a crash mid-commit leaves a directory that EXISTS but is not
committed (some files, no marker). Two invariants keep that harmless:

  * SELECTION: restart recovery and snapshot selection must only ever
    see COMMITTED directories (`committed_ids`). A torn directory picked
    as "latest applied" would make the ledger skip the crashed batch's
    redelivery (lost data) or feed partial state into a merge.
  * HEALING: the redelivered batch overwrites its own directory
    (`mode("overwrite")` truncates whatever the crash left), so torn
    state never needs repair, only invisibility until overwritten.

Chaos-tested in tests/test_crash_recovery.py.
"""

from __future__ import annotations

import os


def committed_ids(base: str, prefix: str) -> list[int]:
    """Sorted ids of committed `<prefix>=<id>` dirs under `base` — dirs
    carrying the `_SUCCESS` marker Spark writes at job commit. Torn dirs
    (crash between file moves and the marker) are excluded."""
    if not os.path.isdir(base):
        return []
    out = []
    for d in os.listdir(base):
        if not d.startswith(f"{prefix}="):
            continue
        sid = d.split("=", 1)[1]
        if sid.isdigit() and os.path.exists(
            os.path.join(base, d, "_SUCCESS")
        ):
            out.append(int(sid))
    return sorted(out)
