"""Table consistency verification (Iceberg's verify/remove-orphans
family, Delta FSCK): walk a LakeTable's metadata tree and prove every
reference resolves BEFORE a reader trips on it mid-query.

``verify_table`` is the maintenance-job complement to the commit
protocol: commits are atomic, but storage is not incorruptible —
operators delete files by hand, retention jobs race mis-configured
clones (lake/clone.py documents exactly this hazard), object stores
lose renames, and a table migrated between stores can drop a suffix.
The checker reports, per category:

- **headers**: every ``snap-*.json`` parses; the version hint resolves
  to a retained header; the main chain walks parent-by-parent to its
  root or to an expired ancestor (expiry is normal history truncation,
  reported as the chain's floor, not an error).
- **refs**: every tag/branch points at a retained header.
- **manifests**: every manifest a retained or staged (WAP) header
  references exists and parses.
- **data files**: every file referenced by any retained snapshot or
  pending stage exists (one metadata RPC per file — O(live files),
  driver-side; run it as a background job at deploy scale, same class
  as vacuum's listing).
- **watermarks**: per-bucket watermarks are monotone child-over-parent
  along the main chain — a regression means replay dedupe would
  re-admit already-applied events.
- **orphans** (informational): unreferenced data files / manifests that
  a future ``vacuum`` would sweep.

Returns ``{"ok": bool, "errors": [...], "warnings": [...],
"counts": {...}}``; ``raise_on_error=True`` raises ``TableCorruption``
with the error list instead. Never mutates anything.
"""

from __future__ import annotations

import json
import os

from filters_spark.lake.table import LakeTable

__all__ = ["TableCorruption", "verify_table"]

_MAX_REPORTED = 20  # cap per-category path listings in the report


class TableCorruption(RuntimeError):
    """verify_table found dangling references or broken invariants."""


def verify_table(
    t: LakeTable,
    check_data_files: bool = True,
    raise_on_error: bool = False,
    orphan_min_age_seconds: float = 3600.0,
) -> dict:
    """``orphan_min_age_seconds``: age floor for the informational
    orphan count, defaulting to vacuum's own guard — a zero floor on a
    LIVE table counts a concurrent writer's not-yet-committed data
    files as phantom orphans (files land before their header), which a
    real vacuum would never sweep."""
    errors: list[str] = []
    warnings: list[str] = []
    counts: dict[str, int] = {}

    # -- headers ------------------------------------------------------------
    sids = t.snapshots()
    headers: dict[int, dict] = {}
    for sid in sids:
        try:
            headers[sid] = t._raw_snapshot(sid)
        except Exception as exc:
            errors.append(f"header snap-{sid:08d}.json unreadable: {exc}")
    counts["headers"] = len(headers)

    try:
        cur = t.current_snapshot_id()
    except Exception as exc:
        errors.append(f"version hint unresolvable: {exc}")
        cur = None
    if cur is not None and cur not in headers:
        errors.append(f"version hint points at missing snapshot {cur}")

    # main-chain walk: ends at the root (parent None) or at an expired
    # ancestor — the latter is the retention floor, not corruption
    chain: list[int] = []
    sid = cur
    while sid is not None and sid in headers:
        chain.append(sid)
        sid = headers[sid].get("parent_id")
    if sid is not None:  # walked off the retained set
        counts["history_floor"] = sid
    counts["chain_length"] = len(chain)

    # -- refs -----------------------------------------------------------------
    refs = {**t.tags(), **t.branches()}
    for name, rsid in sorted(refs.items()):
        if rsid not in headers:
            errors.append(f"ref {name!r} points at missing snapshot {rsid}")
    counts["refs"] = len(refs)

    # -- manifests + data files ----------------------------------------------
    wap_raws = []
    for w in t.wap_ids():
        try:
            wap_raws.append((f"wap {w!r}", t._wap_raw(w)))
        except Exception as exc:
            errors.append(f"staged header wap-{w}.json unreadable: {exc}")
    sources = [(f"snapshot {sid}", h) for sid, h in sorted(headers.items())]
    sources.extend(wap_raws)

    live_files: set[str] = set()
    seen_manifests: set[str] = set()
    for label, raw in sources:
        if raw.get("format") != 2:  # format-1: file lists inline
            for fl in (
                list(raw.get("buckets", {}).values())
                + list(raw.get("deltas", {}).values())
                + list(raw.get("delete_vectors", {}).values())
            ):
                live_files.update(fl)
            continue
        # defensive .get: a truncated/hand-edited header that parses as
        # JSON but lacks the key must surface as a report, not crash
        # the checker itself
        if "buckets" not in raw:
            errors.append(f"{label}: format-2 header lacks the 'buckets' map")
        for name in (
            list(raw.get("buckets", {}).values())
            + list(raw.get("deltas", {}).values())
            + list(raw.get("delete_vectors", {}).values())
        ):
            if name in seen_manifests:
                continue
            seen_manifests.add(name)
            p = os.path.join(t.meta_dir, name)
            try:
                body = json.loads(t.io.read_text(p))
                live_files.update(body["files"])
            except Exception as exc:
                errors.append(f"{label}: manifest {name} unreadable: {exc}")
    counts["manifests"] = len(seen_manifests)
    counts["data_files"] = len(live_files)

    if check_data_files:
        missing = sorted(f for f in live_files if not t.io.exists(f))
        counts["missing_data_files"] = len(missing)
        for f in missing[:_MAX_REPORTED]:
            errors.append(f"referenced data file missing: {f}")
        if len(missing) > _MAX_REPORTED:
            errors.append(
                f"... and {len(missing) - _MAX_REPORTED} more missing data files"
            )

    # -- watermark monotonicity along the main chain --------------------------
    for child, parent in zip(chain, chain[1:]):
        sanctioned = headers[child].get("operation") in (
            "bootstrap", "set-watermarks"
        )
        cw = headers[child].get("watermarks", {})
        pw = headers[parent].get("watermarks", {})
        for b, wm in pw.items():
            got = cw.get(b)
            if got is not None and got < wm:
                if sanctioned:
                    # the ONE sanctioned downward watermark move: the
                    # bootstrap handoff replaces the seeding commit's
                    # per-bucket maxima with the low replay-from
                    # position (LakeTable.set_watermarks) — the overlap
                    # window reconciles via LWW, not the watermark
                    # gate. Still WARN: the label is caller-supplied,
                    # so an operator auditing the table sees every
                    # regression instead of a silent skip.
                    warnings.append(
                        f"bucket {b} watermark lowered {wm!r} -> {got!r} "
                        f"by sanctioned "
                        f"{headers[child].get('operation')!r} commit "
                        f"{child} — verify this was a bootstrap handoff; "
                        "applied events at re-admitted positions rely on "
                        "LWW reconciliation, not the dedupe gate"
                    )
                else:
                    errors.append(
                        f"bucket {b} watermark regressed {wm!r} -> {got!r} "
                        f"between snapshots {parent} and {child} — replay "
                        "dedupe would re-admit applied events"
                    )

    # -- orphans (informational) ----------------------------------------------
    try:
        counts["orphans_pending_vacuum"] = len(
            t.vacuum(dry_run=True, min_age_seconds=orphan_min_age_seconds)
        )
    except Exception as exc:  # never fail verification on the extra scan
        warnings.append(f"orphan scan failed: {exc}")

    report = {"ok": not errors, "errors": errors, "warnings": warnings,
              "counts": counts}
    if errors and raise_on_error:
        raise TableCorruption("; ".join(errors[:5]) + (
            f" (+{len(errors) - 5} more)" if len(errors) > 5 else ""
        ))
    return report
