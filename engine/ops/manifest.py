"""Manifest rewrite: regroup file entries, recompute aggregate stats.

Data files are untouched; only the metadata tree is rewritten so that
(a) each manifest holds one partition's (or one curve range's) entries,
and (b) manifest-level min/max stats become tight again after many
incremental commits have interleaved entries across manifests.  Tight
manifest stats let Table.scan prune whole manifests without opening
their entry lists — the metadata analog of data clustering, and the
piece that keeps scan *planning* cheap when a table has 10^6+ data
files (entry lists stop being proportional to query selectivity).

Reference analog: the per-root index map rebuild
(/root/reference/src/vector_db/lance_client/mod.rs:91-128) — regrouping
lookup structures by key without touching stored rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..tablefmt import DataFile, Table


@dataclass
class RewriteManifestsResult:
    manifests_before: int
    manifests_after: int
    entries: int
    snapshot_id: int


def rewrite_manifests(
    table: Table,
    group_by: str = "partition",
    target_entries: int = 5000,
) -> RewriteManifestsResult:
    """Regroup the current snapshot's entries into fresh manifests.

    ``group_by='partition'`` → one manifest per partition value (split
    at ``target_entries``); ``group_by='repo'`` → group by each entry's
    repo min-stat range (useful after clustering, when files are
    repo-disjoint).
    """
    base = table.current_snapshot_id
    snap = table.snapshot(base)
    entries = table.files(base)

    groups: dict[str, list[DataFile]] = {}
    for e in entries:
        if group_by == "partition":
            key = e.partition
        elif group_by == "repo":
            key = (e.stats.get("repo") or ["", ""])[0]
        else:
            raise ValueError(group_by)
        groups.setdefault(key, []).append(e)

    manifests: list[str] = []
    for key in sorted(groups):
        members = sorted(groups[key], key=lambda e: (e.stats.get("repo") or [""])[0])
        for i in range(0, len(members), target_entries):
            manifests.append(
                table._write_manifest(members[i : i + target_entries], key)
            )

    new_snap = table._commit_snapshot(
        base + 1,
        base,
        "rewrite-manifests",
        manifests,
        {
            "manifests_before": len(snap.manifests),
            "manifests_after": len(manifests),
            "entries": len(entries),
        },
    )
    return RewriteManifestsResult(
        len(snap.manifests), len(manifests), len(entries), new_snap.snapshot_id
    )
