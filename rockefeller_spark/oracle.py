"""Single-threaded pandas replay oracle — the semantic ground truth.

Applies change events one at a time in ascending LSN order into a dict,
exactly the reference's per-row apply semantics
(``/root/reference/scripts/collector.py:103-141`` INSERTs,
``/root/reference/scripts/verify.py:60-87`` keyed UPDATEs) made keyed and
idempotent. Deliberately slow and obvious: this is what the distributed
engine must equal, state-for-state.
"""

from __future__ import annotations

import pandas as pd

PAYLOAD_BASE = ["role", "text", "tool", "ts"]


def replay(events: pd.DataFrame, base: pd.DataFrame | None = None) -> pd.DataFrame:
    """Replay ``events`` (columns per CHANGE_EVENT_SCHEMA, possibly with
    additive extras) over optional ``base`` transcript rows; return the
    final visible table sorted by (conv_id, turn_idx).

    Semantics:
    - events apply in ascending ``lsn``; equal-LSN duplicates are identical
      payloads, so re-apply is a no-op (idempotence).
    - 'I'/'U' both upsert the payload (last-writer-wins by lsn).
    - 'D' tombstones the key; a later (higher-lsn) insert resurrects it.
    - base rows have an implicit lsn of -inf (any event beats them).
    """
    payload_cols = [c for c in events.columns if c not in ("lsn", "op", "event_ts")
                    and c not in ("conv_id", "turn_idx")]
    state: dict[tuple, dict] = {}
    if base is not None:
        for rec in base.to_dict("records"):
            key = (rec["conv_id"], rec["turn_idx"])
            row = {c: rec.get(c) for c in payload_cols}
            row["_deleted"] = False
            row["_lsn"] = -1
            state[key] = row
    ev = events.sort_values("lsn", kind="mergesort")
    for rec in ev.to_dict("records"):
        key = (rec["conv_id"], rec["turn_idx"])
        cur = state.get(key)
        if cur is not None and rec["lsn"] <= cur["_lsn"]:
            continue  # stale or duplicate
        if rec["op"] == "D":
            state[key] = {c: None for c in payload_cols} | {"_deleted": True, "_lsn": rec["lsn"]}
        else:
            row = {c: rec.get(c) for c in payload_cols}
            row["_deleted"] = False
            row["_lsn"] = rec["lsn"]
            state[key] = row
    out_rows = []
    for (conv_id, turn_idx), row in state.items():
        if row["_deleted"]:
            continue
        out_rows.append({"conv_id": conv_id, "turn_idx": turn_idx}
                        | {c: row.get(c) for c in payload_cols})
    cols = ["conv_id", "turn_idx"] + payload_cols
    out = pd.DataFrame(out_rows, columns=cols)
    return out.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
