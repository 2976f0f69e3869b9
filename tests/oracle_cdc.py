"""Pure-Python (non-Spark) replay oracle — FIXTURES.md §4.

Applies the change events strictly sequentially in (lsn, offset) order,
deduplicating repeated (partition, offset) deliveries, with the same
normalize semantics as the engine. The engine's LWW-merge must produce
exactly this final state (token-array equality per doc_id)."""

from __future__ import annotations


def oracle_replay(
    events: list[dict], vocab: int, max_len: int
) -> dict[str, dict]:
    state: dict[str, dict] = {}
    seen: set[tuple[int, int]] = set()
    for e in sorted(events, key=lambda e: (e["lsn"], e["offset"])):
        key = (e["partition"], e["offset"])
        if key in seen:
            continue
        seen.add(key)
        if e["op"] == "delete":
            state.pop(e["doc_id"], None)
            continue
        toks = [int(t) for t in (e.get("tokens") or []) if 0 <= t < vocab][:max_len]
        if not toks:
            continue  # invalid insert/update: dropped
        state[e["doc_id"]] = {
            "tokens": tuple(toks),
            "n_tok": len(toks),
            "source": e.get("source"),
            "tag": e.get("tag"),
        }
    return state


def table_state(df, with_tag: bool = False) -> dict[str, dict]:
    """Canonicalize a lake-table read() into the oracle's shape."""
    out = {}
    for r in df.collect():
        d = r.asDict()
        out[d["doc_id"]] = {
            "tokens": tuple(d["tokens"]),
            "n_tok": d["n_tok"],
            "source": d["source"],
            "tag": d.get("tag"),
        }
    return out
