"""PROGRESS.jsonl normalization (VERDICT r4 #8 / r3 advisor, low).

The build driver appends ``{"ts", "wall_s", "round", "commits", ...}``
records, but ``wall_s`` is the driver SESSION's clock and resets to zero
whenever the driver restarts mid-round — naively summing or diffing
``wall_s`` across a round double-counts or goes negative. The repo does
not own the writer, so the fix is a consumer-side normalizer: detect
session boundaries (``wall_s`` decreasing), assign session ids, and
compute per-round wall-clock as the sum of each session's absolute
``ts`` span — monotonic, gap-free, and independent of where the
session clock started.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List


def read_progress(path: str | Path) -> List[dict]:
    """Parse PROGRESS.jsonl and annotate each record with a ``session``
    id (increments whenever ``wall_s`` decreases — a driver restart) and
    ``session_wall_s`` (wall_s rebased to the session's first record, so
    in-session deltas are directly comparable)."""
    records: List[dict] = []
    session = 0
    prev_wall = None
    base = 0.0
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if prev_wall is not None and r["wall_s"] < prev_wall:
                session += 1
                base = r["wall_s"]
            elif prev_wall is None:
                base = r["wall_s"]
            prev_wall = r["wall_s"]
            r = dict(r)
            r["session"] = session
            r["session_wall_s"] = r["wall_s"] - base
            records.append(r)
    return records


def round_wall_seconds(path: str | Path) -> Dict[int, float]:
    """Per-round wall-clock seconds, computable without double counting:
    within each (round, session) group the absolute ``ts`` span is
    summed — session restarts neither reset nor double-count, and driver
    downtime between sessions is excluded."""
    spans: Dict[tuple, List[float]] = {}
    for r in read_progress(path):
        key = (int(r["round"]), r["session"])
        ts = float(r["ts"])
        if key not in spans:
            spans[key] = [ts, ts]
        else:
            spans[key][0] = min(spans[key][0], ts)
            spans[key][1] = max(spans[key][1], ts)
    out: Dict[int, float] = {}
    for (rnd, _sess), (lo, hi) in spans.items():
        out[rnd] = out.get(rnd, 0.0) + (hi - lo)
    return out


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Summarize PROGRESS.jsonl per round (session-safe)")
    ap.add_argument("path", nargs="?", default="PROGRESS.jsonl")
    args = ap.parse_args(argv)
    per_round = round_wall_seconds(args.path)
    for rnd in sorted(per_round):
        print(f"round {rnd}: {per_round[rnd] / 3600.0:.2f} h")


if __name__ == "__main__":
    main()
