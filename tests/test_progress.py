"""PROGRESS.jsonl normalizer: session detection and per-round wall sums
that survive driver restarts (wall_s resets)."""

import json

from kbner_tpu.utils.progress import read_progress, round_wall_seconds


def _write(tmp_path, rows):
    p = tmp_path / "PROGRESS.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return p


def test_sessions_and_round_walls(tmp_path):
    rows = [
        {"ts": 1000.0, "wall_s": 100.0, "round": 1},
        {"ts": 1600.0, "wall_s": 700.0, "round": 1},
        # driver restart: wall_s resets, same round continues
        {"ts": 2000.0, "wall_s": 50.0, "round": 1},
        {"ts": 2400.0, "wall_s": 450.0, "round": 1},
        # next round, same session clock keeps running
        {"ts": 3000.0, "wall_s": 1050.0, "round": 2},
        {"ts": 3500.0, "wall_s": 1550.0, "round": 2},
    ]
    p = _write(tmp_path, rows)
    recs = read_progress(p)
    assert [r["session"] for r in recs] == [0, 0, 1, 1, 1, 1]
    assert recs[0]["session_wall_s"] == 0.0
    assert recs[1]["session_wall_s"] == 600.0
    assert recs[2]["session_wall_s"] == 0.0
    walls = round_wall_seconds(p)
    # round 1 = (1600-1000) + (2400-2000); the restart gap is excluded
    assert walls[1] == 600.0 + 400.0
    # round 2 span within session 1
    assert walls[2] == 500.0


def test_real_progress_file_parses():
    """The repo's own PROGRESS.jsonl (if present) normalizes: sums are
    non-negative and every round appears."""
    import pathlib

    p = pathlib.Path(__file__).resolve().parent.parent / "PROGRESS.jsonl"
    if not p.exists():
        return
    walls = round_wall_seconds(p)
    assert all(v >= 0 for v in walls.values())
    recs = read_progress(p)
    assert all(r["session_wall_s"] >= 0 for r in recs)
