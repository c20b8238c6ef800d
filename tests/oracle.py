"""Single-threaded pure-Python oracle of the engine semantics.

Deliberately naive (plain loops, no numpy vectorization, no shared code
with the Spark kernels) — reimplements the reference semantics from the
spec so tests compare two independent derivations (FIXTURES.md §3; the
reference's analytic-golden strategy, design.md:2260-2345).
"""

from __future__ import annotations

import math


def frames(tokens: list[int], frame_len: int, hop: int) -> list[list[int]]:
    """Frame f covers [f*hop, f*hop+frame_len), truncated at the end;
    frames exist for every start < len(tokens)."""
    out = []
    start = 0
    while start < len(tokens):
        out.append(tokens[start : start + frame_len])
        start += hop
    return out


def bigram_counts(frame: list[int], n_buckets: int, mult: int = 31) -> list[int]:
    counts = [0] * n_buckets
    for i in range(len(frame) - 1):
        counts[(frame[i] * mult + frame[i + 1]) % n_buckets] += 1
    return counts


def to_db(
    counts: list[int], amin: float = 1e-10, top_db: float = 80.0
) -> list[float]:
    """design.md:615-623: 20*log10(clamp(c, amin)), floored at max - top_db."""
    db = [20.0 * math.log10(max(c, amin)) for c in counts]
    floor = max(db) - top_db
    return [max(d, floor) for d in db]


def stats(frame: list[int]) -> dict:
    n = len(frame)
    s1 = sum(frame)
    s2 = sum(x * x for x in frame)
    mean = s1 / n
    var = s2 / n - mean * mean
    return {
        "mean": mean,
        "std": math.sqrt(max(var, 0.0)),
        "min": min(frame),
        "max": max(frame),
        "distinct_ratio": len(set(frame)) / n,
    }


def frame_features(
    tokens: list[int], frame_len: int = 16, hop: int = 8
) -> list[dict]:
    n_buckets = frame_len // 2 + 1
    out = []
    for fid, fr in enumerate(frames(tokens, frame_len, hop)):
        out.append(
            {
                "frame_id": fid,
                "frame_tokens": fr,
                "features": to_db(bigram_counts(fr, n_buckets)),
                "stats": stats(fr),
            }
        )
    return out


def reconstruct(frame_list: list[list[int]], frame_len: int, hop: int) -> list[int]:
    """Take-first-occurrence overlap resolution (exact ISTFT analog)."""
    out: list[int] = []
    for fid, fr in enumerate(frame_list):
        start = fid * hop
        for i, v in enumerate(fr):
            pos = start + i
            if pos == len(out):
                out.append(v)
    return out


def backfill(rows: list[tuple], gapless: bool = True) -> list:
    """rows: (entity, ts, seq, value_or_None) -> filled values in input order."""
    order = sorted(range(len(rows)), key=lambda i: (rows[i][0], rows[i][1], rows[i][2]))
    filled = [None] * len(rows)
    last: dict = {}
    for i in order:
        e, _, _, v = rows[i]
        if v is not None:
            last[e] = v
        filled[i] = last.get(e)
    return filled


def sessionize(rows: list[tuple], gap_seconds: float) -> list[int]:
    """rows: (entity, ts_epoch_us, seq) -> session ids in input order."""
    order = sorted(range(len(rows)), key=lambda i: (rows[i][0], rows[i][1], rows[i][2]))
    sess = [0] * len(rows)
    prev: dict = {}
    cur: dict = {}
    gap_us = gap_seconds * 1e6
    for i in order:
        e, t, _ = rows[i]
        if e in prev and t - prev[e] > gap_us:
            cur[e] = cur.get(e, 0) + 1
        else:
            cur.setdefault(e, 0)
        prev[e] = t
        sess[i] = cur[e]
    return sess


def asof(
    probes: list[tuple], states: list[tuple], strict: bool = False
) -> list:
    """probes: (entity, ts); states: (entity, ts, seq, value) ->
    latest state value with ts <= (or <) probe ts, max-seq tie-break."""
    out = []
    for e, t in probes:
        best = None
        for se, st_, seq, v in states:
            if se != e:
                continue
            ok = st_ < t if strict else st_ <= t
            if ok and (best is None or (st_, seq) > (best[0], best[1])):
                best = (st_, seq, v)
        out.append(best[2] if best else None)
    return out
