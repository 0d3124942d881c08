"""BoundedTopK parity vs golden traces generated from the reference's
MyPriorityQueue (structures/MyPriorityQueue.java:40-74) run on tie-heavy
random sequences (seed 42) — exact order including tie placement."""

import os
import re

from ir_base_ray.functions.topk import BoundedTopK


def test_golden_traces(golden_dir):
    bad = []
    with open(os.path.join(golden_dir, "topk_traces.txt")) as f:
        for line in f:
            m = re.match(r"T (\d+) k=(\d+) in=(\S*) out=(\S*)", line)
            if not m:
                continue
            k = int(m.group(2))
            pairs = [p for p in m.group(3).split(",") if p]
            expected = [p for p in m.group(4).split(",") if p]
            q = BoundedTopK(k)
            for p in pairs:
                i, v = p.split(":")
                q.add(float(v), int(i))
            got = [f"{payload}:{int(score)}" for score, payload in q.result()]
            if got != expected:
                bad.append(m.group(1))
    assert not bad, f"trace mismatches in trials {bad[:5]}"


def test_incumbent_wins_ties():
    q = BoundedTopK(2)
    q.add(1.0, "a")
    q.add(1.0, "b")
    assert not q.add(1.0, "c")  # full, tie -> rejected
    # equal-score insert lands BEFORE the probed equal element (find() returns
    # mid on equality), so "b" sits ahead of "a" — matches the Java vector
    assert [p for _, p in q.result()] == ["b", "a"]


def test_threshold():
    q = BoundedTopK(2)
    assert q.threshold == float("-inf")
    q.add(3.0, 1)
    q.add(5.0, 2)
    assert q.threshold == 3.0
    q.add(4.0, 3)
    assert q.threshold == 4.0
    assert [p for _, p in q.result()] == [2, 3]
