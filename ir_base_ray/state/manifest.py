"""Per-partition lineage manifests → resumable index builds (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Each posting partition (hash bucket of (term_id, chunk) groups) is written to
its own directory ``postings/part=K/`` by one task; after a successful write
the builder drops ``manifests/part-K.json`` recording input lineage (row/term
counts, content hash) plus timing metrics. A re-run consults the manifest dir
and filters finished partitions out of the shuffle input, so only missing
partitions are rebuilt (FIXTURES.md invariant 5: kill after partition k,
re-run, byte-identical index).

The reference has no checkpointing at all (SURVEY.md §4) — this is part of
the Ray-native scale design.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifests")


def manifest_path(index_dir: str, part: int) -> str:
    return os.path.join(manifest_dir(index_dir), f"part-{part}.json")


def write_manifest(index_dir: str, part: int, *, rows: int, terms: int,
                   postings: int, content_hash: str, elapsed_s: float) -> None:
    os.makedirs(manifest_dir(index_dir), exist_ok=True)
    payload = {
        "part": part,
        "rows": rows,
        "distinct_terms": terms,
        "postings": postings,
        "content_hash": content_hash,
        "elapsed_s": round(elapsed_s, 4),
        "written_at": time.time(),
    }
    tmp = manifest_path(index_dir, part) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, manifest_path(index_dir, part))


def finished_parts(index_dir: str) -> set[int]:
    d = manifest_dir(index_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("part-") and name.endswith(".json"):
            try:
                with open(os.path.join(d, name)) as f:
                    m = json.load(f)
                out.add(int(m["part"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue
    return out


def content_hash_of(doc_bytes_list) -> str:
    h = hashlib.sha256()
    for b in doc_bytes_list:
        h.update(b)
    return h.hexdigest()[:16]
