"""Source readers / sinks S2-S13 (SURVEY.md §2.1) — the reference's file
formats re-expressed as Ray Data readers (``read_binary_files`` for
file-per-doc formats, ``read_text`` for line formats) and writers.

Readers return Datasets with explicit schemas; all per-file semantics
(label-from-path, line-group parsing, key mappings) are exact transcriptions
of the cited reference methods.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ir_base_ray.functions.textclean import canonicalize_ws, clean_html


# ----------------------------------------------------------------- S2

def load_txt_docs(paths: str | list[str]) -> "ray.data.Dataset":
    """S2 ``DocAnalyzer.java:270-295`` LoadTxtDoc: whole-file UTF-8 read with
    newlines DROPPED (the reference appends readLine() results with no
    separator); y = 1 iff the path contains "pos" else 0. One row per file:
    (path, text, y)."""
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        texts, ys = [], []
        paths_col = batch.column("path").to_pylist()
        for p, b in zip(paths_col, batch.column("bytes").to_pylist()):
            texts.append(bytes(b).decode("utf-8").replace("\r\n", "").replace("\n", ""))
            ys.append(1 if "pos" in p else 0)
        return pa.table({
            "path": pa.array(paths_col, pa.string()),
            "text": pa.array(texts, pa.string()),
            "y": pa.array(ys, pa.int64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


# ----------------------------------------------------------------- S3

def load_json_docs(paths: str | list[str]) -> "ray.data.Dataset":
    """S3 ``DocAnalyzer.java:357-374`` LoadJsonDoc: each file is a JSON object
    with a "Reviews" array; one row per post with text = cleanHTML(content)
    (``_Post.java:58``) and y = 0 if Overall < 4 else 1; a file that fails to
    parse is skipped whole (the reference prints 'X' and returns)."""
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"path": [], "post_id": [], "text": [], "y": []}
        for p, b in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist()):
            try:
                obj = json.loads(bytes(b).decode("utf-8"))
                posts = obj["Reviews"]
            except Exception:
                continue  # 'X': skip unparseable file
            for post in posts:
                try:
                    label = float(post["Overall"])
                    content = clean_html(str(post["Content"])) or ""
                except Exception:
                    continue
                rows["path"].append(p)
                rows["post_id"].append(str(post.get("ReviewID", "")))
                rows["text"].append(content)
                rows["y"].append(0 if label < 4 else 1)
        return pa.table({
            "path": pa.array(rows["path"], pa.string()),
            "post_id": pa.array(rows["post_id"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "y": pa.array(rows["y"], pa.int64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


# ----------------------------------------------------------------- S4

def load_svmlight(paths: str | list[str], length_threshold: int = 0) -> "ray.data.Dataset":
    """S4 ``VctAnalyzer.java:26-91``: svmlight-ish sparse vectors, one doc per
    line: ``y idx:val ... [#itemID-name]`` with 1-based feature indices
    (stored 0-based here, mirroring ``index = Integer.valueOf(entry[0])-1``).
    Lines with ≤ length_threshold space-separated fields are dropped
    (``container.length <= m_lengthThreshold``)."""
    ds = ray.data.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        ys, idxs, vals, items, names = [], [], [], [], []
        for line in batch.column("text").to_pylist():
            container = line.split(" ")
            if len(container) <= length_threshold:
                continue
            y = int(container[0])
            ii, vv, item, name = [], [], "", ""
            for tok in container[1:]:
                if tok.startswith("#"):
                    ent = tok.split("-")
                    item, name = ent[0][1:], ent[1] if len(ent) > 1 else ""
                elif tok:
                    k, v = tok.split(":")
                    ii.append(int(k) - 1)
                    vv.append(float(v))
            ys.append(y)
            idxs.append(ii)
            vals.append(vv)
            items.append(item)
            names.append(name)
        return pa.table({
            "y": pa.array(ys, pa.int64()),
            "indices": pa.array(idxs, pa.list_(pa.int64())),
            "values": pa.array(vals, pa.list_(pa.float64())),
            "item_id": pa.array(items, pa.string()),
            "name": pa.array(names, pa.string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


def save_svmlight(tbl: pa.Table, path: str) -> None:
    """S12 ``structures/_Corpus.java:138-158`` save2File: one line per doc,
    ``y idx:val ...`` with 1-BASED indices and the ``#itemID-name`` comment."""
    with open(path, "w", encoding="utf-8") as f:
        for y, ii, vv, item, name in zip(
            tbl.column("y").to_pylist(), tbl.column("indices").to_pylist(),
            tbl.column("values").to_pylist(), tbl.column("item_id").to_pylist(),
            tbl.column("name").to_pylist(),
        ):
            parts = [str(y)] + [f"{i + 1}:{v:g}" for i, v in zip(ii, vv)]
            if item or name:
                parts.append(f"#{item}-{name}")
            f.write(" ".join(parts) + "\n")


# ----------------------------------------------------------------- S5/S6

def load_user_reviews(paths: str | list[str]) -> "ray.data.Dataset":
    """S5 ``UserAnalyzer.java:160-201`` loadUser (.txt branch): file-per-user;
    first line = user name (skipped); then repeating 5-line groups
    (productID, content, category, ylabel, timestamp). Reviews with
    ylabel == 3 are DROPPED; remaining binarized y = 1 iff ylabel ≥ 4.
    user_id = file basename up to the first '.' (``extractUserID``)."""
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"user_id": [], "product_id": [], "text": [], "category": [],
                "y": [], "ts": []}
        for p, b in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist()):
            lines = bytes(b).decode("utf-8").splitlines()
            user_id = os.path.basename(p).split(".")[0]
            for i in range(1, len(lines) - 4, 5):
                ylabel = int(lines[i + 3])
                if ylabel == 3:
                    continue
                rows["user_id"].append(user_id)
                rows["product_id"].append(lines[i])
                rows["text"].append(lines[i + 1])
                rows["category"].append(lines[i + 2])
                rows["y"].append(1 if ylabel >= 4 else 0)
                rows["ts"].append(int(lines[i + 4]))
        return pa.table({
            "user_id": pa.array(rows["user_id"], pa.string()),
            "product_id": pa.array(rows["product_id"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "category": pa.array(rows["category"], pa.string()),
            "y": pa.array(rows["y"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.int64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


_REVIEW_KEYS = {
    "yelp": ("review_id", "text", "user_id", "business_id", "stars"),
    "amazon": (None, "reviewText", "reviewerID", "asin", "overall"),
}


def load_review_json(paths: str | list[str], source: str = "yelp") -> "ray.data.Dataset":
    """S6 ``MultiThreadedReviewAnalyzer.java:26-60``: json file with a
    "reviews" array, key mapping per source (yelp names reviews by
    review_id; amazon numbers them 0.. per file), text whitespace-collapsed
    exactly as ``:53`` (replaceAll("\\n"," ").trim().replaceAll("\\s+"," "))."""
    keys = _REVIEW_KEYS[source]
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"name": [], "text": [], "user_id": [], "product_id": [], "y": []}
        for b in batch.column("bytes").to_pylist():
            try:
                reviews = json.loads(bytes(b).decode("utf-8"))["reviews"]
            except Exception:
                continue
            num = 0
            for obj in reviews:
                try:
                    name = str(obj[keys[0]]) if keys[0] else str(num)
                    text = canonicalize_ws(str(obj[keys[1]]))
                    user = str(obj[keys[2]])
                    prod = str(obj[keys[3]])
                    y = int(obj[keys[4]])
                except (KeyError, ValueError):
                    continue
                num += 1
                rows["name"].append(name)
                rows["text"].append(text)
                rows["user_id"].append(user)
                rows["product_id"].append(prod)
                rows["y"].append(y)
        return pa.table({
            "name": pa.array(rows["name"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "user_id": pa.array(rows["user_id"], pa.string()),
            "product_id": pa.array(rows["product_id"], pa.string()),
            "y": pa.array(rows["y"], pa.int64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


# ----------------------------------------------------------------- S7

def load_parent_child(parent_paths, child_paths):
    """S7 ``ParentChildAnalyzer.java:34-100``: article JSON
    (name/title/content + sentences[].sentence) and comment JSON linked to a
    parent by name. Returns (parents_ds, children_ds) where children carry
    their parent link; join parent attributes with
    :func:`attach_parents` (broadcast hash join — parent side is small)."""

    def parse_parent(batch: pa.Table) -> pa.Table:
        rows = {"name": [], "title": [], "content": [], "sentences": []}
        for b in batch.column("bytes").to_pylist():
            try:
                obj = json.loads(bytes(b).decode("utf-8"))
            except Exception:
                continue
            rows["name"].append(str(obj.get("name", "")))
            rows["title"].append(str(obj.get("title", "")))
            rows["content"].append(str(obj.get("content", "")))
            rows["sentences"].append(
                [str(s.get("sentence", "")) for s in obj.get("sentences", [])])
        return pa.table({
            "name": pa.array(rows["name"], pa.string()),
            "title": pa.array(rows["title"], pa.string()),
            "content": pa.array(rows["content"], pa.string()),
            "sentences": pa.array(rows["sentences"], pa.list_(pa.string())),
        })

    def parse_child(batch: pa.Table) -> pa.Table:
        rows = {"name": [], "parent": [], "content": []}
        for b in batch.column("bytes").to_pylist():
            try:
                obj = json.loads(bytes(b).decode("utf-8"))
            except Exception:
                continue
            rows["name"].append(str(obj.get("name", "")))
            rows["parent"].append(str(obj.get("parent", "")))
            rows["content"].append(str(obj.get("content", "")))
        return pa.table({
            "name": pa.array(rows["name"], pa.string()),
            "parent": pa.array(rows["parent"], pa.string()),
            "content": pa.array(rows["content"], pa.string()),
        })

    parents = ray.data.read_binary_files(parent_paths, include_paths=True).map_batches(
        parse_parent, batch_format="pyarrow")
    children = ray.data.read_binary_files(child_paths, include_paths=True).map_batches(
        parse_child, batch_format="pyarrow")
    return parents, children


def attach_parents(children_ds, parents_ds):
    """J5: broadcast the (small) parent table once via ``ray.put``; each child
    batch hash-joins locally — children with no live parent are dropped
    (``filterParentAndChildDoc``)."""
    parent_pdf = parents_ds.to_pandas().set_index("name")
    ref = ray.put(parent_pdf)

    def join(batch: pa.Table) -> pa.Table:
        import pandas as pd

        pp = ray.get(ref)
        pdf = batch.to_pandas()
        pdf = pdf[pdf["parent"].isin(pp.index)]
        merged = pdf.join(pp[["title"]], on="parent")
        return pa.Table.from_pandas(
            merged.rename(columns={"title": "parent_title"}), preserve_index=False)

    return children_ds.map_batches(join, batch_format="pyarrow")


# ----------------------------------------------------------------- S8/S10/S11

def save_cv(feature_names: list[str], path: str, *, ngram: int, selection: str,
            start_prob: float, end_prob: float, max_df: int, min_df: int) -> None:
    """S10 ``Analyzer.java:451-469``: vocabulary file with config-header
    comments, exact line formats (``#NGram:%d`` etc., ``%f`` = 6 decimals)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"#NGram:{ngram}\n")
        f.write(f"#Selection:{selection}\n")
        f.write(f"#Start:{start_prob:f}\n")
        f.write(f"#End:{end_prob:f}\n")
        f.write(f"#DF_MaxCut:{max_df}\n")
        f.write(f"#DF_MinCut:{min_df}\n")
        for name in feature_names:
            f.write(name + "\n")


def load_cv(path: str) -> tuple[list[str], dict[str, str]]:
    """S8 ``Analyzer.java:79-105`` LoadCV: '#'-prefixed header lines become
    config entries (``#NGram:2`` restores the n-gram order); the rest is the
    frozen vocabulary in file order."""
    names: list[str] = []
    config: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("#"):
                k, _, v = line[1:].partition(":")
                config[k] = v
            elif line:
                names.append(line)
    return names, config


def save_cv_stat(dict_pdf, path: str) -> dict:
    """S11 ``Analyzer.java:472-520`` SaveCVStat: ``term \\t DF... \\t TTF...``
    per line (single-class here → one DF + one TTF column) and the max/avg
    DF+TTF summary the reference prints."""
    with open(path, "w", encoding="utf-8") as f:
        for term, df, ttf in zip(dict_pdf["term"], dict_pdf["df"], dict_pdf["ttf"]):
            f.write(f"{term}\t{df}\t{ttf}\n")
    df = dict_pdf["df"].to_numpy()
    ttf = dict_pdf["ttf"].to_numpy()
    n = len(dict_pdf)
    return {
        "maxDF": float(df.max()) if n else 0.0,
        "avgDF": float(df.sum()) / n if n else 0.0,
        "maxTTF": float(ttf.max()) if n else 0.0,
        "avgTTF": float(ttf.sum()) / n if n else 0.0,
    }


# ----------------------------------------------------------------- S13

def load_user_weights(paths: str | list[str]) -> "ray.data.Dataset":
    """S13 ``MultiThreadedUserAnalyzer.java:355-386`` loadUserWeights:
    file-per-user dense weight vector (userID from filename, one
    comma-separated line of doubles). Rows: (user_id, weights:list<double>)."""
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        uids, weights = [], []
        for p, b in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist()):
            txt = bytes(b).decode("utf-8").strip()
            if not txt:
                continue
            uids.append(os.path.basename(p).split(".")[0])
            first = txt.splitlines()[0]
            sep = "," if "," in first else None
            weights.append([float(x) for x in (first.split(sep) if sep else first.split())])
        return pa.table({
            "user_id": pa.array(uids, pa.string()),
            "weights": pa.array(weights, pa.list_(pa.float64())),
        })

    return ds.map_batches(parse, batch_format="pyarrow")
