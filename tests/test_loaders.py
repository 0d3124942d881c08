"""S2-S13 source readers / sinks vs deterministic synthetic fixtures
(fixture formats transcribed from the cited reference methods)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest


@pytest.fixture()
def fixture_dir(tmp_path):
    # S2: file-per-doc txt with pos/neg in path
    (tmp_path / "txt" / "pos").mkdir(parents=True)
    (tmp_path / "txt" / "neg").mkdir(parents=True)
    (tmp_path / "txt" / "pos" / "cv0_1.txt").write_text("great movie\nloved it")
    (tmp_path / "txt" / "neg" / "cv0_2.txt").write_text("terrible\nfilm")

    # S3: Reviews json
    (tmp_path / "json").mkdir()
    (tmp_path / "json" / "prod1.json").write_text(json.dumps({
        "Reviews": [
            {"ReviewID": "r1", "Overall": "5.0", "Content": "good <!-- ad --> stuff"},
            {"ReviewID": "r2", "Overall": "2.0", "Content": "bad stuff"},
            {"ReviewID": "r3", "Overall": "None", "Content": "x"},  # unparseable label
        ]
    }))
    (tmp_path / "json" / "broken.json").write_text("{not json")

    # S4: svmlight
    (tmp_path / "vct.dat").write_text(
        "1 1:2.0 3:1.5 #item7-docA\n"
        "0 2:1.0\n"
    )

    # S5: 5-line user reviews
    (tmp_path / "users").mkdir()
    (tmp_path / "users" / "u42.txt").write_text(
        "User FortyTwo\n"
        "prodA\nnice product works\ncatX\n5\n1700000000\n"
        "prodB\nmeh\ncatY\n3\n1700000100\n"      # ylabel 3 -> dropped
        "prodC\nawful thing\ncatZ\n1\n1700000200\n"
    )

    # S6: yelp-style review json
    (tmp_path / "yelp.json").write_text(json.dumps({
        "reviews": [
            {"review_id": "a1", "text": "Tasty\n\n  food  here", "user_id": "u1",
             "business_id": "b1", "stars": 4},
            {"review_id": "a2", "text": "ok", "user_id": "u2", "business_id": "b2",
             "stars": 2},
        ]
    }))

    # S7: parent/child
    (tmp_path / "parents").mkdir()
    (tmp_path / "children").mkdir()
    (tmp_path / "parents" / "p1.json").write_text(json.dumps({
        "name": "art1", "title": "Title One", "content": "body",
        "sentences": [{"sentence": "s1."}, {"sentence": "s2."}]}))
    (tmp_path / "children" / "c1.json").write_text(json.dumps({
        "name": "cmt1", "parent": "art1", "content": "a comment"}))
    (tmp_path / "children" / "c2.json").write_text(json.dumps({
        "name": "cmt2", "parent": "missing", "content": "orphan"}))

    # S13: user weight files
    (tmp_path / "weights").mkdir()
    (tmp_path / "weights" / "u42.txt").write_text("0.5,1.25,-3.0")
    return tmp_path


def test_load_txt_docs(ray_session, fixture_dir):
    from ir_base_ray.sources.loaders import load_txt_docs

    pdf = load_txt_docs(str(fixture_dir / "txt")).to_pandas().sort_values("path")
    assert list(pdf["y"]) == [0, 1]
    # newlines dropped with NO separator (readLine concatenation)
    assert pdf[pdf["y"] == 1]["text"].iloc[0] == "great movieloved it"


def test_load_json_docs(ray_session, fixture_dir):
    from ir_base_ray.sources.loaders import load_json_docs

    pdf = load_json_docs(str(fixture_dir / "json")).to_pandas().sort_values("post_id")
    # broken file skipped whole; "None" label post skipped
    assert list(pdf["post_id"]) == ["r1", "r2"]
    assert list(pdf["y"]) == [1, 0]
    assert pdf["text"].iloc[0] == "good stuff"  # comment stripped, trims per cleanHTML


def test_svmlight_roundtrip(ray_session, fixture_dir):
    from ir_base_ray.sources.loaders import load_svmlight, save_svmlight

    ds = load_svmlight(str(fixture_dir / "vct.dat"))
    tbl = pa.Table.from_pandas(ds.to_pandas().sort_values("y", ascending=False),
                               preserve_index=False)
    assert tbl.column("indices").to_pylist() == [[0, 2], [1]]  # 1-based -> 0-based
    assert tbl.column("item_id").to_pylist() == ["item7", ""]
    out = os.path.join(str(fixture_dir), "rt.dat")
    save_svmlight(tbl, out)
    txt = open(out).read()
    assert "1 1:2 3:1.5 #item7-docA" in txt  # 1-based again on write


def test_load_user_reviews(ray_session, fixture_dir):
    from ir_base_ray.sources.loaders import load_user_reviews

    pdf = load_user_reviews(str(fixture_dir / "users")).to_pandas().sort_values("ts")
    assert list(pdf["product_id"]) == ["prodA", "prodC"]  # ylabel==3 dropped
    assert list(pdf["y"]) == [1, 0]
    assert pdf["user_id"].iloc[0] == "u42"


def test_load_review_json(ray_session, fixture_dir):
    from ir_base_ray.sources.loaders import load_review_json

    pdf = load_review_json(str(fixture_dir / "yelp.json"), source="yelp").to_pandas()
    pdf = pdf.sort_values("name")
    assert pdf["text"].iloc[0] == "Tasty food here"  # ws canonicalized (:53)
    assert list(pdf["y"]) == [4, 2]


def test_parent_child_join(ray_session, fixture_dir):
    from ir_base_ray.sources.loaders import attach_parents, load_parent_child

    parents, children = load_parent_child(str(fixture_dir / "parents"),
                                          str(fixture_dir / "children"))
    ppdf = parents.to_pandas()
    assert list(ppdf["sentences"].iloc[0]) == ["s1.", "s2."]
    joined = attach_parents(children, parents).to_pandas()
    assert list(joined["name"]) == ["cmt1"]  # orphan dropped (filterParentAndChildDoc)
    assert joined["parent_title"].iloc[0] == "Title One"


def test_cv_save_load_roundtrip(tmp_path):
    from ir_base_ray.sources.loaders import load_cv, save_cv

    path = str(tmp_path / "cv.txt")
    save_cv(["alpha", "beta"], path, ngram=2, selection="CHI",
            start_prob=0.5, end_prob=0.999, max_df=10**8, min_df=5)
    names, config = load_cv(path)
    assert names == ["alpha", "beta"]
    assert config["NGram"] == "2" and config["Selection"] == "CHI"
    assert config["Start"] == "0.500000"  # Java %f fixed 6 decimals


def test_save_cv_stat(tmp_path):
    import pandas as pd

    from ir_base_ray.sources.loaders import save_cv_stat

    pdf = pd.DataFrame({"term": ["a", "b"], "df": [3, 1], "ttf": [7, 2]})
    path = str(tmp_path / "stat.txt")
    summary = save_cv_stat(pdf, path)
    assert open(path).read() == "a\t3\t7\nb\t1\t2\n"
    assert summary == {"maxDF": 3.0, "avgDF": 2.0, "maxTTF": 7.0, "avgTTF": 4.5}


def test_load_user_weights(ray_session, fixture_dir):
    from ir_base_ray.sources.loaders import load_user_weights

    pdf = load_user_weights(str(fixture_dir / "weights")).to_pandas()
    assert pdf["user_id"].iloc[0] == "u42"
    assert list(pdf["weights"].iloc[0]) == [0.5, 1.25, -3.0]
