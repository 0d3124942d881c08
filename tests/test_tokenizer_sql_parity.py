"""Property test: analyze_simple == the DuckDB tokens CTE for arbitrary
text — the equivalence every oracle value-hash rests on."""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ir_base_ray.functions.analyzer import analyze_simple
from ir_base_ray.pipelines.ops import _TOKENS_CTE

_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("Lu", "Ll", "Nd", "Po", "Zs", "Sm", "Pc")),
    max_size=120)


@settings(max_examples=60, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_simple_tokenizer_matches_sql(texts):
    con = duckdb.connect()
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con.register("documents", df)
    got = con.execute(
        _TOKENS_CTE + "SELECT doc_id, term FROM toks ORDER BY doc_id"
    ).fetchdf()
    sql_tokens = {}
    for r in got.itertuples():
        sql_tokens.setdefault(int(r.doc_id), []).append(r.term)
    for i, t in enumerate(texts):
        py = analyze_simple(t or "")
        assert sorted(py) == sorted(sql_tokens.get(i, [])), (t, py)
    con.close()
