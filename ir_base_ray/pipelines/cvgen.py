"""Controlled-vocabulary generation — the ``mains/CVGeneration.java`` (and
``mains/featureGeneration``-style) standalone flow, composed from the
existing distributed stages:

    corpus → analyzer term counts (one ``map_batches`` pass producing BOTH
    the per-(class, term) DF partials and the global (term, df, ttf)
    partials) → two vocabulary-sized groupby-sums → driver-side selector
    scoring (F1–F4, ``Analyzer/FeatureSelector.java``) → proportional band
    (``FeatureSelector.java:47-61``) or top-K (``Analyzer.java:354-448``)
    select → ``SaveCV`` + ``SaveCVStat`` files.

Reference flow transcribed from ``mains/CVGeneration.java``: load corpus →
``getFeatureStat`` → ``featureSelection(fvFile, method, startProb, endProb,
maxDF, minDF)`` → ``SaveCVStat(fvStatFile)``; the stat file covers the
SELECTED features only, in selection order (``Analyzer.java SaveCVStat``
iterates ``m_featureNames``).

Scale notes: the token stream never shuffles — per-batch Counter partials
make both groupbys vocabulary-sized (the A1 combiner pattern); only the
scored vocabulary (terms × classes, ~10⁶ rows) reaches the driver, which is
exactly the size of the artifact being written. The output CV file is
consumable by the frozen-vocab analyzer mode (``analyze_dataset(...,
vocab_ref=)``, S8/J1 OOV-drop semantics) — pytest-pinned.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ir_base_ray.sources.loaders import load_cv, save_cv, save_cv_stat
from ir_base_ray.stages.featsel import (chi_scores, df_scores, ig_scores,
                                        mi_scores, proportional_select,
                                        top_k_select)

_METHODS = ("DF", "IG", "MI", "CHI")


def corpus_feature_stats(docs_ds, *, text_col: str = "text",
                         label_col: str | None = "lang", analyze=None):
    """One distributed pass over the corpus → (stats pdf: term, df, ttf;
    per_class pdf: class, term, df_c — empty when ``label_col`` is None;
    class_counts dict). ``analyze`` maps text → token list (default
    ``analyze_simple``, the SQL-parity tokenizer)."""
    from ray.data.aggregate import Count, Sum

    if analyze is None:
        from ir_base_ray.functions.analyzer import analyze_simple as analyze

    def partial(batch: pa.Table) -> pa.Table:
        df_acc: Counter = Counter()
        ttf_acc: Counter = Counter()
        cls_acc: Counter = Counter()
        labels = (batch.column(label_col).to_pylist()
                  if label_col else [None] * batch.num_rows)
        for lab, t in zip(labels, batch.column(text_col).to_pylist()):
            toks = analyze(t or "")
            for term in toks:
                ttf_acc[term] += 1
            for term in set(toks):
                df_acc[term] += 1
                if label_col:
                    cls_acc[(lab, term)] += 1
        terms = sorted(df_acc)
        cls_keys = sorted(cls_acc)
        # per-class rows ride along with a non-empty class column; global
        # rows use class='' (labels are non-empty strings) — one pass,
        # one downstream groupby for both
        return pa.table({
            "class": pa.array([""] * len(terms)
                              + [str(k[0]) for k in cls_keys], pa.string()),
            "term": pa.array(terms + [k[1] for k in cls_keys], pa.string()),
            "df_part": pa.array([df_acc[t] for t in terms]
                                + [cls_acc[k] for k in cls_keys], pa.int64()),
            "ttf_part": pa.array([ttf_acc[t] for t in terms]
                                 + [0] * len(cls_keys), pa.int64()),
        })

    agg = (docs_ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["class", "term"])
           .aggregate(Sum("df_part", alias_name="df"),
                      Sum("ttf_part", alias_name="ttf"))
           .to_pandas())
    stats = (agg[agg["class"] == ""][["term", "df", "ttf"]]
             .sort_values("term").reset_index(drop=True))
    per_class = (agg[agg["class"] != ""]
                 .rename(columns={"df": "df_c"})[["class", "term", "df_c"]]
                 .reset_index(drop=True))
    class_counts: dict = {}
    if label_col:
        counts = (docs_ds.groupby(label_col)
                  .aggregate(Count(alias_name="n")).to_pandas())
        class_counts = dict(zip(counts[label_col].astype(str),
                                counts["n"].astype(int)))
    return stats, per_class, class_counts


def cv_generation(docs_ds, fv_path: str, fv_stat_path: str | None = None, *,
                  method: str = "IG", start_prob: float = 0.1,
                  end_prob: float = 0.4, max_df: int = 9000, min_df: int = 90,
                  top_k: int | None = None, text_col: str = "text",
                  label_col: str | None = "lang", ngram: int = 1,
                  analyze=None) -> dict:
    """``mains/CVGeneration.java``: select a controlled vocabulary and write
    the ``fv_*`` + ``fv_stat_*`` files. ``top_k`` switches the band select
    to the reference's top-K overload (``Analyzer.java:354-448``). Returns
    {features, summary} (summary = SaveCVStat's max/avg DF+TTF report, A9)."""
    method = method.upper()
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method!r}")
    if method != "DF" and not label_col:
        raise ValueError(f"{method} needs class labels (label_col)")

    stats, per_class, class_counts = corpus_feature_stats(
        docs_ds, text_col=text_col, label_col=label_col, analyze=analyze)

    if method == "DF":
        scored = df_scores(stats, min_df, max_df)
    elif method == "IG":
        scored = ig_scores(per_class, class_counts, min_df, max_df)
    elif method == "MI":
        scored = mi_scores(per_class, class_counts, min_df, max_df)
    else:
        scored = chi_scores(per_class, class_counts, min_df, max_df)

    if top_k is not None:
        features = top_k_select(scored, top_k)
        start_prob, end_prob = 0.0, 1.0  # the top-K overload's header values
    else:
        features = proportional_select(scored, start_prob, end_prob)

    save_cv(features, fv_path, ngram=ngram, selection=method,
            start_prob=start_prob, end_prob=end_prob,
            max_df=max_df, min_df=min_df)

    summary = {}
    if fv_stat_path:
        # SaveCVStat covers the SELECTED features in selection order
        sel = (pd.DataFrame({"term": features})
               .merge(stats, on="term", how="left")
               .fillna({"df": 0, "ttf": 0}))
        sel["df"] = sel["df"].astype(np.int64)
        sel["ttf"] = sel["ttf"].astype(np.int64)
        summary = save_cv_stat(sel, fv_stat_path)
    return {"features": features, "summary": summary}


def main(argv=None):
    """CLI: ``python -m ir_base_ray.pipelines.cvgen <parquet-or-dir> fv.txt
    [--stat fv_stat.txt] [--method IG] [--start 0.1] [--end 0.4]
    [--max-df 9000] [--min-df 90] [--top-k K] [--label-col lang]``."""
    import argparse

    p = argparse.ArgumentParser(description="Controlled-vocabulary generation "
                                "(mains/CVGeneration.java equivalent)")
    p.add_argument("input", help="parquet file/dir with text (+ label) cols")
    p.add_argument("fv_path")
    p.add_argument("--stat", default=None)
    p.add_argument("--method", default="IG", choices=_METHODS)
    p.add_argument("--start", type=float, default=0.1)
    p.add_argument("--end", type=float, default=0.4)
    p.add_argument("--max-df", type=int, default=9000)
    p.add_argument("--min-df", type=int, default=90)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--text-col", default="text")
    p.add_argument("--label-col", default="lang")
    p.add_argument("--ngram", type=int, default=1)
    args = p.parse_args(argv)

    if not ray.is_initialized():  # scripts own their session; library must not
        ray.init(address="local", include_dashboard=False)
    cols = [args.text_col] + ([args.label_col] if args.label_col else [])
    ds = ray.data.read_parquet(args.input, columns=cols)
    out = cv_generation(ds, args.fv_path, args.stat, method=args.method,
                        start_prob=args.start, end_prob=args.end,
                        max_df=args.max_df, min_df=args.min_df,
                        top_k=args.top_k, text_col=args.text_col,
                        label_col=args.label_col or None, ngram=args.ngram)
    print(f"{len(out['features'])} features are selected!")
    if out["summary"]:
        print(out["summary"])


if __name__ == "__main__":
    main()
