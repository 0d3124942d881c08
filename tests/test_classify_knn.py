"""KNN LSH classifier pins (Classifier/supervised/KNN.java)."""

import numpy as np
import pandas as pd

import ray.data as rd

from ir_base_ray.pipelines.classify import knn_lsh_classify


def _world(F=16, n=80, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(n):
        cls = d % 2
        vocab = np.arange(8) + 8 * cls      # class-disjoint vocabularies
        t = np.sort(rng.choice(vocab, size=4, replace=False))
        rows.append({"doc_id": d, "tids": t.astype(np.int64).tolist(),
                     "vals": [1.0] * 4, "label": cls})
    return pd.DataFrame(rows)


def test_knn_lsh_classifier(ray_session):
    """Class-disjoint vocabularies: bucket hashing + dot-product vote must
    recover the class; deterministic; small-bucket fallback works."""
    df = _world()
    train = df[df["doc_id"] % 2 == 0].reset_index(drop=True)
    # train docs are all class 0 under d%2... use a proper split instead
    train = df.iloc[:60].reset_index(drop=True)
    test = rd.from_pandas(df.iloc[60:].reset_index(drop=True))
    out = knn_lsh_classify(train, test, n_features=16, classes=[0, 1],
                           k=5, n_planes=4).to_pandas()
    truth = df.iloc[60:].set_index("doc_id")["label"]
    acc = (out.set_index("doc_id")["pred"] == truth).mean()
    # a sparse-bucket regime leaves some votes to zero-sim bucket-mates
    # (faithful to the reference's bucket-only candidate set)
    assert acc >= 0.8, acc
    out2 = knn_lsh_classify(train, test, n_features=16, classes=[0, 1],
                            k=5, n_planes=4).to_pandas()
    assert out.sort_values("doc_id")["pred"].tolist() == \
        out2.sort_values("doc_id")["pred"].tolist()
    # n_planes large => tiny buckets => whole-train fallback still sane
    out3 = knn_lsh_classify(train, test, n_features=16, classes=[0, 1],
                            k=5, n_planes=14).to_pandas()
    acc3 = (out3.set_index("doc_id")["pred"] == truth).mean()
    assert acc3 >= 0.95, acc3
