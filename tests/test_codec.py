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
