"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``…). The Ray-side
plumbing — schema, actor-pool stages, batch sizing for large binary rows,
output layout — is real and tested. The codec call is import-guarded:
``resolve_decode_fn`` returns the real PIL decode when PIL is importable
and the deterministic stub otherwise (no image/audio libraries exist in
this environment, so CI exercises the stub branch; the PIL branch is
exercised wherever PIL is installed). Swap in torchaudio/pyAV the same way
for audio/video. Large-binary guidance: keep ``batch_size`` small (payload × batch ×
concurrency must fit the worker heap) and let blocks spill.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ir_base_ray.perf import pool_size


def synth_media_table(n_rows: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media corpus: (media_id, media_type, payload,
    width, height) with opaque pseudo-random payload bytes."""
    rng = np.random.default_rng(seed)
    ids = np.arange(n_rows, dtype=np.int64)
    types = np.array(["image/png", "image/jpeg", "audio/wav"])[rng.integers(0, 3, n_rows)]
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in ids]
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(types.tolist(), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(rng.integers(64, 1920, n_rows), pa.int32()),
        "height": pa.array(rng.integers(64, 1080, n_rows), pa.int32()),
    })


def deterministic_fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: a deterministic 8×8 'thumbnail' derived from payload bytes
    (stands in for a real image decode + resize; replace with
    PIL.Image.open(...).resize(...) in production)."""
    h = hashlib.blake2b(payload, digest_size=64).digest()
    return np.frombuffer(h, dtype=np.uint8).reshape(8, 8).astype(np.float32) / 255.0


def pil_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real image decode via PIL (when importable): decode → grayscale →
    8×8 resize → float32 [0,1] — the same output contract as
    ``deterministic_fake_decode`` so every downstream stage is unchanged."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L").resize((8, 8))
    return np.asarray(img, dtype=np.float32) / 255.0


def resolve_decode_fn():
    """Import-guarded decoder selection: the PIL-backed real decode when PIL
    is importable, the deterministic stub otherwise. The synthetic gate
    corpus (``synth_media_table``) carries opaque pseudo-random payloads
    that no real codec can parse, so gate/bench paths pass the stub
    explicitly; use this resolver when feeding REAL image bytes."""
    try:
        import PIL.Image  # noqa: F401

        return pil_decode
    except ImportError:
        return deterministic_fake_decode


class MediaFeatureActor:
    """Actor-pool stage: decode + feature-extract per media row.
    Real signature: model/codec state loads once in __init__.
    ``decode_fn=None`` resolves via :func:`resolve_decode_fn`."""

    def __init__(self, decode_fn=deterministic_fake_decode):
        self.decode = decode_fn if decode_fn is not None else resolve_decode_fn()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload, w, h in zip(
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
        ):
            thumb = self.decode(payload, w, h)
            feats.append(thumb.mean(axis=0).tolist())  # 8-dim feature
        return pa.table({
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "feature": pa.array(feats, pa.list_(pa.float32())),
            "n_bytes": pa.array(
                [len(p) for p in batch.column("payload").to_pylist()], pa.int64()
            ),
        })


def media_features(ds, *, concurrency=2, batch_size: int = 64,
                   decode_fn=deterministic_fake_decode):
    """media Dataset → decoded feature Dataset. Small batch_size on purpose:
    binary payloads are wide rows. ``decode_fn=None`` auto-selects the real
    PIL decoder when importable (resolve_decode_fn); the default stays the
    deterministic stub because the synthetic gate corpus isn't codec-parseable."""
    return ds.map_batches(
        MediaFeatureActor, batch_format="pyarrow",
        fn_constructor_kwargs={"decode_fn": decode_fn},
        batch_size=batch_size, concurrency=pool_size(concurrency), num_cpus=1,
    )
