"""Deduplication operators for large-scale training-data pipelines.

The reference has no document dedup (SURVEY.md §2.9) — these are the
Ray-native additions a 100 TB web-corpus pipeline needs. All operators follow
the same scale shape: per-batch vectorized signature computation inside
``map_batches`` (zero driver involvement), then a single keyed
groupby/aggregate shuffle over the much smaller signature stream.

- exact_dedup:      content hash → hash-partitioned first-wins survivor pick
- ngram_shingles:   char/word shingle sets (basis for Jaccard/MinHash)
- minhash_lsh:      k permutations → b bands → bucket groupby → candidate
                    pairs → exact Jaccard verify
- simhash:          64-bit hyperplane-free simhash over token hashes;
                    near-dup iff hamming distance ≤ t (banded lookup)
- embedding near-dup: cosine over normalized embedding vectors (see ann.py)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ir_base_ray.perf import pool_size


# ---------------------------------------------------------------- exact dedup

def add_content_hash(ds, text_col: str = "text", out_cols=("hash_hi", "hash_lo")):
    """Full 128-bit md5 content identity per row as two uint64 columns —
    one batched C kernel call per Arrow batch straight off the string
    buffers (``functions/ckernels.md5_hash128_strings``; hashlib fallback),
    collision-safe at 10^12 docs where a 64-bit prefix is not. Fixed 16
    bytes/row enter the downstream shuffle instead of a 40-char hexdigest.
    Halves are bit-cast to int64 (Ray's groupby materializes uint64 keys
    through Python ints, which overflow past 2^63 and fall back to pickled
    object blocks — int64 keys stay native Arrow end to end)."""
    from ir_base_ray.functions.ckernels import md5_hash128_strings

    hi_col, lo_col = out_cols

    def hash_batch(batch: pa.Table) -> pa.Table:
        hi, lo = md5_hash128_strings(batch.column(text_col))
        return (batch.append_column(hi_col, pa.array(hi.view(np.int64), pa.int64()))
                     .append_column(lo_col, pa.array(lo.view(np.int64), pa.int64())))

    return ds.map_batches(hash_batch, batch_format="pyarrow")


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the smallest id per identical text (hash-partitioned shuffle on
    the 128-bit content hash; survivor rule = min id, deterministic)."""
    from ray.data.aggregate import Count, Min

    hashed = add_content_hash(ds, text_col).select_columns(
        [id_col, "hash_hi", "hash_lo"])
    return (
        hashed.groupby(["hash_hi", "hash_lo"])
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_dups"))
        .select_columns([id_col, "n_dups"])
    )


# ------------------------------------------------------------------- shingles

def _word_shingles(tokens: list[str], n: int) -> set[str]:
    if len(tokens) < n:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


# --------------------------------------------------------------- minhash LSH

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(shingles: set[str]) -> np.ndarray:
    """First 8 bytes (big-endian) of md5 per shingle. md5 — not blake2b — so
    the DuckDB SQL oracle can mirror the hash bit-exactly:
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT``. Hashing runs through the
    batched C MD5 kernel (functions/ckernels.py; hashlib-loop fallback)."""
    from ir_base_ray.functions.ckernels import md5_prefix64_strings

    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return md5_prefix64_strings(list(shingles))


def _minhash_sig(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x + b) mod M minwise over shingle hashes, per permutation."""
    if hashes.size == 0:
        return np.full(a.shape, np.uint64(_MERSENNE), dtype=np.uint64)
    # (num_perm, n_shingles) — modmul in python ints would be slow; 64-bit
    # wraparound is fine for minwise consistency as long as it's deterministic
    prod = hashes[None, :] * a[:, None] + b[:, None]
    return prod.min(axis=1)


class MinHashActor:
    """Stateful stage: permutation params + tokenizer built once per actor."""

    def __init__(self, num_perm: int = 64, shingle_n: int = 3, seed: int = 7,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.a, self.b = _minhash_params(num_perm, seed)
        self.shingle_n = shingle_n
        self.id_col = id_col
        self.text_col = text_col
        self._scratch: np.ndarray | None = None  # grow-only per-actor buffer

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Fully vectorized signature pass, value-identical to the per-doc
        ``_word_shingles`` walk: Arrow splits the batch to tokens once;
        shingle STRINGS for docs with ≥ n tokens are built in Arrow C++ as
        ``binary_join_element_wise`` over n shifted slices of the flat token
        column (window duplicates don't move a minwise min, so the per-doc
        set() dedup is dropped); docs with 1..n-1 tokens contribute their
        single joined-tokens shingle (``_word_shingles`` short-doc rule);
        one batched C MD5 call hashes everything; the per-permutation
        minwise reduce runs in the C kernel over per-doc segments
        (numpy scratch-loop fallback). Docs with no tokens keep the
        ``_MERSENNE`` sentinel row."""
        import pyarrow.compute as pc

        from ir_base_ray.functions.ckernels import (
            md5_prefix64_strings,
            minhash_kernel,
        )

        texts = batch.column(self.text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        n_docs = len(lists)
        num_perm = self.a.size
        n = self.shingle_n
        cnt_raw = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        flat_raw = lists.flatten()
        # Python ``str.split()`` drops the empty EDGE chunks Arrow keeps
        # (empty / leading / trailing whitespace): filter them and recount
        nonempty = pc.not_equal(flat_raw, "")
        flat = flat_raw.filter(nonempty)
        ne = nonempty.to_numpy(zero_copy_only=False)
        doc_of_pos = np.repeat(np.arange(n_docs, dtype=np.int64), cnt_raw)
        cnt = np.bincount(doc_of_pos[ne], minlength=n_docs).astype(np.int64)
        offs = np.zeros(n_docs + 1, np.int64)
        np.cumsum(cnt, out=offs[1:])
        F = len(flat)

        sigs = np.full((n_docs, num_perm), np.uint64(_MERSENNE), dtype=np.uint64)

        # docs with >= n tokens: all n-token windows of the flat column,
        # then keep the within-doc ones (each doc owns windows
        # [start, start + cnt - n]); cross-doc windows are dropped
        big = cnt >= n
        if F >= n and big.any():
            slices = [flat.slice(k, F - n + 1) for k in range(n)]
            windows = (pc.binary_join_element_wise(*slices, " ")
                       if n > 1 else flat)
            k_big = cnt[big] - n + 1
            starts = offs[:-1][big]
            total = int(k_big.sum())
            # segmented arange: valid window indices, doc-major
            seg_end = np.cumsum(k_big)
            idx = np.arange(total, dtype=np.int64) - np.repeat(seg_end - k_big, k_big)
            idx += np.repeat(starts, k_big)
            shingles = pc.take(windows, pa.array(idx, pa.int64()))
            hashes = md5_prefix64_strings(shingles)
            bounds = np.zeros(len(k_big) + 1, np.int64)
            np.cumsum(k_big, out=bounds[1:])
            lib = minhash_kernel()
            big_sigs = np.empty((len(k_big), num_perm), np.uint64)
            if lib is not None:
                import ctypes

                u64p = lambda a_: a_.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
                lib.minhash_sigs(
                    u64p(hashes),
                    bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    len(k_big), u64p(self.a), u64p(self.b), num_perm,
                    u64p(big_sigs))
            else:
                max_seg = int(k_big.max())
                if self._scratch is None or self._scratch.shape[0] < max_seg:
                    self._scratch = np.empty((max_seg, num_perm), dtype=np.uint64)
                buf = self._scratch
                for d in range(len(k_big)):
                    s, e = bounds[d], bounds[d + 1]
                    v = buf[:e - s]
                    np.multiply(hashes[s:e, None], self.a[None, :], out=v)
                    v += self.b[None, :]    # uint64 wraparound == mod 2^64
                    big_sigs[d] = v.min(axis=0)
            sigs[big] = big_sigs

        # docs with 1..n-1 tokens: ONE shingle = all tokens joined
        short = (cnt > 0) & ~big
        if short.any():
            short_idx = np.flatnonzero(short)
            joined = [" ".join(flat[offs[d]:offs[d + 1]].to_pylist())
                      for d in short_idx]
            h = md5_prefix64_strings(pa.array(joined, pa.string()))
            sigs[short_idx] = (h[:, None] * self.a[None, :]) + self.b[None, :]

        sig_offs = pa.array(np.arange(0, (n_docs + 1) * num_perm, num_perm,
                                      dtype=np.int32), pa.int32())
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "sig": pa.ListArray.from_arrays(
                sig_offs, pa.array(sigs.ravel(), pa.uint64())),
        })


# Band-key polynomial base: key = Σ_j v_j · K^j (mod 2^64) over the band's
# signature values. K^(width-1)·2^64 must fit signed int128 so the DuckDB
# oracle can mirror the fold exactly in HUGEINT (K^4 ≈ 2^61.3 still safe);
# both engines compute identical key values, so bucketing — including any
# astronomically-unlikely collision — is identical. Replaces the '-'-joined
# decimal-string key: same bucket equivalence, ~10× smaller shuffle rows and
# a fixed-width groupby key.
_BAND_K = np.uint64(40503)


def band_keys(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures → (n_docs, num_bands) uint64
    band keys via the K-polynomial fold in uint64 wraparound (== mod 2^64)."""
    n, num_perm = sigs.shape
    rows_per = num_perm // num_bands
    pows = np.power(_BAND_K, np.arange(rows_per, dtype=np.uint64))
    return (sigs.reshape(n, num_bands, rows_per) * pows[None, None, :]) \
        .sum(axis=2, dtype=np.uint64)


def minhash_bands(sig_ds, *, num_bands: int, id_col: str = "doc_id"):
    """signatures → exploded (band_id, band_hash, doc_id) rows for the LSH
    bucket groupby."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_numpy())
        sig_col = batch.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        flat = sig_col.flatten().to_numpy(zero_copy_only=False)
        sigs = np.ascontiguousarray(flat.astype(np.uint64)).reshape(len(ids), -1)
        keys = band_keys(sigs, num_bands)
        n = len(ids)
        return pa.table({
            id_col: pa.array(np.repeat(ids, num_bands), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(num_bands, dtype=np.int64), n),
                                pa.int64()),
            "band_hash": pa.array(keys.ravel().view(np.int64), pa.int64()),
        })

    return sig_ds.map_batches(explode, batch_format="pyarrow")


def minhash_candidate_pairs(band_ds, id_col: str = "doc_id",
                            hot_bucket_broadcast_max: int = 5_000_000):
    """LSH buckets → unique candidate (id_a < id_b) pairs.

    Nearly every bucket holds exactly one doc (non-duplicates), and
    ``map_groups`` pays per-group Python/pandas overhead, so the pipeline
    first COUNTS bucket occupancy with a vectorized hash aggregate, keeps
    only ≥2-member buckets (broadcast as a set — bounded by the duplicate
    bucket count), filters the band rows to those buckets inside
    ``map_batches``, and runs the pair expansion on the survivors alone —
    measured 6.4 s → ~1 s on 80k buckets / 5k docs. Above
    ``hot_bucket_broadcast_max`` hot buckets the filter is skipped and the
    full groupby path runs (no broadcast blowup)."""
    import ray
    from ray.data.aggregate import Count

    band_ds = band_ds.materialize()
    counts = band_ds.groupby(["band_id", "band_hash"]).aggregate(
        Count(alias_name="n"))
    hot = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), 2)),
        batch_format="pyarrow").to_pandas()
    if 0 < len(hot) <= hot_bucket_broadcast_max:
        # vectorized membership on a combined (hash, band) key: a collision
        # in the combined key can only KEEP extra rows (superset filter) —
        # the exact (band_id, band_hash) groupby below still produces
        # singleton groups for them, so no false pairs are possible
        if np.issubdtype(hot["band_hash"].dtype, np.number):
            hot_keys = (hot["band_hash"].to_numpy().view(np.uint64)
                        + hot["band_id"].to_numpy().view(np.uint64))
        else:  # string band keys (legacy callers): hash to u64 first
            hot_keys = (pd.util.hash_array(hot["band_hash"].to_numpy())
                        + hot["band_id"].to_numpy().view(np.uint64))
        hot_ref = ray.put(np.sort(hot_keys))

        def keep_hot(batch: pa.Table) -> pa.Table:
            keys = ray.get(hot_ref)
            bid = batch.column("band_id").to_numpy(zero_copy_only=False) \
                .astype(np.int64).view(np.uint64)
            bh = batch.column("band_hash")
            if pa.types.is_integer(bh.type):
                comb = bh.to_numpy(zero_copy_only=False).astype(np.int64) \
                    .view(np.uint64) + bid
            else:
                comb = pd.util.hash_array(
                    bh.to_numpy(zero_copy_only=False)) + bid
            idx = np.searchsorted(keys, comb)
            idx[idx >= keys.size] = 0
            mask = keys[idx] == comb
            return batch.filter(pa.array(mask))

        band_ds = band_ds.map_batches(keep_hot, batch_format="pyarrow")
    elif len(hot) == 0:
        import pandas as _pd

        return ray.data.from_pandas(
            _pd.DataFrame({"id_a": _pd.Series([], dtype="int64"),
                           "id_b": _pd.Series([], dtype="int64"),
                           "n_buckets": _pd.Series([], dtype="int64")}))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group[id_col].unique().tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"id_a": a, "id_b": b})

    cand = band_ds.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")
    return cand.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_buckets"))


def minhash_lsh_dedup(ds, *, num_perm: int = 64, num_bands: int = 16,
                      shingle_n: int = 3, threshold: float = 0.7,
                      id_col: str = "doc_id", text_col: str = "text",
                      concurrency=4, num_partitions: int = 8):
    """Full MinHash-LSH near-dup pipeline:
    shingle→minhash (actor pool) → band explode → bucket groupby → candidate
    pairs → exact Jaccard verification. The verify stage is fully
    distributed: candidate pairs hash-join back to the corpus texts on id_a
    then id_b (``Dataset.join``, shuffle keyed by doc id — no corpus-sized
    data ever reaches the driver), and the exact re-shingle + Jaccard runs
    inside ``map_batches`` over the joined pairs.

    Returns a Dataset of (id_a, id_b, jaccard) with jaccard >= threshold.
    """
    sig_ds = ds.map_batches(
        MinHashActor,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n,
                               "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", concurrency=pool_size(concurrency), num_cpus=1,
    )
    cand = minhash_candidate_pairs(minhash_bands(sig_ds, num_bands=num_bands,
                                                 id_col=id_col)).materialize()
    texts_ds = ds.select_columns([id_col, text_col])

    def verify_pair(id_a, id_b, ta, tb, out_a, out_b, ja):
        j = jaccard(_word_shingles((ta or "").split(), shingle_n),
                    _word_shingles((tb or "").split(), shingle_n))
        if j >= threshold:
            out_a.append(int(id_a))
            out_b.append(int(id_b))
            ja.append(j)

    # Small-candidate fast path: broadcast the candidate ID SET (ids only —
    # never texts — cross the driver), semi-join the corpus down to the
    # candidates' rows inside map_batches, broadcast that small (id, text)
    # table, and verify distributed. Above the threshold: two full hash
    # joins back to the corpus (shuffle keyed by doc id).
    import ray

    if cand.count() <= 100_000:
        ids_pdf = cand.to_pandas()
        if len(ids_pdf) == 0:
            return ray.data.from_items([])
        need = np.union1d(ids_pdf["id_a"].to_numpy(), ids_pdf["id_b"].to_numpy())
        need_ref = ray.put(need)

        def keep_cands(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy()
            mask = np.isin(ids, ray.get(need_ref))
            return batch.filter(pa.array(mask))

        small = texts_ds.map_batches(keep_cands, batch_format="pyarrow").to_pandas()
        text_ref = ray.put(dict(zip(small[id_col], small[text_col])))

        def verify_small(batch: pa.Table) -> pa.Table:
            texts = ray.get(text_ref)
            out_a, out_b, ja = [], [], []
            for id_a, id_b in zip(batch.column("id_a").to_pylist(),
                                  batch.column("id_b").to_pylist()):
                verify_pair(id_a, id_b, texts.get(id_a), texts.get(id_b),
                            out_a, out_b, ja)
            return pa.table({
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(ja, pa.float64()),
            })

        return cand.map_batches(verify_small, batch_format="pyarrow")

    j1 = cand.join(texts_ds, "inner", num_partitions,
                   on=("id_a",), right_on=(id_col,), right_suffix="_r")
    j1 = _rename_join_text(j1, id_col, text_col, "text_a")
    j2 = j1.join(texts_ds, "inner", num_partitions,
                 on=("id_b",), right_on=(id_col,), right_suffix="_r")
    j2 = _rename_join_text(j2, id_col, text_col, "text_b")

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, ja = [], [], []
        for id_a, id_b, ta, tb in zip(batch.column("id_a").to_pylist(),
                                      batch.column("id_b").to_pylist(),
                                      batch.column("text_a").to_pylist(),
                                      batch.column("text_b").to_pylist()):
            verify_pair(id_a, id_b, ta, tb, out_a, out_b, ja)
        return pa.table({
            "id_a": pa.array(out_a, pa.int64()),
            "id_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(ja, pa.float64()),
        })

    return j2.map_batches(verify, batch_format="pyarrow")


def _rename_join_text(joined, id_col: str, text_col: str, new_name: str):
    """After an inner join against (id_col, text_col), rename the text column
    and drop any surviving right-side key column."""

    def fix(batch: pa.Table) -> pa.Table:
        for drop in (id_col, f"{id_col}_r"):
            if drop in batch.column_names:
                batch = batch.drop_columns([drop])
        src = text_col if text_col in batch.column_names else f"{text_col}_r"
        names = [new_name if c == src else c for c in batch.column_names]
        return batch.rename_columns(names)

    return joined.map_batches(fix, batch_format="pyarrow")


# ---------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_pairs(ds, *, shingle_n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Exact all-pairs n-gram Jaccard via inverted shingle index: explode
    (shingle_hash, id), groupby shingle → co-occurring pairs with counts →
    jaccard = co/(|A|+|B|-co). Exact (no LSH approximation); the shuffle is
    keyed by shingle hash. Head shingles are naturally bounded because a
    shingle shared by m docs yields m(m-1)/2 pairs — suitable for moderate
    duplication rates; LSH is the 10^12-scale path."""
    import ray
    from ray.data.aggregate import Count

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids_out, sh_out, size_out = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
            sh = _word_shingles((t or "").split(), shingle_n)
            for s in sh:
                ids_out.append(i)
                sh_out.append(int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big") >> 1)
            size_out.extend([len(sh)] * len(sh))
        return pa.table({
            id_col: pa.array(ids_out, pa.int64()),
            "shingle": pa.array(sh_out, pa.int64()),
            "set_size": pa.array(size_out, pa.int64()),
        })

    rows = ds.map_batches(shingle_rows, batch_format="pyarrow")

    def cooccur(group: pd.DataFrame) -> pd.DataFrame:
        recs = group[[id_col, "set_size"]].drop_duplicates().sort_values(id_col).to_numpy()
        if len(recs) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "size_a": [], "size_b": []})
        a, b, sa, sb = [], [], [], []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                a.append(recs[i][0]); b.append(recs[j][0])
                sa.append(recs[i][1]); sb.append(recs[j][1])
        return pd.DataFrame({"id_a": a, "id_b": b, "size_a": sa, "size_b": sb})

    pairs = rows.groupby("shingle").map_groups(cooccur, batch_format="pandas")
    from ray.data.aggregate import Count, Max

    agg = pairs.groupby(["id_a", "id_b"]).aggregate(
        Count(alias_name="co"), Max("size_a", alias_name="size_a"), Max("size_b", alias_name="size_b")
    )

    def finish(batch: pa.Table) -> pa.Table:
        co = batch.column("co").to_numpy().astype(np.float64)
        sa = batch.column("size_a").to_numpy().astype(np.float64)
        sb = batch.column("size_b").to_numpy().astype(np.float64)
        j = co / (sa + sb - co)
        keep = j >= threshold
        return pa.table({
            "id_a": batch.column("id_a").filter(pa.array(keep)),
            "id_b": batch.column("id_b").filter(pa.array(keep)),
            "jaccard": pa.array(j[keep], pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# -------------------------------------------------------------------- simhash

class SimHashActor:
    """64-bit simhash over md5-prefix token hashes, tf-weighted."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self._cache: dict[str, int] = {}
        self._scratch: np.ndarray | None = None  # grow-only per-actor buffer

    def _token_hash(self, tok: str) -> int:
        # md5 prefix — not blake2b — so the DuckDB oracle can mirror it
        # (('0x' || substr(md5(tok),1,16))::UBIGINT); see SQL_SIMHASH.
        h = self._cache.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            if len(self._cache) < 1_000_000:
                self._cache[tok] = h
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batched: unseen unique tokens across the whole batch go through
        one C MD5 kernel call (per-actor cache retained), and the weighted
        sign accumulation runs as one ``np.add.reduceat`` over doc segments
        instead of a per-doc outer product. Same values as the per-doc
        path."""
        from collections import Counter

        from ir_base_ray.functions.ckernels import md5_prefix64_strings

        counters = [Counter((t or "").split())
                    for t in batch.column(self.text_col).to_pylist()]
        unseen = list(dict.fromkeys(
            tok for c in counters for tok in c if tok not in self._cache))
        if unseen:
            hs_new = md5_prefix64_strings(pa.array(unseen, pa.string()))
            if len(self._cache) < 1_000_000:
                self._cache.update(zip(unseen, hs_new.tolist()))
                lookup = self._cache
            else:
                lookup = dict(self._cache)
                lookup.update(zip(unseen, hs_new.tolist()))
        else:
            lookup = self._cache
        hs_parts, ws_parts, bounds = [], [], [0]
        n = 0
        for c in counters:
            if c:
                hs_parts.append(np.fromiter((lookup[t] for t in c),
                                            np.uint64, count=len(c)))
                ws_parts.append(np.fromiter(c.values(), np.int64,
                                            count=len(c)))
                n += len(c)
            bounds.append(n)
        out = np.zeros(len(counters), dtype=np.uint64)
        if n:
            hs = np.concatenate(hs_parts)
            ws = np.concatenate(ws_parts)
            shifts = np.arange(64, dtype=np.uint64)[None, :]
            powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
            # per-doc bit expansion into a grow-only scratch buffer — never
            # materializes the batch-wide (N_tokens × 64) matrix (large fresh
            # allocations pay ~ms/page first-touch faults on this VM class);
            # the doc loop is μs-scale per doc.
            max_seg = int(np.max(np.diff(np.asarray(bounds))))
            if self._scratch is None or self._scratch.shape[0] < max_seg:
                self._scratch = np.empty((max_seg, 64), dtype=np.int64)
            buf = self._scratch
            for d in range(len(counters)):
                s, e = bounds[d], bounds[d + 1]
                if e > s:
                    v_u = buf.view(np.uint64)[:e - s]
                    np.right_shift(hs[s:e, None], shifts, out=v_u)
                    v = buf[:e - s]        # same memory; post-&1 is 0/1
                    v &= 1
                    v *= 2
                    v -= 1
                    v *= ws[s:e, None]
                    acc = v.sum(axis=0)
                    out[d] = ((acc > 0).astype(np.uint64) * powers).sum()
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "simhash": pa.array(out, pa.uint64()),
        })


def simhash_dataset(ds, id_col: str = "doc_id", text_col: str = "text", concurrency=4):
    return ds.map_batches(
        SimHashActor,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", concurrency=pool_size(concurrency), num_cpus=1,
    )


_POPCOUNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                           axis=1).sum(axis=1).astype(np.int64)


def simhash_near_pairs(sim_ds, *, max_hamming: int = 3, id_col: str = "doc_id"):
    """Banded simhash lookup: split 64 bits into (max_hamming+1) bands — any
    pair within the distance budget shares ≥1 exact band (pigeonhole);
    groupby band value → candidates → exact hamming verify."""
    num_bands = max_hamming + 1
    width = 64 // num_bands

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sh = batch.column("simhash").to_numpy()
        out_i, out_b, out_v, out_s = [], [], [], []
        for bnd in range(num_bands):
            seg = (sh >> np.uint64(bnd * width)) & np.uint64((1 << width) - 1)
            out_i.append(ids)
            out_b.append(np.full(ids.shape, bnd, dtype=np.int64))
            out_v.append(seg.astype(np.int64))
            out_s.append(sh.astype(np.int64))
        return pa.table({
            id_col: pa.array(np.concatenate(out_i), pa.int64()),
            "band_id": pa.array(np.concatenate(out_b), pa.int64()),
            "band_val": pa.array(np.concatenate(out_v), pa.int64()),
            "simhash_i": pa.array(np.concatenate(out_s), pa.int64()),
        })

    bands = sim_ds.map_batches(explode, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group[[id_col, "simhash_i"]].drop_duplicates().sort_values(id_col)
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ids = g[id_col].to_numpy()
        sh = g["simhash_i"].to_numpy().view(np.uint64)
        # all i<j pairs, vectorized in fixed-size i-blocks: a skewed band
        # (many docs sharing a value — e.g. near-empty texts) would make a
        # single triu_indices allocation O(n²) int64s; blocking keeps peak
        # memory O(block · n) while output stays O(matches). xor + popcount
        # via the byte-LUT view (numpy<2 has no bitwise_count).
        n = len(sh)
        blk = max(1, min(n, (1 << 22) // max(n, 1)))  # ≤ ~32 MB per xor tile
        oa, ob, od = [], [], []
        for i0 in range(0, n - 1, blk):
            i1 = min(i0 + blk, n - 1)
            x = sh[i0:i1, None] ^ sh[None, :]          # (i1-i0, n)
            d = _POPCOUNT8[x.view(np.uint8).reshape(i1 - i0, n, 8)].sum(axis=2)
            iu, ju = np.nonzero(d <= max_hamming)
            keep = i0 + iu < ju                        # strict i<j only
            if keep.any():
                oa.append(ids[i0 + iu[keep]])
                ob.append(ids[ju[keep]])
                od.append(d[iu[keep], ju[keep]].astype(np.int64))
        if not oa:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        return pd.DataFrame({"id_a": np.concatenate(oa),
                             "id_b": np.concatenate(ob),
                             "hamming": np.concatenate(od)})

    from ray.data.aggregate import Min

    cand = bands.groupby(["band_id", "band_val"]).map_groups(pairs, batch_format="pandas")
    return cand.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ------------------------------------------------ exact-substring dedup

# per-worker-process cache of the broadcast duplicated-shingle hash index
# (key = object-ref hex): built once per process, probed per batch
_dup_index_cache: dict[str, pd.Index] = {}


def _simple_windows(texts, window: int):
    """Vectorized sliding ``window``-token shingle builder over a text
    column in simple-analyzer mode. Returns ``(windows, doc_of_w,
    n_windows)``: the shingle strings (doc-major, ``pa.StringArray``), each
    shingle's batch-local doc position (``np.int64``), and the per-doc
    window count ``max(0, n_tokens - window + 1)``.

    Same device as ``MinHashActor.__call__``: one Arrow tokenize of the
    whole batch (``analyze_simple_flat``), window strings built in Arrow
    C++ as ``binary_join_element_wise`` over ``window`` shifted slices of
    the flat token column, then a segmented arange keeps only within-doc
    windows (cross-doc windows of the flat column are dropped)."""
    from ir_base_ray.functions.analyzer import analyze_simple_flat

    flat, cnt = analyze_simple_flat(texts)
    n_docs = cnt.size
    nw = np.maximum(cnt - window + 1, 0)
    F = len(flat)
    total = int(nw.sum())
    if F < window or total == 0:
        return (pa.array([], pa.string()), np.empty(0, np.int64),
                nw.astype(np.int64))
    slices = [flat.slice(k, F - window + 1) for k in range(window)]
    windows_all = (pc.binary_join_element_wise(*slices, " ")
                   if window > 1 else slices[0])
    offs = np.zeros(n_docs + 1, np.int64)
    np.cumsum(cnt, out=offs[1:])
    seg_end = np.cumsum(nw)
    idx = np.arange(total, dtype=np.int64) - np.repeat(seg_end - nw, nw)
    idx += np.repeat(offs[:-1], nw)
    windows = pc.take(windows_all, pa.array(idx, pa.int64()))
    doc_of_w = np.repeat(np.arange(n_docs, dtype=np.int64), nw)
    return windows, doc_of_w, nw.astype(np.int64)


def substring_dup_stats(docs_ds, *, window: int = 8,
                        dup_broadcast_max: int = 5_000_000,
                        num_partitions: int = 32):
    """Exact-substring (span) deduplication signal — the Lee et al. 2021
    device ("Deduplicating Training Data Makes Language Models Better",
    public): every doc's sliding ``window``-token shingles, a shingle
    duplicated when it appears in ≥2 DISTINCT docs; per doc the actionable
    cut signal (n_windows, dup_windows).

    Scale shape — NOTHING corpus-sized ever reaches the driver:

    1. tokenize pass → per-doc-distinct ``(shingle)`` rows, one
       ``groupby(shingle)`` count (rows are distinct per doc, so count ==
       distinct docs), then the ``>= 2`` cut applied DISTRIBUTED inside a
       ``map_batches`` over the aggregate — the singleton tail (≈ the
       corpus's token count at crawl scale) is dropped in place and the
       surviving duplicated-shingle Dataset is materialized in the object
       store (spillable), never collected;
    2. size-dispatched second pass, same device as the doc-id map
       (`build_index.py`) and the MinHash verify:
       - ≤ ``dup_broadcast_max`` duplicated shingles: collect + broadcast
         the dup SET (bounded by actual duplication, not vocabulary) and
         count each doc's member windows in one tokenize pass;
       - above it: shingle-keyed semi-join — re-emit ``(shingle, doc_id,
         n_occ)`` occurrence rows (plus one empty-shingle sentinel per doc,
         ``n_occ = 0``, so zero-window docs survive the aggregate),
         ``left_outer``-join them to the dup Dataset keyed by shingle, and
         ``groupby(doc_id)`` sums ``n_occ`` (→ n_windows) and the matched
         ``n_occ`` (→ dup_windows). Both shuffles are keyed (shingle, then
         doc_id); the sentinel contributes 0 to both sums even if "" were
         ever duplicated.

    The shingle key is the literal space-joined token text (no hash) so
    the DuckDB mirror is exact. Both dispatch arms produce identical rows
    (pinned by tests/test_textstats.py).

    All three corpus passes are fully vectorized (no per-row Python): the
    Arrow ``analyze_simple_flat`` tokenizer + the shifted-slice
    ``binary_join_element_wise`` window device MinHashActor uses, with
    per-doc distinct / occurrence-count done by Arrow ``group_by``."""
    from ray.data.aggregate import Count, Sum

    def distinct_shingles(batch: pa.Table) -> pa.Table:
        windows, doc_of_w, _ = _simple_windows(batch.column("text"), window)
        if len(windows) == 0:
            return pa.table({"shingle": pa.array([], pa.string())})
        # per-doc distinct: group_by([]) over (doc, shingle) = unique pairs
        t = pa.table({"d": pa.array(doc_of_w, pa.int64()), "shingle": windows})
        return t.group_by(["d", "shingle"]).aggregate([]).select(["shingle"])

    def keep_dups(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater_equal(batch.column("n"), 2))
        return pa.table({
            "shingle": batch.column("shingle"),
            "dup_mark": pa.array(np.ones(len(batch), np.int64), pa.int64()),
        })

    dups = (docs_ds.map_batches(distinct_shingles, batch_format="pyarrow")
            .groupby("shingle").aggregate(Count(alias_name="n"))
            .map_batches(keep_dups, batch_format="pyarrow")
            .materialize())
    n_dup_shingles = dups.count()

    if n_dup_shingles <= dup_broadcast_max:
        dup_arr = (dups.to_pandas()["shingle"].to_numpy()
                   if n_dup_shingles else np.empty(0, object))
        dup_ref = ray.put(dup_arr)

        def per_doc(batch: pa.Table) -> pa.Table:
            # pd.Index = one C hash table per worker PROCESS (cached below),
            # probed vectorized per batch via get_indexer — the doc-id-map
            # device from build_index/merge
            idx = _dup_index_cache.get(dup_ref.hex())
            if idx is None:
                idx = pd.Index(ray.get(dup_ref))
                _dup_index_cache[dup_ref.hex()] = idx
            windows, doc_of_w, nw = _simple_windows(batch.column("text"),
                                                    window)
            if len(windows) and len(idx):
                hit = idx.get_indexer(
                    windows.to_numpy(zero_copy_only=False)) >= 0
                dw = np.bincount(doc_of_w[hit], minlength=len(batch))
            else:
                dw = np.zeros(len(batch), np.int64)
            return pa.table({"doc_id": batch.column("doc_id"),
                             "n_windows": pa.array(nw, pa.int64()),
                             "dup_windows": pa.array(
                                 dw.astype(np.int64), pa.int64())})

        return docs_ds.map_batches(per_doc, batch_format="pyarrow")

    # --- semi-join arm: duplicated-shingle table exceeds the broadcast bound
    def occurrence_rows(batch: pa.Table) -> pa.Table:
        windows, doc_of_w, _ = _simple_windows(batch.column("text"), window)
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        parts = []
        if len(windows):
            t = pa.table({"doc_id": pa.array(dids[doc_of_w], pa.int64()),
                          "shingle": windows})
            agg = t.group_by(["doc_id", "shingle"]).aggregate(
                [("shingle", "count")])
            parts.append(pa.table({
                "shingle": agg.column("shingle"),
                "doc_id": agg.column("doc_id"),
                "n_occ": agg.column("shingle_count").cast(pa.int64()),
            }))
        # sentinel row per doc: keeps zero-window docs in the aggregate
        parts.append(pa.table({
            "shingle": pa.array([""] * len(dids), pa.string()),
            "doc_id": pa.array(dids, pa.int64()),
            "n_occ": pa.array(np.zeros(len(dids), np.int64), pa.int64()),
        }))
        return pa.concat_tables(parts).combine_chunks()

    rows = docs_ds.map_batches(occurrence_rows, batch_format="pyarrow")
    joined = rows.join(dups, "left_outer", num_partitions, on=("shingle",))

    def tag(batch: pa.Table) -> pa.Table:
        n_occ = batch.column("n_occ").to_numpy(zero_copy_only=False)
        matched = pc.is_valid(batch.column("dup_mark")).to_numpy(
            zero_copy_only=False)
        dup_occ = np.where(matched, n_occ, 0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_occ": batch.column("n_occ"),
            "dup_occ": pa.array(dup_occ.astype(np.int64), pa.int64()),
        })

    return (joined.map_batches(tag, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("n_occ", alias_name="n_windows"),
                       Sum("dup_occ", alias_name="dup_windows")))


# ------------------------------------------------ near-dup clustering

def connected_components(pairs_ds, *, id_a: str = "id_a", id_b: str = "id_b",
                         edge_broadcast_max: int = 5_000_000,
                         num_partitions: int = 32, max_rounds: int = 64):
    """→ Dataset of (doc_id, cluster_id): connected components of the
    undirected near-dup pair graph, ``cluster_id`` = min doc_id in the
    component — the missing link between pair emitters (MinHash-LSH /
    SimHash / embedding near-dup) and the actual dedup decision (keep one
    doc per cluster). Only nodes appearing in pairs are emitted; docs
    without a pair are trivially their own singleton cluster and never
    enter the shuffle.

    Size dispatch (the repo's standard device): with ≤
    ``edge_broadcast_max`` edges the edge list gathers ONCE to the driver
    and converges by vectorized min-label propagation with pointer jumping
    (numpy, O(E) per round, ≈log(diameter) rounds — LSH components are
    near-cliques). Above the bound: distributed label propagation — each
    round hash-joins current labels onto the reversed edge list, takes a
    ``groupby(src).min``, and merges into the label table (keyed shuffles
    only, materialized per round; rounds bounded by graph diameter). Both
    arms pinned row-identical by tests/test_dedup.py."""
    import ray.data
    from ray.data.aggregate import Min

    edges = pairs_ds.select_columns([id_a, id_b]).materialize()
    n_edges = edges.count()
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())})
    if n_edges == 0:
        return ray.data.from_arrow(empty)

    if n_edges <= edge_broadcast_max:
        df = edges.to_pandas()
        a = df[id_a].to_numpy().astype(np.int64, copy=False)
        b = df[id_b].to_numpy().astype(np.int64, copy=False)
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ea, eb = inv[: a.size], inv[a.size:]
        lab = np.arange(nodes.size, dtype=np.int64)
        while True:
            new = lab.copy()
            # nodes are sorted ascending, so min INDEX == min doc_id
            np.minimum.at(new, ea, lab[eb])
            np.minimum.at(new, eb, lab[ea])
            new = new[new]                     # pointer jumping
            if np.array_equal(new, lab):
                break
            lab = new
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(nodes, pa.int64()),
            "cluster_id": pa.array(nodes[lab], pa.int64())}))

    # distributed arm: alternating min-label propagation over keyed shuffles
    def both_dirs(batch: pa.Table) -> pa.Table:
        av = batch.column(id_a).cast(pa.int64())
        bv = batch.column(id_b).cast(pa.int64())
        return pa.table({"src": pa.concat_arrays(
                             [av.combine_chunks(), bv.combine_chunks()]),
                         "dst": pa.concat_arrays(
                             [bv.combine_chunks(), av.combine_chunks()])})

    und = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def seed_labels(batch: pa.Table) -> pa.Table:
        node = batch.column("src").to_numpy()
        nbr = batch.column("min_dst").to_numpy()
        return pa.table({"node": pa.array(node, pa.int64()),
                         "label": pa.array(np.minimum(node, nbr), pa.int64())})

    labels = (und.groupby("src").aggregate(Min("dst", alias_name="min_dst"))
              .map_batches(seed_labels, batch_format="pyarrow").materialize())

    for _ in range(max_rounds):
        # neighbor labels: join labels onto edge DESTINATIONS, min per src
        cand = (und.join(labels, "inner", num_partitions,
                         on=("dst",), right_on=("node",))
                .groupby("src").aggregate(Min("label", alias_name="nbr_min"))
                .materialize())
        merged = labels.join(cand, "left_outer", num_partitions,
                             on=("node",), right_on=("src",)).materialize()

        def update(batch: pa.Table) -> pa.Table:
            lab = batch.column("label").to_numpy(zero_copy_only=False)
            nm = batch.column("nbr_min").to_numpy(zero_copy_only=False)
            nm = np.where(np.isnan(nm.astype(np.float64)), lab,
                          nm) if nm.dtype != np.int64 else nm
            new = np.minimum(lab, nm)
            return pa.table({"node": batch.column("node").cast(pa.int64()),
                             "label": pa.array(new.astype(np.int64),
                                               pa.int64()),
                             "changed": pa.array((new < lab).astype(np.int64),
                                                 pa.int64())})

        labels = merged.map_batches(update,
                                    batch_format="pyarrow").materialize()
        n_changed = labels.sum("changed")
        labels = labels.select_columns(["node", "label"]).materialize()
        if not n_changed:
            break

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("node"),
                         "cluster_id": batch.column("label")})

    return labels.map_batches(rename, batch_format="pyarrow")
