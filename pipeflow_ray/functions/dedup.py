"""Near/exact deduplication for document corpora.

- exact: normalize → 64-bit fingerprint → hash-partitioned first-wins
  (the scalable form of "group by content, keep lowest id");
- MinHash + LSH: shingle → minhash signature → banded bucket groupby →
  candidate pairs → exact Jaccard verification (plausible-pair kill step);
- SimHash: 64-bit signature, banded bucketing, Hamming-distance verify;
- embedding cosine near-dup: random-hyperplane LSH bucketing + in-bucket
  cosine verify.

Scale shape: every stage is a ``map_batches`` (per-doc numpy inside a batch,
no Python-per-shingle), the only all-to-all exchanges are the
(band, band_hash) groupbys whose rows are tiny (ints), and verification
touches candidate pairs only. Signatures are computed once per doc and reused
across bands.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from pipeflow_ray.functions.text import fingerprint

_MERSENNE = np.uint64((1 << 61) - 1)


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Exact dedup on normalized content: keep the row with the smallest
    *id_col* per fingerprint. Shuffle key = the 64-bit fingerprint (never the
    text itself)."""
    ds = ds.map_batches(fingerprint(text_col), batch_format="pyarrow")

    def _local_first(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("fingerprint", "ascending"), (id_col, "ascending")])
        t = t.take(idx)
        fp = t["fingerprint"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(fp), dtype=bool)
        keep[1:] = fp[1:] != fp[:-1]
        return t.filter(pa.array(keep))

    # per-batch combiner, then one vectorized pass per hash bucket (the UDF is
    # already multi-fingerprint-aware — sort + adjacent-unique)
    from pipeflow_ray.stages.core import grouped_by_bucket

    ds = ds.map_batches(_local_first, batch_format="pyarrow")
    return grouped_by_bucket(ds, ["fingerprint"], _local_first, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shingling + signatures (per-batch numpy; per-doc vectorized rolling hash)
# ---------------------------------------------------------------------------

def _char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-char-shingle hashes of one doc — vectorized rolling
    polynomial hash over the byte array (no Python loop over shingles)."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    base = np.uint64(1_099_511_628_211)
    powers = base ** np.arange(k, dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    return np.unique(windows @ powers)  # wraps mod 2^64


class MinHasher:
    """Per-batch MinHash signatures (num_perm universal hashes over shingle
    hashes). Permutation coefficients are built once per actor; signatures
    for a whole batch are computed in ONE vectorized pass — all docs' shingle
    hashes concatenated, one (num_perm × total_shingles) universal hash, then
    a per-doc segmented min via ``np.minimum.reduceat``."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.text_col, self.id_col, self.k = text_col, id_col, k

    def signature(self, text: str) -> np.ndarray:
        s = _char_shingle_hashes(text, self.k)
        v = (self.a[:, None] * s[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def signatures(self, texts: list) -> np.ndarray:
        shingles = [_char_shingle_hashes(x or "", self.k) for x in texts]
        lens = np.array([len(s) for s in shingles])
        flat = np.concatenate(shingles) if shingles else np.array([], np.uint64)
        v = (self.a[:, None] * flat[None, :] + self.b[:, None]) % _MERSENNE
        starts = np.zeros(len(lens), dtype=np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        # segmented min per doc, all permutations at once → (num_perm, n_docs)
        return np.minimum.reduceat(v, starts, axis=1).T

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        sigs = self.signatures(texts)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "sig": pa.array(list(sigs.astype(np.uint64))),
            }
        )


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
) -> ray.data.Dataset:
    """MinHash → banded LSH → candidate pairs ``(id_a, id_b)`` (id_a < id_b).

    Emits (band, band_hash, id) rows — integers only — and groupbys on the
    band bucket; each bucket yields its within-bucket pairs. Pairs are
    deduped across bands by a final distinct.
    """
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_args=(text_col, id_col, num_perm, k),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return _candidates_from_sigs(sigs, id_col, num_perm, bands)


def _candidates_from_sigs(
    sigs: ray.data.Dataset, id_col: str, num_perm: int, bands: int
) -> ray.data.Dataset:
    rows_per_band = num_perm // bands

    def _bands(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sig = np.stack([np.asarray(s) for s in t["sig"].to_pylist()]).astype(np.uint64)
        n = len(ids)
        out_id, out_band, out_hash = [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = chunk[:, 0].copy()
            for j in range(1, rows_per_band):
                h = h * np.uint64(1_000_003) + chunk[:, j]
            out_id.append(ids)
            out_band.append(np.full(n, b, dtype=np.int32))
            out_hash.append(h.view(np.int64))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                "band_hash": pa.array(np.concatenate(out_hash), pa.int64()),
            }
        )

    banded = sigs.map_batches(_bands, batch_format="pyarrow")

    def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """All LSH buckets of one hash bucket at once: vectorized self-merge
        on (band, band_hash) → within-bucket pairs. Skew guard drops
        degenerate buckets (>10k members ⇒ near-universal shingle collision)."""
        sizes = df.groupby(["band", "band_hash"])[id_col].transform("size")
        df = df[(sizes >= 2) & (sizes <= 10_000)]
        if not len(df):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
        m = df.merge(df, on=["band", "band_hash"])
        a, b = m[f"{id_col}_x"], m[f"{id_col}_y"]
        keep = a < b
        return pd.DataFrame({"id_a": a[keep], "id_b": b[keep]}).drop_duplicates()

    from pipeflow_ray.stages.core import grouped_by_bucket

    pairs = grouped_by_bucket(banded, ["band", "band_hash"], _bucket_pairs, batch_format="pandas")
    # distinct across bands
    return grouped_by_bucket(
        pairs, ["id_a", "id_b"], lambda df: df.drop_duplicates(), batch_format="pandas"
    )


def verify_jaccard(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> ray.data.Dataset:
    """Exact shingle-Jaccard verification of candidate pairs.

    Candidate ids are a small fraction of the corpus: their texts are pulled
    once, broadcast via ``ray.put``, and each verify task scores its pairs
    locally. (At full scale this becomes a hash-join of pairs against docs —
    the broadcast form is the small-candidate fast path.)
    """
    pairs = pairs.materialize()  # consumed twice (id collection + verify map): execute once
    cand_ids = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        cand_ids.update(b["id_a"].to_pylist())
        cand_ids.update(b["id_b"].to_pylist())
    if not cand_ids:
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
        )
    id_arr = pa.array(sorted(cand_ids), pa.int64())
    texts = {}
    filtered = docs.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=id_arr)), batch_format="pyarrow"
    )
    for b in filtered.iter_batches(batch_format="pyarrow"):
        texts.update(zip(b[id_col].to_pylist(), b[text_col].to_pylist()))
    ref = ray.put(texts)

    class _Verify:
        def __init__(self):
            self.texts = ray.get(ref)
            self.cache: dict[int, np.ndarray] = {}

        def _sh(self, i: int) -> np.ndarray:
            if i not in self.cache:
                self.cache[i] = _char_shingle_hashes(self.texts.get(i) or "", k)
            return self.cache[i]

        def __call__(self, t: pa.Table) -> pa.Table:
            ja = []
            for a_, b_ in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()):
                sa, sb = self._sh(a_), self._sh(b_)
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                ja.append(inter / max(1, len(sa) + len(sb) - inter))
            out = t.append_column("jaccard", pa.array(ja, pa.float64()))
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return pairs.map_batches(_Verify, batch_format="pyarrow", concurrency=(1, 8))


def estimate_filter_pairs(
    pairs: ray.data.Dataset,
    sigs: ray.data.Dataset,
    threshold: float,
    id_col: str = "doc_id",
    margin: float = 0.18,
) -> ray.data.Dataset:
    """Cheap signature-agreement Jaccard estimate per candidate pair; keeps
    pairs with est ≥ threshold − margin (margin ≈ 3σ of the 64-perm
    estimator) so the expensive exact verification only touches plausible
    pairs. Signatures are broadcast once (num_docs × num_perm × 8 B — the
    small side; at larger corpora this becomes a hash join on id)."""
    sig_rows = {}
    for b in sigs.iter_batches(batch_format="pyarrow"):
        for i, s in zip(b[id_col].to_pylist(), b["sig"].to_pylist()):
            sig_rows[i] = np.asarray(s, dtype=np.uint64)
    ref = ray.put(sig_rows)
    cutoff = threshold - margin

    class _Est:
        def __init__(self):
            self.sigs = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["id_a"].to_pylist()
            b = t["id_b"].to_pylist()
            if not a:
                return t
            sa = np.stack([self.sigs[i] for i in a])
            sb = np.stack([self.sigs[i] for i in b])
            est = (sa == sb).mean(axis=1)
            return t.filter(pa.array(est >= cutoff))

    return pairs.map_batches(_Est, batch_format="pyarrow", concurrency=(1, 8))


def minhash_dedup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> ray.data.Dataset:
    """Full near-dup pipeline: signatures (once) → banded LSH candidates →
    signature-estimate pre-filter → exact-Jaccard verified pairs ≥ threshold."""
    num_perm = kw.get("num_perm", 64)
    k = kw.get("k", 5)
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_args=(text_col, id_col, num_perm, k),
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).materialize()
    cands = _candidates_from_sigs(sigs, id_col, num_perm, kw.get("bands", 16))
    plausible = estimate_filter_pairs(cands, sigs, threshold, id_col)
    return verify_jaccard(plausible, ds, threshold, text_col, id_col, k=k)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over token hashes (weight = token frequency)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    @staticmethod
    def _sim(tokens_hashes: np.ndarray) -> np.uint64:
        if len(tokens_hashes) == 0:
            return np.uint64(0)
        bits = ((tokens_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return np.uint64(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, t: pa.Table) -> pa.Table:
        sims = []
        for text in t[self.text_col].to_pylist():
            toks = (text or "").lower().split()
            th = pd.util.hash_array(np.array(toks, dtype=object)) if toks else np.array([], np.uint64)
            sims.append(self._sim(th))
        out = pa.table(
            {
                self.id_col: t[self.id_col],
                "simhash": pa.array(np.array(sims, np.uint64).view(np.int64), pa.int64()),
            }
        )
        return out


def simhash_dup_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """SimHash near-dup: 4×16-bit band bucketing (any pair within Hamming
    distance ≤ 4 shares at least one exact band) + in-bucket Hamming verify."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_args=(text_col, id_col), batch_format="pyarrow", concurrency=(1, 8)
    )

    def _bands(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sh = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        parts = []
        for b in range(4):
            band_val = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        id_col: pa.array(ids),
                        "simhash": pa.array(sh.view(np.int64)),
                        "band": pa.array(np.full(len(ids), b, np.int32)),
                        "band_val": pa.array(band_val),
                    }
                )
            )
        return pa.concat_tables(parts)

    banded = sigs.map_batches(_bands, batch_format="pyarrow")

    def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby(["band", "band_val"])[id_col].transform("size")
        df = df[(sizes >= 2) & (sizes <= 10_000)]
        if not len(df):
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "hamming": pd.Series(dtype="int64")}
            )
        m = df.merge(df, on=["band", "band_val"])
        keep = m[f"{id_col}_x"] < m[f"{id_col}_y"]
        m = m[keep]
        x = m["simhash_x"].to_numpy().astype(np.uint64) ^ m["simhash_y"].to_numpy().astype(np.uint64)
        ham = np.zeros(len(x), dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        out = pd.DataFrame(
            {"id_a": m[f"{id_col}_x"].to_numpy(), "id_b": m[f"{id_col}_y"].to_numpy(), "hamming": ham}
        )
        return out[out.hamming <= max_hamming].drop_duplicates(["id_a", "id_b"])

    from pipeflow_ray.stages.core import grouped_by_bucket

    pairs = grouped_by_bucket(banded, ["band", "band_val"], _bucket_pairs, batch_format="pandas")
    return grouped_by_bucket(
        pairs, ["id_a", "id_b"], lambda df: df.drop_duplicates(["id_a", "id_b"]), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    seed: int = 42,
) -> ray.data.Dataset:
    """Near-duplicate vectors by cosine ≥ threshold: random-hyperplane LSH
    bucket (cheap, broadcast planes) → exact in-bucket cosine verify."""
    import pyarrow.compute as _pc

    def _bucket(t: pa.Table) -> pa.Table:
        vecs = np.stack(t[vec_col].to_pylist()).astype(np.float64)
        dim = vecs.shape[1]
        planes = np.random.default_rng(seed).standard_normal((dim, num_planes))
        sig = (vecs @ planes > 0).astype(np.uint32)
        bucket = (sig << np.arange(num_planes, dtype=np.uint32)).sum(axis=1).astype(np.int64)
        norms = np.linalg.norm(vecs, axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                vec_col: t[vec_col],
                "norm": pa.array(norms),
                "bucket": pa.array(bucket),
            }
        )

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow")

    def _super_bucket_pairs(t: pa.Table) -> pa.Table:
        """One call per hash super-bucket; inner loop over the (few) LSH
        buckets it contains, each verified with a single matmul."""
        ids_all = t[id_col].to_numpy(zero_copy_only=False)
        vecs_all = np.stack(t[vec_col].to_pylist()).astype(np.float64)
        norms_all = t["norm"].to_numpy(zero_copy_only=False)
        buckets = t["bucket"].to_numpy(zero_copy_only=False)
        out_a, out_b, out_c = [], [], []
        for bval in np.unique(buckets):
            m = buckets == bval
            n = int(m.sum())
            if n < 2 or n > 20_000:
                continue
            ids, vecs, norms = ids_all[m], vecs_all[m], norms_all[m]
            sims = (vecs @ vecs.T) / np.outer(norms, norms).clip(min=1e-12)
            a, b = np.triu_indices(n, k=1)
            keep = sims[a, b] >= threshold
            out_a.append(np.minimum(ids[a][keep], ids[b][keep]))
            out_b.append(np.maximum(ids[a][keep], ids[b][keep]))
            out_c.append(sims[a, b][keep])
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"id_a": pa.array(np.concatenate(out_a)),
                         "id_b": pa.array(np.concatenate(out_b)),
                         "cosine": pa.array(np.concatenate(out_c), pa.float64())})

    from pipeflow_ray.stages.core import grouped_by_bucket

    return grouped_by_bucket(bucketed, ["bucket"], _super_bucket_pairs, batch_format="pyarrow")
