"""Tests for training-data ops: text analysis, dedup suite, similarity
search, multimodal plumbing — each against an in-process oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from pipeflow_ray.functions import text as T
from pipeflow_ray.functions.dedup import (
    exact_dedup,
    embedding_neardup_pairs,
    minhash_dedup_pairs,
    simhash_dup_pairs,
)
from pipeflow_ray.functions.multimodal import DecodeImages, decode_images, synth_image_table
from pipeflow_ray.functions.similarity import brute_force_topk, ivf_topk

SF = "/root/testdata/sf0.001"


def test_token_count_and_bpe():
    t = pa.table({"text": ["hello world", "  a  b\tc ", "", None, "x,y.z"]})
    out = ray.data.from_arrow(t).map_batches(T.token_count(), batch_format="pyarrow").to_pandas()
    assert list(out.n_tokens) == [2, 3, 0, 0, 1]
    out2 = ray.data.from_arrow(t).map_batches(T.bpe_token_estimate(), batch_format="pyarrow").to_pandas()
    assert out2.n_bpe_tokens[4] == 5  # x , y . z


def test_lang_id_heuristic():
    t = pa.table(
        {
            "text": [
                "the cat and the dog sat in the garden of the house",
                "der Hund ist nicht mit der Katze und das ist gut",
                "le chat est dans la maison et les jardins pour toujours",
                "zzz qqq www",
            ]
        }
    )
    out = ray.data.from_arrow(t).map_batches(T.LangId(), batch_format="pyarrow", concurrency=1).to_pandas()
    assert list(out.lang_pred) == ["en", "de", "fr", "und"]


def test_quality_score_ranges():
    t = pa.table({"text": ["The quick brown fox jumps over the lazy dog and runs away into the woods.", "!!!???...,,,", ""]})
    out = ray.data.from_arrow(t).map_batches(T.QualityScore(), batch_format="pyarrow").to_pandas()
    assert (out.quality >= 0).all() and (out.quality <= 1).all()
    assert out.quality[0] > out.quality[1] > out.quality[2]


def test_fingerprint_normalization():
    t = pa.table({"text": ["Hello  World", "hello world", "different text"]})
    out = ray.data.from_arrow(t).map_batches(T.fingerprint(), batch_format="pyarrow").to_pandas()
    assert out.fingerprint[0] == out.fingerprint[1] != out.fingerprint[2]


def test_exact_dedup_on_documents():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    deduped = exact_dedup(docs).to_pandas()
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    norm = df.text.fillna("").str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    ref = df.assign(_n=norm).sort_values("doc_id").groupby("_n", sort=False).first()
    assert len(deduped) == len(ref)
    assert set(deduped.doc_id) == set(ref.doc_id)


def _editted_corpus() -> pa.Table:
    base = (
        "the quick brown fox jumps over the lazy dog while the rain in spain "
        "falls mainly on the plain and every good boy deserves fudge today"
    )
    docs = [
        base,
        base.replace("lazy", "sleepy"),  # near-dup of 0
        "completely different content about ray data streaming engines and arrow batches",
        base[: len(base) // 2] + " totally new second half of this document here now",
        "another unrelated document discussing minhash signatures and lsh banding theory",
    ]
    return pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()), "text": docs})


def test_minhash_finds_near_dups():
    ds = ray.data.from_arrow(_editted_corpus())
    pairs = minhash_dedup_pairs(ds, threshold=0.6).to_pandas()
    assert (0, 1) in set(zip(pairs.id_a, pairs.id_b))
    assert all(j >= 0.6 for j in pairs.jaccard)
    # unrelated docs must not pair
    assert (2, 4) not in set(zip(pairs.id_a, pairs.id_b))


def test_simhash_finds_near_dups():
    ds = ray.data.from_arrow(_editted_corpus())
    pairs = simhash_dup_pairs(ds, max_hamming=6).to_pandas()
    assert (0, 1) in set(zip(pairs.id_a, pairs.id_b))
    assert (2, 4) not in set(zip(pairs.id_a, pairs.id_b))


def test_embedding_neardup():
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 16))
    vecs[7] = vecs[3] + rng.standard_normal(16) * 0.01  # near-dup pair (3, 7)
    t = pa.table(
        {"vec_id": pa.array(range(50), pa.int64()), "embedding": [list(map(float, v)) for v in vecs]}
    )
    pairs = embedding_neardup_pairs(ray.data.from_arrow(t), threshold=0.98).to_pandas()
    assert (3, 7) in set(zip(pairs.id_a, pairs.id_b))


def test_brute_force_topk_matches_numpy():
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    queries = mat[:3]
    got = brute_force_topk(ray.data.read_parquet(f"{SF}/embeddings.parquet"), queries, k=5).to_pandas()

    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    vn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = qn @ vn.T
    for q in range(3):
        order = np.lexsort((emb.vec_id.to_numpy(), -sims[q]))[:5]
        expect = list(emb.vec_id.to_numpy()[order])
        mine = list(got[got.query_id == q].sort_values("rank").vec_id)
        assert mine == expect


def test_ivf_topk_recall():
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    queries = mat[10:13]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    exact = brute_force_topk(ds, queries, k=10).to_pandas()
    approx = ivf_topk(ds, queries, k=10, n_clusters=8, nprobe=3).to_pandas()
    recalls = []
    for q in range(3):
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # IVF tradeoff, sanity bound


def test_corpus_topk_exact_and_recall():
    """Dataset-vs-Dataset ANN (corpus_topk): at nprobe == n_clusters it must
    EQUAL brute force per query (co-partitioned exchange correctness); at
    nprobe < n it keeps IVF-grade recall."""
    from pipeflow_ray.functions.similarity import corpus_topk

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    corpus = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                   columns=["vec_id", "embedding"])
    # query side: a distinct id/vec column naming to exercise the remap
    qdf = emb.iloc[5:25][["vec_id", "embedding"]].rename(
        columns={"vec_id": "qid", "embedding": "qe"})
    queries = ray.data.from_pandas(qdf.reset_index(drop=True))

    got = corpus_topk(corpus, queries, k=8, n_clusters=8, nprobe=8,
                      vec_col="embedding", id_col="vec_id",
                      query_vec_col="qe", query_id_col="qid").to_pandas()
    exact = brute_force_topk(corpus, mat[5:25], k=8).to_pandas()
    # brute_force query_id is positional; remap to vec ids
    exact["query_id"] = emb.vec_id.to_numpy()[5:25][exact.query_id.to_numpy()]
    g = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    e = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(g.query_id) == list(e.query_id)
    assert list(g.vec_id) == list(e.vec_id)
    assert np.allclose(g.cosine, e.cosine)

    approx = corpus_topk(corpus, queries, k=8, n_clusters=8, nprobe=3,
                         query_vec_col="qe", query_id_col="qid").to_pandas()
    recalls = []
    for qid, grp in e.groupby("query_id"):
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(set(grp.vec_id) & a) / len(grp))
    assert np.mean(recalls) >= 0.5

    # exclude_self drops the trivial self neighbor
    selfq = corpus_topk(corpus, queries, k=3, n_clusters=8, nprobe=8,
                        query_vec_col="qe", query_id_col="qid",
                        exclude_self=True).to_pandas()
    assert (selfq.query_id != selfq.vec_id).all()


def test_multimodal_decode_pipeline():
    t = synth_image_table(100)
    out = decode_images(ray.data.from_arrow(t), batch_size=16).to_pandas()
    assert len(out) == 100
    assert set(out.columns) == {"image_id", "format", "width", "height", "mean_intensity"}
    # oracle: recompute mean of one payload directly
    one = DecodeImages()( t.slice(0, 1)).to_pandas()
    body = np.frombuffer(t["payload"][0].as_py(), dtype=np.uint8, offset=16)
    assert abs(one.mean_intensity[0] - body.mean()) < 1e-9
    assert out.width.between(16, 128).all()


def test_multimodal_unknown_format_raises():
    import pytest

    with pytest.raises(ValueError, match="unknown image format"):
        DecodeImages()(pa.table({"payload": [b"JUNKDATA" * 4]}))


def test_hyperloglog_accuracy():
    from pipeflow_ray.functions.sketches import approx_distinct

    orders = ray.data.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    est = approx_distinct(orders, "o_custkey", p=12)
    exact = len(pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey"]).column(0).unique())
    assert abs(est - exact) / exact < 0.05  # p=12 → ~1.6% std error


def test_detect_hot_keys():
    from pipeflow_ray.fixtures import gen_transcripts
    from pipeflow_ray.functions.sketches import detect_hot_keys

    t = gen_transcripts(10_000)
    hot = detect_hot_keys(ray.data.from_arrow(t), "conv_id", top_k=5)
    assert hot.key.iloc[0] == "conv_00000000"  # the planted hot conversation
    assert hot.approx_count.iloc[0] == (pd.Series(t["conv_id"].to_pylist()) == "conv_00000000").sum()


def test_audio_features_pipeline():
    from pipeflow_ray.functions.multimodal import ExtractAudioFeatures, synth_audio_table

    t = synth_audio_table(60)
    out = ray.data.from_arrow(t).map_batches(
        ExtractAudioFeatures, batch_format="pyarrow", batch_size=16, concurrency=2, num_cpus=1
    ).to_pandas()
    assert len(out) == 60
    assert (out.sample_rate.isin([8000, 16000, 44100])).all()
    assert (out.duration_s > 0).all() and (out.rms > 0).all()


def test_video_frame_sampling_explodes():
    import struct

    from pipeflow_ray.functions.multimodal import SampleVideoFrames, synth_video_table

    t = synth_video_table(20)
    out = ray.data.from_arrow(t).map_batches(
        SampleVideoFrames, fn_constructor_kwargs={"stride": 4},
        batch_format="pyarrow", batch_size=8, concurrency=2, num_cpus=1,
    ).to_pandas()
    # oracle: expected sampled-frame count from the headers
    expect = 0
    for p in t["payload"].to_pylist():
        nf = struct.unpack("<III", p[4:16])[2]
        expect += len(range(0, nf, 4))
    assert len(out) == expect
    assert (out.frame_idx % 4 == 0).all()


def test_image_resize_payload_roundtrip():
    from pipeflow_ray.functions.multimodal import DecodeImages, ResizeImages, synth_image_table

    t = synth_image_table(30)
    resized = ray.data.from_arrow(t).map_batches(
        ResizeImages, fn_constructor_kwargs={"out_w": 16, "out_h": 16},
        batch_format="pyarrow", batch_size=8, concurrency=2, num_cpus=1,
    )
    decoded = resized.map_batches(
        DecodeImages, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    assert (decoded.width == 16).all() and (decoded.height == 16).all()
    assert decoded.mean_intensity.between(0, 255).all()


def test_winnow_fingerprint_properties():
    """Winnowing guarantee: a shared substring of length >= w+k-1 yields a
    shared fingerprint; plus edge cases (short text, empty, unicode)."""
    import numpy as np
    from pipeflow_ray.functions.text import WinnowFingerprint, _kgram_hashes

    k, w = 5, 4
    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": [
                "AAAA " + shared + " BBBB",
                "CCCCCC " + shared + " DDDD",
                "zz",          # shorter than k -> padded, single global min
                "",            # empty -> padded to k spaces, one k-gram
                "héllo wörld naïve café crème brûlée",  # codepoint path
            ],
        }
    )
    out = WinnowFingerprint(k=k, w=w)(t)
    assert out.column_names == ["doc_id", "text", "n_fp", "fp_xor"]
    n_fp = out["n_fp"].to_pylist()
    assert n_fp[2] == 1 and n_fp[3] == 1
    assert all(n >= 1 for n in n_fp)

    def fp_set(text):
        h = _kgram_hashes(text, k)
        if len(h) >= w:
            mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
        else:
            mins = h.min(keepdims=True)
        return set(np.unique(mins).tolist())

    a, b = fp_set(t["text"][0].as_py()), fp_set(t["text"][1].as_py())
    assert a & b, "docs sharing a long substring must share a fingerprint"
    assert len(a) == n_fp[0] and len(b) == n_fp[1]
    # determinism
    out2 = WinnowFingerprint(k=k, w=w)(t)
    assert out["fp_xor"].to_pylist() == out2["fp_xor"].to_pylist()

    import pytest as _pytest
    with _pytest.raises(ValueError):
        WinnowFingerprint(k=0)
    with _pytest.raises(ValueError):
        WinnowFingerprint(w=0)


def test_neardup_clusters_components():
    """Min-label propagation equals true connected components, including a
    diameter-4 chain (multiple propagation rounds) and an empty edge set."""
    from pipeflow_ray.functions.dedup import neardup_clusters

    pairs = pa.table(
        {
            "id_a": pa.array([1, 2, 5, 10, 11, 12, 13], pa.int64()),
            "id_b": pa.array([2, 3, 6, 11, 12, 13, 14], pa.int64()),
        }
    )
    out = neardup_clusters(ray.data.from_arrow(pairs)).to_pandas()
    got = dict(zip(out.doc_id, out.cluster_id))
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10, 13: 10, 14: 10}

    empty = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    eout = neardup_clusters(ray.data.from_arrow(empty))
    assert eout.count() == 0
    assert [f.name for f in eout.schema().base_schema] == ["doc_id", "cluster_id"]


def test_repetition_stats_vs_brute_force():
    """Exact token-bigram/trigram repetition counts vs a per-doc reference
    (collections.Counter over literal space-split tokens)."""
    import collections

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from pipeflow_ray.functions.text import repetition_stats

    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "dd", "ee"]
    texts = ["a b a b a b", "x", "", "a a a a", None, "q w e r t y"] + [
        " ".join(rng.choice(vocab, size=rng.integers(1, 40)))
        for _ in range(60)
    ]
    t = pa.Table.from_pandas(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = repetition_stats()(t).to_pandas()

    for i, text in enumerate(texts):
        toks = (text or "").split(" ")
        n = len(toks)
        bigrams = collections.Counter(zip(toks, toks[1:]))
        tris = list(zip(toks, toks[1:], toks[2:]))
        row = got.iloc[i]
        assert row.n_tokens == n
        assert row.top_bigram_n == (max(bigrams.values()) if bigrams else 0)
        assert row.n_trigrams == len(tris)
        assert row.distinct_trigrams == len(set(tris))
        exp_top2 = int(np.floor(1e6 * 2 * row.top_bigram_n / n)) if n >= 2 else 0
        exp_dup3 = (
            int(np.floor(1e6 * (len(tris) - len(set(tris))) / len(tris))) if tris else 0
        )
        assert row.top2_micro == exp_top2 and row.dup3_micro == exp_dup3


def test_pii_redact_counts_and_tokens():
    import pandas as pd
    import pyarrow as pa

    from pipeflow_ray.functions.text import pii_redact

    t = pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "mail alice.smith+x@corp.example.org now",
            "call 555-010-1234 or visit 10.0.0.1",
            None,
            "plain tokens only 3.14",
        ],
    }))
    out = pii_redact()(t).to_pandas()
    assert out.n_emails.tolist() == [1, 0, 0, 0]
    assert out.n_phones.tolist() == [0, 1, 0, 0]
    assert out.n_ips.tolist() == [0, 1, 0, 0]
    assert out.text_redacted[0] == "mail <EMAIL> now"
    assert out.text_redacted[1] == "call <PHONE> or visit <IP>"
    assert out.text_redacted[2] == ""
    assert out.text_redacted[3] == "plain tokens only 3.14"


def test_tfidf_terms_vs_brute_force():
    """Exact tf/df/score vs a Counter-based per-corpus reference."""
    import collections

    import numpy as np
    import pandas as pd
    import ray.data

    from pipeflow_ray.functions.text import tfidf_terms

    texts = ["a b b c", "b c c d", "", None, "a a a", "e"]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(docs).repartition(3)
    got = (
        tfidf_terms(ds, num_buckets=4).to_pandas()
        .sort_values(["doc_id", "token"]).reset_index(drop=True)
    )
    n_docs = len(texts)
    tf = {(i, tok): c
          for i, s in enumerate(texts)
          for tok, c in collections.Counter((s or "").split(" ")).items()}
    dfreq = collections.Counter(tok for (_i, tok) in tf)
    rows = [
        {"doc_id": i, "token": tok, "tf": c, "df": dfreq[tok],
         "tfidf_micro": int(np.floor(1e6 * c * float(n_docs) / dfreq[tok]))}
        for (i, tok), c in tf.items()
    ]
    ref = pd.DataFrame(rows).sort_values(["doc_id", "token"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref.astype(got.dtypes.to_dict()))


def test_contamination_check_vs_brute_force():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from pipeflow_ray.functions.text import build_ngram_blocklist, contamination_check

    ref = ["a b c d", "x y z"]
    texts = ["a b c d e", "e a b c", "x y z x y z", "q w", None, "b c d"]
    block = build_ngram_blocklist(ref, k=3)
    assert sorted(block) == sorted({"a\x1fb\x1fc", "b\x1fc\x1fd", "x\x1fy\x1fz"})
    t = pa.Table.from_pandas(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = contamination_check(ray.put(block), k=3)(t).to_pandas()
    # brute-force position counts
    exp = []
    bl = set(block.tolist())
    for s in texts:
        toks = (s or "").split(" ")
        hits = sum(1 for i in range(len(toks) - 2)
                   if "\x1f".join(toks[i:i + 3]) in bl)
        exp.append(hits)
    assert got.n_hits.tolist() == exp
    assert got.contaminated.tolist() == [int(h > 0) for h in exp]


def test_contamination_bloom_superset_and_fp_rate():
    """Bloom contamination: no false negatives vs the exact path, and the
    false-positive rate on disjoint grams stays under 1%."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from pipeflow_ray.functions.text import (
        _bloom_contains,
        _token_ngrams,
        build_ngram_blocklist,
        build_ngram_bloom,
        contamination_check,
        contamination_check_bloom,
    )

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(60)]
    ref = [" ".join(rng.choice(vocab, size=30)) for _ in range(20)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(200)]
    t = pa.Table.from_pandas(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))

    exact = contamination_check(ray.put(build_ngram_blocklist(ref, 3)), 3)(t).to_pandas()
    bloom = build_ngram_bloom(ref, 3)
    approx = contamination_check_bloom(ray.put(bloom), 3)(t).to_pandas()
    # one-sided: bloom hits ⊇ exact hits, per doc
    assert (approx.n_hits >= exact.n_hits).all()
    assert (approx.contaminated >= exact.contaminated).all()

    # FP rate on grams guaranteed absent from the blocklist
    probe = pd.Series([f"x{i}\x1fy{i}\x1fz{i}" for i in range(50_000)])
    fp = _bloom_contains(bloom, probe).mean()
    assert fp < 0.01, fp


def test_pack_sequences_vs_brute_force():
    """Greedy token-budget packing ≡ the per-row reference loop, under
    random counts including zero-token and over-budget docs, regardless
    of block layout (partition = id % parts is layout-independent)."""
    import ray.data

    from pipeflow_ray.functions.packing import pack_sequences

    rng = np.random.default_rng(11)
    n, parts, budget = 700, 8, 120
    counts = rng.integers(0, 200, size=n)  # some docs exceed the budget
    counts[rng.integers(0, n, size=10)] = 0
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "n_tokens_in": pa.array(counts, pa.int64())})

    def brute():
        rows = []
        for p in range(parts):
            acc, seq, first = 0, 0, True
            for d in range(p, n, parts):
                c = int(counts[d])
                if not first and acc + c > budget:
                    seq, acc = seq + 1, c
                else:
                    acc += c
                first = False
                rows.append((d, c, p, seq))
        return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "part", "seq_idx"])

    ref = brute().sort_values("doc_id").reset_index(drop=True)
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = (pack_sequences(ds, budget=budget, n_tokens_col="n_tokens_in",
                              num_parts=parts)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got[ref.columns].astype(ref.dtypes.to_dict()), ref)

    # every sequence respects the budget unless it is a single oversize doc
    g = ref.groupby(["part", "seq_idx"]).n_tokens.agg(["sum", "count"])
    bad = g[(g["sum"] > budget) & (g["count"] > 1)]
    assert bad.empty


def test_epoch_shuffle_global_rank():
    """Deterministic epoch shuffle: positions are the dense global rank of
    splitmix64(id + seed), invariant to block layout, and different seeds
    give different permutations."""
    import ray.data

    from pipeflow_ray.functions.sampling import splitmix64
    from pipeflow_ray.functions.shuffle import epoch_shuffle

    n = 3000
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    h = splitmix64(ids.astype(np.uint64) + np.uint64(5))
    ref = pd.DataFrame({"doc_id": ids, "shuffle_pos": np.argsort(np.argsort(h, kind="stable"))})

    outs = []
    for blocks in (1, 13):
        got = (epoch_shuffle(ray.data.from_arrow(t).repartition(blocks), seed=5,
                             radix_bits=6)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.astype(ref.dtypes.to_dict()), ref)
        outs.append(got)
    assert sorted(outs[0].shuffle_pos) == list(range(n))  # dense 0..n-1

    other = (epoch_shuffle(ray.data.from_arrow(t), seed=6, radix_bits=6)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (other.shuffle_pos.to_numpy() != outs[0].shuffle_pos.to_numpy()).any()


def _bm25_reference(texts, ids, query_terms, k=10, k1=1.2, b=0.75):
    """Row-at-a-time BM25 with the library's exact float discipline —
    independent reference for the vectorized two-pass implementation."""
    import math

    docs = [t.split(" ") for t in texts]
    n = len(docs)
    avgdl = float(sum(len(d) for d in docs)) / float(n)
    out = {}
    for qi, qts in enumerate(query_terms):
        terms = sorted(set(qts))
        rows = []
        for did, toks in zip(ids, docs):
            sc, nt = 0, 0
            for term in terms:
                tf = toks.count(term)
                if not tf:
                    continue
                df = sum(term in d for d in docs)
                idf = ((n - df) + 0.5) / (df + 0.5)
                num = float(tf) * (k1 + 1.0)
                den = float(tf) + (k1 * ((1.0 - b) + ((b * float(len(toks))) / avgdl)))
                sc += int(math.floor(((1000000.0 * idf) * num) / den))
                nt += 1
            if nt:
                rows.append((did, sc, nt))
        rows.sort(key=lambda r: (-r[1], r[0]))
        out[qi] = rows[:k]
    return out


def test_bm25_topk_matches_reference_and_layout_invariant():
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    texts, ids = docs.text.tolist(), docs.doc_id.tolist()
    query_terms = [t.split(" ")[:4] for t in texts[:3]] + [["zzz-not-a-token"]]
    ref = _bm25_reference(texts, ids, query_terms, k=5)
    from pipeflow_ray.functions.text import bm25_topk

    for blocks in (1, 7):
        ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                                   columns=["doc_id", "text"]).repartition(blocks)
        got = bm25_topk(ds, query_terms, k=5).to_pandas()
        assert got[got.query_id == 3].empty  # no-match query emits nothing
        for qi in range(3):
            g = got[got.query_id == qi].sort_values("rk")
            assert list(zip(g.doc_id, g.score_micro, g.n_terms)) == ref[qi]
            assert list(g.rk) == list(range(1, len(ref[qi]) + 1))


def test_bm25_topk_tie_break_by_id():
    """Identical docs tie on score — rank order must fall back to doc id."""
    from pipeflow_ray.functions.text import bm25_topk

    t = pa.table({
        "doc_id": pa.array([4, 2, 9, 7], pa.int64()),
        "text": pa.array(["alpha beta", "alpha beta", "alpha beta", "gamma delta"]),
    })
    got = bm25_topk(ray.data.from_arrow(t).repartition(2), [["alpha"]], k=3).to_pandas()
    assert list(got.doc_id) == [2, 4, 9]
    assert got.score_micro.nunique() == 1 and list(got.rk) == [1, 2, 3]


def _dupspan_brute(texts: dict[int, str], k: int, min_count: int = 2):
    """Pure-Python reference for substring_dup_stats."""
    from collections import Counter

    grams = Counter()
    for tx in texts.values():
        tx = tx or ""
        for g in range(len(tx) - k + 1):
            grams[tx[g : g + k]] += 1
    out = {}
    for did, tx in texts.items():
        tx = tx or ""
        pos = [g + 1 for g in range(len(tx) - k + 1) if grams[tx[g : g + k]] >= min_count]
        cover = 0
        if pos:
            start = prev = pos[0]
            for g in pos[1:]:
                if g - prev > k:
                    cover += prev - start + k
                    start = g
                prev = g
            cover += prev - start + k
        nc = len(tx)
        out[did] = (
            nc,
            max(nc - k + 1, 0),
            len(pos),
            cover,
            int(np.floor(1e6 * cover / nc)) if nc > 0 else 0,
        )
    return out


def test_substring_dup_stats_vs_brute_force():
    from pipeflow_ray.functions.dedup import substring_dup_stats

    k = 8
    texts = {
        0: "abcdefghijklmnop THE SHARED RUN xyz",  # shares a long run with 1
        1: "zzz THE SHARED RUN qqq THE SHARED RUN",  # also repeats it internally
        2: "completely unique text block here!",
        3: "short",  # < k: zero grams
        4: "",  # empty
        5: None,  # null text
        6: "abcdefghijklmnop",  # shares prefix with 0
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ds = ray.data.from_pandas(df).repartition(3)
    got = (
        substring_dup_stats(ds, k=k, min_count=2, num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _dupspan_brute(texts, k)
    assert len(got) == len(texts)
    for _, r in got.iterrows():
        nc, ng, nd, cov, frac = exp[r.doc_id]
        assert (r.n_chars, r.n_grams, r.n_dup_grams, r.dup_chars, r.dup_frac_micro) == (
            nc, ng, nd, cov, frac,
        ), f"doc {r.doc_id}"
    # non-vacuity: the shared run IS detected, the unique doc is clean
    by_id = got.set_index("doc_id")
    assert by_id.loc[1].n_dup_grams > 0 and by_id.loc[0].n_dup_grams > 0
    assert by_id.loc[2].n_dup_grams == 0 and by_id.loc[2].dup_chars == 0
    assert by_id.loc[3].n_grams == 0 and by_id.loc[4].n_chars == 0


def test_substring_dup_stats_layout_invariant():
    from pipeflow_ray.functions.dedup import substring_dup_stats

    rng = np.random.default_rng(7)
    base = "the quick brown fox jumps over the lazy dog "
    texts = {
        i: (base * int(rng.integers(1, 4)))[: int(rng.integers(10, 120))]
        for i in range(40)
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        outs.append(
            substring_dup_stats(ds, k=10, num_buckets=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    exp = _dupspan_brute(texts, 10)
    for _, r in outs[0].iterrows():
        assert (r.n_chars, r.n_grams, r.n_dup_grams, r.dup_chars, r.dup_frac_micro) == exp[r.doc_id]


def _kmeans_brute(x: np.ndarray, init: np.ndarray, iters: int, scale: int):
    """Pure-numpy integer-exact Lloyd reference."""
    xq = np.floor(x.astype(np.float64) * scale).astype(np.int64)
    cent = np.floor(init.astype(np.float64) * scale).astype(np.int64)
    for _ in range(iters):
        d = ((xq[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        nxt = cent.copy()
        for j in range(len(cent)):
            m = a == j
            if m.any():
                nxt[j] = np.floor_divide(xq[m].sum(0), m.sum())
        cent = nxt
    d = ((xq[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    a = d.argmin(1)
    return a, d[np.arange(len(xq)), a]


def test_kmeans_assignments_vs_brute_force_and_layout():
    from pipeflow_ray.functions.similarity import kmeans_assignments

    rng = np.random.default_rng(11)
    # 3 well-separated blobs + noise, d=8
    x = np.concatenate([
        rng.normal(0.0, 0.05, (40, 8)),
        rng.normal(0.6, 0.05, (40, 8)),
        rng.normal(-0.6, 0.05, (40, 8)),
    ]).astype(np.float32)
    ids = np.arange(len(x), dtype=np.int64)
    init = x[:3].astype(np.float64)
    exp_a, exp_d = _kmeans_brute(x, init, iters=4, scale=10**6)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(x)})
    for parts in (1, 5):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (
            kmeans_assignments(ds, k=3, iters=4, init=init)
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        assert (got.cluster.to_numpy() == exp_a).all()
        assert (got.dist2.to_numpy() == exp_d).all()
    # the blobs separate: each third lands in one cluster
    assert len(set(exp_a[:40])) == 1 and len(set(exp_a[40:80])) == 1
    assert len({exp_a[0], exp_a[40], exp_a[80]}) == 3


def test_kmeans_empty_cluster_keeps_centroid():
    from pipeflow_ray.functions.similarity import kmeans_assignments

    # seed 2 sits far away and captures nothing after iteration 1 — its
    # centroid must stay put (both engines' documented rule) and the run
    # must still be deterministic
    x = np.array([[0.0, 0.0], [0.1, 0.0], [0.9, 1.0], [1.0, 0.9],
                  [0.05, 0.05]], dtype=np.float32)
    init = np.array([[0.0, 0.0], [1.0, 1.0], [50.0, 50.0]])
    exp_a, exp_d = _kmeans_brute(x, init, iters=3, scale=10**6)
    df = pd.DataFrame({"vec_id": np.arange(5, dtype=np.int64), "embedding": list(x)})
    got = (
        kmeans_assignments(ray.data.from_pandas(df), k=3, iters=3, init=init)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert (got.cluster.to_numpy() == exp_a).all()
    assert (got.dist2.to_numpy() == exp_d).all()
    assert 2 not in set(got.cluster)  # the far seed stayed empty


def test_semantic_dedup_pairs_vs_brute_force():
    from pipeflow_ray.functions.similarity import semantic_dedup_pairs

    rng = np.random.default_rng(23)
    # two blobs; plant exact near-dup pairs inside each blob
    a = rng.normal(0.0, 0.08, (30, 8))
    b = rng.normal(0.7, 0.08, (30, 8))
    x = np.concatenate([a, a[:4] + 1e-4, b, b[:3] + 1e-4]).astype(np.float32)
    ids = np.arange(len(x), dtype=np.int64)
    init = np.stack([a[0], b[0]]).astype(np.float64)
    scale, tau2, iters = 10**6, 10**9, 3

    # brute-force reference: same integer kmeans, same exact pair rule
    asg, _ = _kmeans_brute(x, init, iters, scale)
    xq = np.floor(x.astype(np.float64) * scale).astype(np.int64)
    exp = set()
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            if asg[i] == asg[j] and ((xq[i] - xq[j]) ** 2).sum() <= tau2:
                exp.add((i, j))
    assert len(exp) >= 7  # the planted pairs are found

    df = pd.DataFrame({"vec_id": ids, "embedding": list(x)})
    for parts in (1, 6):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = semantic_dedup_pairs(
            ds, k=2, iters=iters, tau2=tau2, init=init, num_buckets=4
        ).to_pandas()
        assert set(zip(got.id_a, got.id_b)) == exp
        # dist2 values are the exact integers
        for _, r in got.iterrows():
            assert r.dist2 == ((xq[r.id_a] - xq[r.id_b]) ** 2).sum()


def test_semantic_dedup_pairs_empty_result_schema():
    from pipeflow_ray.functions.similarity import semantic_dedup_pairs

    x = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]], dtype=np.float32)
    df = pd.DataFrame({"vec_id": np.arange(3, dtype=np.int64), "embedding": list(x)})
    got = semantic_dedup_pairs(
        ray.data.from_pandas(df), k=2, iters=1, tau2=1,
        init=np.array([[0.0, 0.0], [2.0, 2.0]]),
    )
    assert got.schema().names == ["id_a", "id_b", "dist2"]
    assert got.count() == 0


def test_conv_template_dedup_vs_brute_force():
    from pipeflow_ray.functions.dedup import conv_template_dedup

    rows = []
    # c1 and c3 share the (role, tool) template; c2 differs by order;
    # c4 has tool=None where c5 has tool='' (must NOT merge);
    # c6 == c1 template AND text (full-content dup of nothing — text differs)
    def conv(cid, seq):
        for i, (role, tool, text) in enumerate(seq):
            rows.append(dict(conv_id=cid, turn_idx=i, role=role, tool=tool, text=text))

    conv("c1", [("user", None, "hi"), ("assistant", "search", "ok")])
    conv("c3", [("user", None, "different text"), ("assistant", "search", "x")])
    conv("c2", [("assistant", "search", "ok"), ("user", None, "hi")])
    conv("c4", [("user", None, "a")])
    conv("c5", [("user", "", "a")])
    conv("c6", [("user", None, "hi"), ("assistant", "search", "ok")])
    df = pd.DataFrame(rows)

    for parts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (
            conv_template_dedup(ds, num_buckets=4)
            .to_pandas().sort_values("conv_id").reset_index(drop=True)
        )
        by = got.set_index("conv_id")
        assert by.loc["c1"].canonical_conv_id == "c1" and by.loc["c1"].is_dup == 0
        assert by.loc["c3"].canonical_conv_id == "c1" and by.loc["c3"].is_dup == 1
        assert by.loc["c6"].canonical_conv_id == "c1" and by.loc["c6"].group_size == 3
        assert by.loc["c2"].is_dup == 0  # order matters
        assert by.loc["c4"].is_dup == 0 and by.loc["c5"].is_dup == 0  # NULL != ''
        assert by.loc["c4"].canonical_conv_id == "c4"
        assert by.loc["c5"].canonical_conv_id == "c5"

    # full-content mode: only c1/c6-with-same-text merge when text included
    got2 = (
        conv_template_dedup(ds, sig_cols=["role", "tool", "text"], num_buckets=4)
        .to_pandas().set_index("conv_id")
    )
    assert got2.loc["c6"].canonical_conv_id == "c1" and got2.loc["c6"].is_dup == 1
    assert got2.loc["c3"].is_dup == 0  # text differs → not a content dup


def test_inverted_index_vs_brute_force():
    from pipeflow_ray.functions.text import inverted_index

    df = pd.DataFrame({
        "doc_id": [10, 3, 7, 5],
        "text": ["a b a", "b c", None, "c a c b"],
    })
    got = (
        inverted_index(ray.data.from_pandas(df).repartition(3), num_buckets=4)
        .to_pandas().sort_values("token").reset_index(drop=True)
    )
    exp = {
        # token: (df_docs, total_tf, postings ascending by doc id)
        "a": (2, 3, "5,10"),
        "b": (3, 3, "3,5,10"),
        "c": (2, 3, "3,5"),
        "": (1, 1, "7"),  # null text → one empty-string token (split of '')
    }
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        d, t, p = exp[r.token]
        assert (r.df_docs, r.total_tf, r.postings) == (d, t, p), r.token


def test_knn_classify_vs_brute_force_with_ties():
    from pipeflow_ray.functions.similarity import knn_classify

    # grid points where several neighbors are EXACTLY equidistant — the
    # k-th-boundary tie must break by id and the vote tie by smallest label
    pts = np.array([
        [0.0, 0.0],   # 0: four unit-distance neighbors (1,2,3,4) + corner 5
        [1.0, 0.0],   # 1
        [-1.0, 0.0],  # 2
        [0.0, 1.0],   # 3
        [0.0, -1.0],  # 4
        [1.0, 1.0],   # 5
        [5.0, 5.0],   # 6: far cluster
        [5.0, 6.0],   # 7
        [6.0, 5.0],   # 8
    ], dtype=np.float32)
    labels = np.array([0, 1, 1, 2, 2, 0, 3, 3, 3], dtype=np.int32)
    k, scale = 3, 10**6

    xq = np.floor(pts.astype(np.float64) * scale).astype(np.int64)

    def brute(i):
        d = ((xq - xq[i]) ** 2).sum(1)
        order = sorted((int(d[j]), j) for j in range(len(pts)) if j != i)[:k]
        from collections import Counter
        votes = Counter(int(labels[j]) for _, j in order)
        best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        return best[0], best[1]

    df = pd.DataFrame({"vec_id": np.arange(len(pts), dtype=np.int64),
                       "embedding": list(pts), "label": labels})
    for parts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (knn_classify(ds, k=k, num_buckets=4)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        for _, r in got.iterrows():
            pl, nv = brute(int(r.vec_id))
            assert (r.pred_label, r.n_votes) == (pl, nv), int(r.vec_id)
    # the equidistant case really exercised the tie: point 0's three nearest
    # among four unit-distance neighbors are ids 1,2,3 → labels 1,1,2 → 1
    assert got.set_index("vec_id").loc[0].pred_label == 1
