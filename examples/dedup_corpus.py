"""Training-data curation over a document corpus: exact dedup, MinHash
near-dup pairs → connected-component clusters, winnowing fingerprints,
quality/language filtering, ANN similarity search.

Run: PYTHONPATH=/root/repo python examples/dedup_corpus.py
"""

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from pipeflow_ray.functions.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    neardup_clusters,
)
from pipeflow_ray.functions.similarity import brute_force_topk
from pipeflow_ray.functions.text import (
    lang_id_batch,
    quality_batch,
    token_count,
    winnow_batch,
)

SF = "/root/testdata/sf0.001"


def main():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    kept = exact_dedup(docs)
    print("exact dedup:", docs.count(), "→", kept.count(), "docs")

    pairs = minhash_dedup_pairs(docs, threshold=0.7)
    print("near-dup pairs (Jaccard ≥ 0.7):", pairs.count())

    clusters = neardup_clusters(pairs).to_pandas()
    n_clusters = clusters.cluster_id.nunique() if len(clusters) else 0
    print(f"near-dup clusters: {len(clusters)} docs in {n_clusters} components "
          f"(survivor = min doc_id per component)")

    # light-state scorers are stateless fns over the warm task pool — their
    # regex/coefficient state caches once per worker process (no actor pools)
    scored = (
        docs.map_batches(quality_batch, batch_format="pyarrow")
        .map_batches(lang_id_batch, batch_format="pyarrow")
        .map_batches(token_count(), batch_format="pyarrow")
        .map_batches(winnow_batch, batch_format="pyarrow")
    )
    good = scored.map_batches(
        lambda t: t.filter(pc.and_(pc.greater(t["quality"], 0.5),
                                   pc.equal(t["lang_pred"], "en"))),
        batch_format="pyarrow",
    )
    print("quality+lang filtered:", good.count(), "docs")
    sample = good.limit(3).to_pandas()
    print(sample[["doc_id", "quality", "lang_pred", "n_tokens", "n_fp"]]
          .to_string(index=False))

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    queries = np.stack(emb.embedding.head(2).to_numpy()).astype(np.float64)
    nn = brute_force_topk(ray.data.read_parquet(f"{SF}/embeddings.parquet"), queries, k=5)
    print("ANN top-5 per query:")
    print(nn.to_pandas().sort_values(["query_id", "rank"]).to_string(index=False))

    # --- curation extras: repetition signals, PII scrub, decontamination
    from pipeflow_ray.functions.text import (
        build_ngram_blocklist,
        contamination_check,
        pii_redact,
        repetition_stats,
    )

    rep = docs.map_batches(repetition_stats(), batch_format="pyarrow").to_pandas()
    print(f"repetition: max dup-trigram fraction "
          f"{rep.dup3_micro.max() / 1e6:.3f}, "
          f"{int((rep.dup3_micro >= 30_000).sum())} docs ≥ 3%")

    scrubbed = docs.map_batches(pii_redact(), batch_format="pyarrow")
    hits = scrubbed.map_batches(
        lambda t: t.select(["n_emails", "n_ips", "n_phones"]), batch_format="pyarrow"
    ).to_pandas().sum()
    print(f"pii scrub (this corpus is clean): {dict(hits)}")

    ref_texts = docs.limit(10).to_pandas().sort_values("doc_id").text.tolist()
    cont = docs.map_batches(
        contamination_check(ray.put(build_ngram_blocklist(ref_texts, 3)), 3),
        batch_format="pyarrow",
    ).to_pandas()
    print(f"decontamination vs a 10-doc blocklist: "
          f"{int(cont.contaminated.sum())}/{len(cont)} docs flagged")

    # --- sequence packing: the step between curation and tokenized shard
    # writing — deterministic id%parts partitions, greedy token budget
    from pipeflow_ray.functions.packing import pack_sequences

    packed = pack_sequences(docs, budget=512, num_parts=8).to_pandas()
    n_seqs = int((packed.groupby("part").seq_idx.max() + 1).sum())
    fill = packed.n_tokens.sum() / (n_seqs * 512)
    print(f"packing: {len(packed)} docs → {n_seqs} sequences of ≤512 tokens "
          f"({fill:.0%} mean fill)")

    # --- substring-span dedup (ExactSubstr-style): duplicated 20-gram
    # coverage per doc — trim or drop the high-coverage tail
    from pipeflow_ray.functions.dedup import substring_dup_stats

    spans = substring_dup_stats(docs, k=20).to_pandas()
    heavy = spans[spans.dup_frac_micro >= 500_000]
    print(f"substring dedup: {int(spans.n_dup_grams.sum())} duplicated "
          f"positions; {len(heavy)}/{len(spans)} docs ≥50% dup-span coverage")

    # --- semantic clustering + SemDeDup over the embedding table
    from pipeflow_ray.functions.similarity import (
        kmeans_assignments,
        semantic_dedup_pairs,
    )

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"])
    asg = kmeans_assignments(emb, k=4, iters=3).to_pandas()
    print(f"kmeans: cluster sizes {asg.cluster.value_counts().sort_index().to_dict()}")
    sem = semantic_dedup_pairs(emb, k=4, iters=3, tau2=1_450_000_000_000).to_pandas()
    print(f"semdedup: {len(sem)} in-cluster near-dup pairs")

    # --- conversation template dedup over transcripts (batch + on-ingest)
    from pipeflow_ray.fixtures import ensure_transcripts
    from pipeflow_ray.functions.dedup import conv_template_dedup
    from pipeflow_ray.pipelines.streaming import StreamingConvDedupRunner

    tp = ensure_transcripts("/root/testdata/sf0.001")
    convs = ray.data.read_parquet(tp, columns=["conv_id", "turn_idx", "role", "tool"])
    cd = conv_template_dedup(convs).to_pandas()
    scd, _m = StreamingConvDedupRunner().run(tp)
    scd = scd.to_pandas()
    assert scd.sort_values("conv_id").is_dup.tolist() == \
        cd.sort_values("conv_id").is_dup.tolist()
    print(f"conv template dedup: {int(cd.is_dup.sum())}/{len(cd)} convs are "
          f"shape-duplicates (streaming ≡ batch)")


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    main()
    ray.shutdown()
