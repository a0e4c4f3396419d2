"""Training-data curation over a document corpus: exact dedup, MinHash
near-dup pairs, quality/language filtering, ANN similarity search.

Run: PYTHONPATH=/root/repo python examples/dedup_corpus.py
"""

import numpy as np
import pyarrow.parquet as pq

import ray
import ray.data

from pipeflow_ray.functions.dedup import exact_dedup, minhash_dedup_pairs
from pipeflow_ray.functions.similarity import brute_force_topk
from pipeflow_ray.functions.text import LangId, QualityScore, token_count

SF = "/root/testdata/sf0.001"


def main():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    kept = exact_dedup(docs)
    print("exact dedup:", docs.count(), "→", kept.count(), "docs")

    pairs = minhash_dedup_pairs(docs, threshold=0.7)
    print("near-dup pairs (Jaccard ≥ 0.7):", pairs.count())

    # autoscaling (1..2) pools: two FIXED pools of 2 on a 4-cpu session would
    # claim every CPU and starve the downstream tasks (see CLAUDE.md gotcha)
    scored = (
        docs.map_batches(QualityScore, batch_format="pyarrow", concurrency=(1, 2), num_cpus=1)
        .map_batches(LangId, batch_format="pyarrow", concurrency=(1, 2), num_cpus=1)
        .map_batches(token_count(), batch_format="pyarrow")
    )
    good = scored.filter(lambda r: r["quality"] > 0.5 and r["lang_pred"] == "en")
    print("quality+lang filtered:", good.count(), "docs")

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    queries = np.stack(emb.embedding.head(2).to_numpy()).astype(np.float64)
    nn = brute_force_topk(ray.data.read_parquet(f"{SF}/embeddings.parquet"), queries, k=5)
    print("ANN top-5 per query:")
    print(nn.to_pandas().sort_values(["query_id", "rank"]).to_string(index=False))


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    main()
    ray.shutdown()
