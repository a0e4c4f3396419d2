"""Mergeable-sketch and data-mixing tour: cardinality, quantiles and
mixture assembly at 100-TB shapes — every stage here keeps per-key state
CONSTANT (registers / compactors) or decides rows locally (hashes), so
nothing scales with stream length or value cardinality.

- per-key approximate distinct: batch (`grouped_approx_distinct`) and
  streaming on-ingest (`StreamingHLLRunner`) — identical registers, so the
  two estimates agree bit-for-bit;
- approximate grouped quantiles over a continuous domain (KLL sketches);
- heavy-hitter detection (feeds hot-key salting);
- deterministic corpus mixing: stratified downsampling + weighted
  upsampling, reproducible under any partitioning.

Run: PYTHONPATH=/root/repo python examples/sketches_tour.py
"""

import ray
import ray.data


def main():
    from pipeflow_ray.fixtures import ensure_transcripts
    from pipeflow_ray.functions.sampling import stratified_sample, upsample
    from pipeflow_ray.functions.sketches import (
        detect_hot_keys,
        grouped_approx_distinct,
    )
    from pipeflow_ray.pipelines.streaming import StreamingHLLRunner
    from pipeflow_ray.stages.window import grouped_quantiles_sketch

    sf = "/root/testdata/sf0.001"
    tp = ensure_transcripts(sf)

    # --- per-key approximate distinct, batch vs streaming --------------
    ds = ray.data.read_parquet(tp, columns=["role", "text"])
    batch = grouped_approx_distinct(ds, ["role"], "text").to_pandas()
    stream, metrics = StreamingHLLRunner("role", "text", num_buckets=2).run(tp)
    m = batch.merge(stream, on="role", suffixes=("_batch", "_stream"))
    print("distinct texts per role (batch HLL == streaming HLL):")
    print(m.to_string(index=False))
    assert (m.approx_distinct_batch == m.approx_distinct_stream).all()
    print(f"streaming state: {metrics['state_bytes']} bytes "
          f"({metrics['keys']} keys x 4 KiB)\n")

    # --- approximate quantiles over a continuous domain ----------------
    li = ray.data.read_parquet(f"{sf}/lineitem.parquet",
                               columns=["l_returnflag", "l_extendedprice"])
    q = grouped_quantiles_sketch(li, ["l_returnflag"], "l_extendedprice",
                                 qs=(0.5, 0.95)).to_pandas()
    print("price p50/p95 per returnflag (KLL, ~0.6% rank error):")
    print(q.to_string(index=False), "\n")

    # --- heavy hitters: batch and on-ingest ------------------------------
    hot = detect_hot_keys(ray.data.read_parquet(tp, columns=["conv_id"]),
                          "conv_id", top_k=3)
    print("hottest conversations (batch partial counts):")
    print(hot.to_string(index=False), "\n")

    from pipeflow_ray.pipelines.streaming import StreamingTopKRunner

    sk, mtop = StreamingTopKRunner("conv_id", m=64, num_buckets=4).run(tp)
    print("same, streamed with bounded state "
          f"({mtop['retained']}/{mtop['state_cap']} entries; est−err ≤ true ≤ est):")
    print(sk.head(3)[["conv_id", "est", "err"]].to_string(index=False), "\n")

    # --- deterministic mixture assembly ---------------------------------
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])
    sampled = stratified_sample(docs, "lang", {"en": 0.25, "fr": 1.0},
                                id_col="doc_id", seed=7, default=0.5)
    mixed = upsample(sampled, "lang", {"fr": 2.5}, id_col="doc_id",
                     seed=7, default=1.0)
    out = mixed.to_pandas()
    print("mixture by lang after sample(en 25%, fr 100%, rest 50%) then "
          "upsample(fr 2.5x):")
    print(out.groupby("lang").size().rename("rows").reset_index()
          .to_string(index=False))
    # the same pipeline re-run reproduces the mixture row-for-row
    again = upsample(
        stratified_sample(docs, "lang", {"en": 0.25, "fr": 1.0},
                          id_col="doc_id", seed=7, default=0.5),
        "lang", {"fr": 2.5}, id_col="doc_id", seed=7, default=1.0,
    ).to_pandas()
    key = ["doc_id", "copy_idx"]
    assert sorted(map(tuple, out[key].itertuples(index=False))) == \
        sorted(map(tuple, again[key].itertuples(index=False)))
    print("\nre-run reproduced the mixture exactly (hash-deterministic).")


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        main()
    finally:
        ray.shutdown()
