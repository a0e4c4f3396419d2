"""Large-scale training-data operations (beyond the reference's surface):
text analysis, exact/near deduplication, similarity search, multimodal
column plumbing. All vectorized ``map_batches`` stages."""
