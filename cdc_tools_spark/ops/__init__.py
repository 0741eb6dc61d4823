"""Large-scale training-data pipeline operators over the documents /
embeddings tables: dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis (language-ID, quality, token counts, fingerprints), and multimodal
column plumbing."""
