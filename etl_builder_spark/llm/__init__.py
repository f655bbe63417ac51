"""LLM-data-pipeline operators (SURVEY.md §2 I-rows): text analysis,
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH), and
multimodal binary-column plumbing."""
