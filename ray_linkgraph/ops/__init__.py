"""Large-scale training-data operations over document / embedding /
event tables: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding cosine), similarity search (brute-force + LSH
bucketed ANN), text analysis (language id, quality, token counts,
fingerprints), windowed event aggregation, and multimodal decode
plumbing (stubbed codecs, real Ray-side schema/actor wiring)."""
