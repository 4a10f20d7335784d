"""Large-scale training-data-pipeline operators (north star, BASELINE.json).

Beyond the reference's surface: dedup at scale (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding cosine), approximate similarity
search, text analysis (language ID, quality scoring, token counting,
fingerprinting), and multimodal column plumbing.
"""
