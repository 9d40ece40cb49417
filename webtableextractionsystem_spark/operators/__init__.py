"""Spark DataFrame operators.

extraction.py  the Arrow-batched extraction stage + derived views
fusion.py      entity fusion (A6) as deterministic window-ordered merge
dedup.py       exact / MinHash-LSH / SimHash / n-gram Jaccard dedup
similarity.py  embedding similarity search (brute-force + LSH-bucketed)
textstats.py   language-ID, quality scoring, token counts, fingerprints
multimodal.py  binary media columns: schema + batched (stubbed) decode
"""
