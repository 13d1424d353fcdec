from . import clustering, corpus, dedup, funnel, multimodal, similarity, \
    sketches, skew, text, wrangling  # noqa: F401
