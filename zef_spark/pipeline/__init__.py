from . import clustering, corpus, dedup, multimodal, similarity, \
    sketches, skew, text, wrangling  # noqa: F401
