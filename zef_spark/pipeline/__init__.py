from . import clustering, corpus, dedup, multimodal, similarity, \
    skew, text, wrangling  # noqa: F401
