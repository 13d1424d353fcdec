from . import dedup, multimodal, similarity, skew, text, \
    wrangling  # noqa: F401
