from . import dedup, multimodal, similarity, text, wrangling  # noqa: F401
