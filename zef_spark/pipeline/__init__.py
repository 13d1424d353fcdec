from . import classifier, clustering, corpus, dedup, embeddings, \
    funnel, intervals, joins, layout, multimodal, rollup, similarity, \
    sketches, skew, text, tokenizer, web, wrangling  # noqa: F401
