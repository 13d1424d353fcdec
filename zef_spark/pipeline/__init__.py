from . import abtest, classifier, clustering, corpus, dedup, \
    embeddings, encoding, evaluation, funnel, intervals, joins, \
    layout, market, multimodal, privacy, rollup, similarity, \
    sketches, skew, text, tokenizer, web, wrangling  # noqa: F401
