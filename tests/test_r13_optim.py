"""Focused tests for the r13 optimization round: each test pins an
optimization's equivalence contract (never a timing)."""

import random
import time


def test_fisher_band_fold_matches_full_fold():
    """The r13 band-limited hypergeometric fold must be BIT-identical
    to the former full-range fold: terms outside the band quantize to
    exactly Decimal 0 (double < 5e-13 under 12-dp HALF-UP), so the
    sums agree exactly, not approximately."""
    from zef_spark.pipeline.abtest import _fisher_tail_p

    rng = random.Random(13)
    cases = []
    for _ in range(150):
        cases.append(tuple(rng.randint(0, 40) for _ in range(4)))
    # degenerate margins (zero rows/cols, empty table)
    cases += [(0, 0, 0, 0), (5, 0, 0, 0), (0, 5, 0, 0), (0, 0, 5, 0),
              (0, 0, 0, 5), (3, 0, 4, 0), (0, 3, 0, 4), (1, 1, 1, 1)]
    for _ in range(25):
        cases.append(tuple(rng.randint(0, 3000) for _ in range(4)))
    for _ in range(4):  # support in the tens of thousands
        cases.append(tuple(rng.randint(0, 30000) for _ in range(4)))
    for a, b, c, d in cases:
        pb = _fisher_tail_p(a, b, c, d, band_limit=True)
        pf = _fisher_tail_p(a, b, c, d, band_limit=False)
        assert pb == pf, (a, b, c, d, pb, pf)


def test_fisher_band_fold_is_sublinear_in_margins():
    """An 11M-row table folds in milliseconds — the fold cost is
    O(band + log support), not O(support). A loose 2 s ceiling keeps
    this a regression tripwire, not a flaky timing assertion (the old
    full fold took ~50 s at a tenth of this margin size)."""
    from zef_spark.pipeline.abtest import _fisher_tail_p

    t0 = time.time()
    p = _fisher_tail_p(40000, 2900000, 120000, 8000000)
    assert time.time() - t0 < 2.0
    assert 0.0 <= p <= 1.0
