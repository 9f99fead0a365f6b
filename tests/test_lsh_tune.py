"""lsh_tune: the MMDS §3.4 S-curve band/row optimizer (driver-side
arithmetic only — no Spark session needed)."""

import pytest

from siuba_spark.corpus.dedup import lsh_tune


def _collision(s, bands, rows):
    return 1.0 - (1.0 - s ** rows) ** bands


def test_factors_exhaust_signature():
    for t, n in [(0.5, 32), (0.8, 128), (0.3, 64), (0.9, 16)]:
        bands, rows, t50 = lsh_tune(t, n)
        assert bands * rows == n
        assert t50 == pytest.approx((1.0 / bands) ** (1.0 / rows))


def test_curve_centers_near_threshold():
    bands, rows, t50 = lsh_tune(0.5, 32)
    assert (bands, rows) == (8, 4)  # the textbook split
    assert 0.35 < t50 < 0.7
    # steep S-curve: well below t nearly never collides, well above
    # nearly always does
    assert _collision(0.2, bands, rows) < 0.15
    assert _collision(0.9, bands, rows) > 0.95


def test_higher_threshold_means_more_rows_per_band():
    _, rows_lo, _ = lsh_tune(0.3, 128)
    _, rows_hi, _ = lsh_tune(0.9, 128)
    assert rows_hi > rows_lo


def test_weights_shift_the_split():
    # heavily penalizing false negatives -> recall-leaning (fewer rows)
    _, rows_recall, _ = lsh_tune(0.6, 64, fn_weight=10.0)
    _, rows_prec, _ = lsh_tune(0.6, 64, fp_weight=10.0)
    assert rows_recall <= rows_prec


def test_optimal_among_all_splits():
    """The returned split has minimal weighted error among every exact
    divisor split — recomputed independently here."""
    t, n = 0.7, 48

    def err(bands, rows):
        m = 200
        fp = fn = 0.0
        for i in range(m):
            s = t * (i + 0.5) / m
            fp += _collision(s, bands, rows) * (t / m)
            s = t + (1 - t) * (i + 0.5) / m
            fn += (1 - _collision(s, bands, rows)) * ((1 - t) / m)
        return fp + fn

    bands, rows, _ = lsh_tune(t, n)
    best = min(err(n // r, r) for r in range(1, n + 1) if n % r == 0)
    assert err(bands, rows) == pytest.approx(best)


def test_validation():
    with pytest.raises(ValueError):
        lsh_tune(0.0, 32)
    with pytest.raises(ValueError):
        lsh_tune(1.0, 32)
    with pytest.raises(ValueError):
        lsh_tune(0.5, 1)
    with pytest.raises(ValueError):
        lsh_tune(0.5, 32, fn_weight=0.0, fp_weight=0.0)
    with pytest.raises(ValueError):
        lsh_tune(0.5, 32, fn_weight=-1.0)
