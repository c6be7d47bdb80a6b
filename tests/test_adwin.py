"""ADWIN drift detector behavior (own implementation of the public
Bifet & Gavalda 2007 algorithm; river-parity tests are skipped when
river is absent, which it is in this environment)."""

import random

import pytest

from log_project_spark.adwin import Adwin, NoDrift, make_detector

try:
    from river.drift import ADWIN as RiverADWIN  # noqa: N811

    HAVE_RIVER = True
except ImportError:
    HAVE_RIVER = False


def _gauss(n, mu, seed):
    rng = random.Random(seed)
    return [rng.gauss(mu, 1.0) for _ in range(n)]


def test_detects_mean_shift():
    det = Adwin(delta=0.002)
    fired = []
    for i, x in enumerate(_gauss(500, 0.0, 1) + _gauss(500, 6.0, 2)):
        if det.update(x):
            fired.append(i)
    assert fired, "must fire on a 6-sigma mean shift"
    assert min(fired) >= 500, "must not fire before the shift"
    assert min(fired) <= 600, "must fire soon after the shift"


def test_quiet_on_stationary():
    det = Adwin(delta=0.002)
    fires = sum(det.update(x) for x in _gauss(3000, 0.0, 3))
    assert fires <= 2  # rare false positives allowed at delta=0.002


def test_window_shrinks_on_drift():
    det = Adwin(delta=0.002)
    for x in _gauss(400, 0.0, 4):
        det.update(x)
    width_before = det.width
    for x in _gauss(400, 6.0, 5):
        det.update(x)
    assert det.width < width_before + 400  # old regime was dropped


def test_mean_tracks_recent_regime():
    det = Adwin(delta=0.002)
    for x in _gauss(500, 0.0, 6) + _gauss(500, 6.0, 7):
        det.update(x)
    assert det.mean > 3.0


def test_no_drift_detector():
    det = NoDrift()
    assert not any(det.update(float(i * 100)) for i in range(100))


def test_make_detector_dispatch():
    assert isinstance(make_detector("adwin", 0.002), Adwin)
    assert isinstance(make_detector("none"), NoDrift)
    with pytest.raises(ValueError):
        make_detector("bogus")


@pytest.mark.skipif(not HAVE_RIVER, reason="river not installed")
def test_river_drift_count_parity():
    ours = Adwin(delta=0.002)
    theirs = RiverADWIN(delta=0.002)
    data = _gauss(1000, 0.0, 8) + _gauss(1000, 5.0, 9)
    ours_n = sum(ours.update(x) for x in data)
    theirs_n = sum(bool(theirs.update(x).drift_detected) for x in data)
    assert abs(ours_n - theirs_n) <= 2
