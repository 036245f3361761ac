"""Metrics registry: bounded series windows, totals, summary shape."""

from sdmatte_tpu.utils.observability import Metrics, _SERIES_CAP


def test_metrics_window_bounded():
    m = Metrics()
    n = _SERIES_CAP + 100
    for i in range(n):
        m.observe("queue_depth", float(i))
        m.observe_ms("lat", float(i))
    # storage is a fixed window (serving memory stays bounded) ...
    assert len(m.values["queue_depth"]) == _SERIES_CAP
    assert len(m.timings_ms["lat"]) == _SERIES_CAP
    s = m.summary()
    # ... but totals report every observation, and stats cover the tail
    assert s["values"]["queue_depth"]["n"] == n
    assert s["timings"]["lat"]["n"] == n
    assert s["values"]["queue_depth"]["max"] == float(n - 1)


def test_metrics_counters_independent():
    m = Metrics()
    m.count("requests")
    m.count("requests", 2.0)
    assert m.summary()["counters"]["requests"] == 3.0
