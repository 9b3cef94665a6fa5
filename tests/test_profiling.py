"""Profiling utilities."""

import jax.numpy as jnp

from kmers_tpu import profiling


def test_timer_and_roofline():
    t = profiling.Timer()
    for _ in range(3):
        with t.round():
            jnp.zeros(16).block_until_ready()
    assert len(t.times) == 3 and t.best > 0
    r = profiling.roofline(1e9, 18.0)
    assert 0 < r["fraction"] < 100
    assert r["achieved_gbps"] == 18.0


def test_metrics_accumulator():
    m = profiling.MetricsAccumulator()
    m.update({"reads": 4, "kmers_emitted": 100})
    m.update({"reads": 2, "kmers_emitted": 50, "route_overflow": 1})
    assert m["reads"] == 6
    assert m["kmers_emitted"] == 150
    assert m["route_overflow"] == 1
    assert m.summary()["steps"] == 2
