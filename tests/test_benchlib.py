"""benchlib plumbing on CPU: the chain protocol must run the step exactly
S times (serial dependency) and return a positive per-iteration time."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import benchlib


def test_ascii_from_codes_table():
    codes = jnp.asarray(np.arange(8, dtype=np.uint32))
    out = np.asarray(benchlib.ascii_from_codes(codes))
    np.testing.assert_array_equal(out[:4], np.frombuffer(b"ACGT", np.uint8))
    np.testing.assert_array_equal(out[4:], out[:4])   # masked to 2 bits


def test_chain_runs_step_exactly_s_times():
    # step doubles the carry; after S steps the value is 2^S -- the scan
    # must apply it exactly s_short/s_long times and the timer must return
    # a positive slope even on CPU
    def step(x):
        # enough FLOPs that 4 extra iterations dwarf CPU timer noise
        return jnp.tanh(x * 1.000001 + 0.1)

    x0 = jnp.ones((512, 1024), jnp.float32)
    sec = benchlib.chain_seconds_per_iter(step, x0, s_short=2, s_long=34,
                                          rounds=3)
    assert sec > 0

    # independently check the scan semantics benchlib relies on
    import jax

    @jax.jit
    def run(x):
        def body(c, _):
            return c * 2.0, None
        c, _ = jax.lax.scan(body, x, None, length=5)
        return c

    np.testing.assert_allclose(np.asarray(run(jnp.ones((4, 8)))), 32.0)
