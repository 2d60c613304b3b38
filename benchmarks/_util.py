"""Shared slope-method timer for the benchmark probes.

The slope method cancels fixed per-call overhead (dispatch, host sync)
by timing the same jitted function at two inner-iteration counts and
taking the difference: per-iter = (t(k5) - t(k1)) / (k5 - k1).  Every
probe in this directory uses the same convention: the jitted callable
takes (PRNGKey, K:int32, *args) and returns a finite scalar whose
float() forces a device sync.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope(fn, args=(), k1=1, k5=5):
    """Compile once; return per-inner-iteration seconds via the slope
    method.  `fn(key, K, *args)` must run its body K times."""
    def timed(K, seed):
        t0 = time.time()
        v = float(fn(jax.random.PRNGKey(seed), jnp.int32(K), *args))
        assert np.isfinite(v), v
        return time.time() - t0

    timed(k1, 0)          # compile
    t1 = timed(k1, 1)
    t5 = timed(k5, 2)
    return max((t5 - t1) / (k5 - k1), 1e-5)
