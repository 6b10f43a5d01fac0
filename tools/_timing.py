"""Timing barrier that actually waits on this platform.

`jax.block_until_ready` can return before a chained computation finishes on
the tunneled axon platform (observed: a 915 ms/step program "timed" at
13 ms/step — bench.py, PARITY.md fifth pass), even when the final array is
data-dependent on every prior step. A value READ cannot: `drain` reduces one
leaf on device and pulls the 4-byte scalar host-side, forcing the whole
producing chain. Use it to close every timed loop.
"""

import jax
import jax.numpy as jnp


def drain(tree) -> float:
    """Force completion of everything `tree` depends on; returns a scalar."""
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf).astype(jnp.float32))
