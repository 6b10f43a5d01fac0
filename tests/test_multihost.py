"""Multi-host data-parallel launch path (SURVEY §2b row 1).

Real multi-host needs a pod; here we unit-test the pieces that carry the
semantics: the per-process slice of the (seed, epoch)-keyed global batch
(host_rows), coordinator gating, flag plumbing, and that the sliced rows
reassemble into exactly the global array a single process would shard.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idvs.morec_tpu.config import Config
from idvs.morec_tpu.parallel.mesh import (host_rows, is_coordinator,
                                          make_mesh, shard_batch)


def test_host_rows_partition_is_exact():
    """Every process's slice, concatenated in process order, is the global
    permutation — no overlap, no gap, order preserved."""
    global_n = 64
    for pc in (1, 2, 4, 8):
        rows = [host_rows(global_n, pi, pc) for pi in range(pc)]
        got = np.concatenate([np.arange(global_n)[r] for r in rows])
        np.testing.assert_array_equal(got, np.arange(global_n))
        per = global_n // pc
        assert all(r.stop - r.start == per for r in rows)


def test_host_rows_requires_even_split():
    with pytest.raises(AssertionError):
        host_rows(10, 0, 4)


def test_host_rows_matches_device_shard_ownership():
    """Rows owned by process p via host_rows must be exactly the rows the
    'data' mesh axis places on p's devices: devices enumerate process-major,
    so contiguity in the mesh == contiguity in the batch."""
    devices = jax.devices("cpu")[:8]
    mesh = make_mesh(devices)
    x = np.arange(8 * 3, dtype=np.int32).reshape(8, 3)
    shards = {d: np.asarray(s.data)
              for s, d in [(s, s.device) for s in
                           shard_batch(mesh, {"x": jnp.asarray(x)})["x"]
                           .addressable_shards]}
    # simulate 4 processes of 2 devices each
    pc = 4
    for pi in range(pc):
        local_devices = devices[pi * 2:(pi + 1) * 2]
        via_mesh = np.concatenate([shards[d] for d in local_devices])
        via_host_rows = x[host_rows(8, pi, pc)]
        np.testing.assert_array_equal(via_mesh, via_host_rows)


def test_single_process_is_coordinator():
    assert jax.process_count() == 1
    assert is_coordinator()


def test_distributed_flags_parse():
    from idvs.morec_tpu.config import parse_args
    cfg = parse_args(["--distributed", "true",
                      "--coordinator_address", "10.0.0.1:1234",
                      "--num_processes", "4", "--process_id", "2"])
    assert cfg.distributed and cfg.coordinator_address == "10.0.0.1:1234"
    assert cfg.num_processes == 4 and cfg.process_id == 2
    # default: off, auto-detect
    assert not Config().distributed
