"""Multi-host helper semantics (single-process degenerate + allgather)."""

from __future__ import annotations

import numpy as np
import jax

from mash_tpu.ops import sketch_ops
from mash_tpu.parallel import multihost as mh


def test_shard_paths_and_ownership_single_process():
    paths = ["a", "b", "c", "d"]
    assert mh.process_count() == 1
    assert mh.shard_paths(paths) == paths
    assert all(mh.owns_stripe(i0, 64) for i0 in (0, 64, 4096))


def test_meta_and_scalar_reductions_degenerate():
    assert mh.reduce_meta_across_hosts(3, 10, False) == (3, 10, False)
    assert mh.max_across_hosts(0.25) == 0.25
    counts = np.arange(8, dtype=np.uint32)
    np.testing.assert_array_equal(
        mh.sum_counts_across_hosts(counts), counts
    )


def test_merge_states_identity_and_allgather_primitive():
    s = 32
    rng = np.random.default_rng(5)
    h = np.sort(
        rng.integers(0, 2**62, size=s, dtype=np.int64).astype(
            np.uint64
        )
    )
    c = np.ones(s, dtype=np.int64)
    state = (jax.numpy.asarray(h), jax.numpy.asarray(c))
    merged = mh.merge_states_across_hosts(state, s)
    np.testing.assert_array_equal(np.asarray(merged[0]), h)

    # the primitive the real N-host merge rides on works here too
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(h)
    assert g.reshape(-1).shape[0] % s == 0

    # and a two-state fold through the same tree_merge entry is exact
    h2 = np.sort(
        rng.integers(0, 2**62, size=s, dtype=np.int64).astype(
            np.uint64
        )
    )
    gh = jax.numpy.asarray(np.stack([h, h2]))
    gc = jax.numpy.asarray(np.ones((2, s), dtype=np.int64))
    mh_state = sketch_ops.tree_merge(gh, gc, s=s)
    exp = np.sort(np.unique(np.concatenate([h, h2])))[:s]
    np.testing.assert_array_equal(
        np.asarray(mh_state[0])[: len(exp)], exp
    )


def test_maybe_init_distributed_env_validation(monkeypatch):
    """Incomplete or inconsistent launch variables produce a clear
    diagnostic, not a bare KeyError / opaque runtime error."""
    import pytest

    from mash_tpu.parallel import multihost as mh

    monkeypatch.setenv("MASH_TPU_COORDINATOR", "localhost:1")
    monkeypatch.delenv("MASH_TPU_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("MASH_TPU_PROCESS_ID", raising=False)
    with pytest.raises(SystemExit, match="MASH_TPU_NUM_PROCESSES"):
        mh.maybe_init_distributed()

    monkeypatch.setenv("MASH_TPU_NUM_PROCESSES", "2")
    with pytest.raises(SystemExit, match="MASH_TPU_PROCESS_ID"):
        mh.maybe_init_distributed()

    monkeypatch.setenv("MASH_TPU_PROCESS_ID", "5")
    with pytest.raises(SystemExit, match="outside"):
        mh.maybe_init_distributed()


def test_maybe_init_distributed_pod_autodetect(monkeypatch):
    """With no MASH_TPU_* vars, a pod environment advertising multiple
    workers triggers jax.distributed auto-init; a single-worker (or
    absent) advertisement stays single-process without an init
    attempt."""
    import jax

    from mash_tpu.parallel import multihost as mh

    monkeypatch.delenv("MASH_TPU_COORDINATOR", raising=False)
    calls = []

    def fake_initialize(*a, **kw):
        calls.append((a, kw))

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)

    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert mh.maybe_init_distributed() is False
    assert calls == []

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0")
    assert mh.maybe_init_distributed() is False
    assert calls == []

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    assert mh.maybe_init_distributed() is True
    assert calls == [((), {})]  # no-arg auto-detection
