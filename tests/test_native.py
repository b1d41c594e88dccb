"""Native runtime: exact heap semantics, parser parity, exact CLI modes."""

import numpy as np
import pytest

from mash_tpu.native import ExactHeap, load_library
from mash_tpu.native.pyheap import PyExactHeap


def test_native_library_builds():
    assert load_library() is not None, "g++ build of native lib failed"


def _random_stream(rng, n, space):
    return rng.integers(0, space, size=n, dtype=np.int64).astype(np.uint64)


@pytest.mark.parametrize("min_cov", [1, 2, 3])
def test_native_matches_python_heap(min_cov):
    rng = np.random.default_rng(min_cov)
    stream = _random_stream(rng, 5000, 500)  # many duplicates
    nat = ExactHeap(32, min_cov, 0)
    py = PyExactHeap(32, min_cov, 0)
    nat.insert(stream)
    py.insert(stream)
    nh, nc = nat.extract()
    ph, pc = py.extract()
    np.testing.assert_array_equal(nh, ph)
    np.testing.assert_array_equal(nc, pc)
    assert nat.size == py.size
    assert nat.top == py.top
    assert nat.multiplicity() == pytest.approx(py.multiplicity())


def test_heap_set_matches_batch_fold():
    """For min_cov=1 the exact heap's SET equals the batch bottom-s."""
    import jax.numpy as jnp

    from mash_tpu.ops import sketch_ops

    rng = np.random.default_rng(7)
    stream = _random_stream(rng, 4000, 10**6)
    heap = ExactHeap(64, 1, 0)
    heap.insert(stream)
    hh, _ = heap.extract()

    st = sketch_ops.sketch_chunk(
        jnp.asarray(stream), jnp.ones(len(stream), bool), s=64
    )
    bh = np.asarray(st[0])
    bc = np.asarray(st[1])
    np.testing.assert_array_equal(hh, bh[bc > 0])


def test_heap_top_boundary_duplicate_not_counted():
    """An occurrence equal to the current max of a FULL heap is ignored
    (``MinHashHeap.cpp:68-74``), unlike total-occurrence counting."""
    heap = ExactHeap(2, 1, 0)
    heap.insert(np.array([10, 20], dtype=np.uint64))  # full, top=20
    heap.insert(np.array([20], dtype=np.uint64))  # == top -> ignored
    heap.insert(np.array([10], dtype=np.uint64))  # < top -> counted
    h, c = heap.extract()
    np.testing.assert_array_equal(h, [10, 20])
    np.testing.assert_array_equal(c, [2, 1])


def test_heap_min_cov_gating():
    heap = ExactHeap(4, 2, 0)
    heap.insert(np.array([5], dtype=np.uint64))
    assert heap.size == 0  # pending until second copy
    heap.insert(np.array([5], dtype=np.uint64))
    assert heap.size == 1
    h, c = heap.extract()
    np.testing.assert_array_equal(h, [5])
    np.testing.assert_array_equal(c, [2])


def test_heap_bloom_mode():
    heap = ExactHeap(4, 1, 1 << 16)
    heap.insert(np.array([9, 9, 9], dtype=np.uint64))
    h, c = heap.extract()
    np.testing.assert_array_equal(h, [9])
    # first copy absorbed by the bloom filter; enters with count 2, then +1
    np.testing.assert_array_equal(c, [3])


def test_exact_cli_min_cov(tmp_path, reference_test_dir):
    """sketch -r -m 2 runs the exact path end to end."""
    import contextlib
    import io

    from mash_tpu.__main__ import main

    out_path = str(tmp_path / "m2.msh")
    rc = main(
        [
            "sketch",
            "-r",
            "-M",
            "-m",
            "2",
            "-I",
            "reads",
            str(reference_test_dir / "reads1.fastq"),
            str(reference_test_dir / "reads2.fastq"),
            "-o",
            out_path,
        ]
    )
    assert rc == 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["info", "-t", out_path]) == 0
    line = buf.getvalue().splitlines()[1].split("\t")
    assert line[2] == "reads"

    # the min-copy filter must change the selected hash set vs plain -r
    from mash_tpu.io import capnp_msh

    plain = str(tmp_path / "m1.msh")
    assert (
        main(
            [
                "sketch",
                "-r",
                "-I",
                "reads",
                str(reference_test_dir / "reads1.fastq"),
                str(reference_test_dir / "reads2.fastq"),
                "-o",
                plain,
            ]
        )
        == 0
    )
    m2 = capnp_msh.read_msh(out_path).references[0]
    m1 = capnp_msh.read_msh(plain).references[0]
    assert not np.array_equal(m2.hashes, m1.hashes)
    # every hash selected under -m 2 has multiplicity >= 2
    assert m2.counts is not None and (m2.counts >= 2).all()


def test_exact_counts_histogram(tmp_path, reference_test_dir):
    """sketch -M stores gated multiplicities readable by info -c."""
    import contextlib
    import io

    from mash_tpu.__main__ import main

    out_path = str(tmp_path / "counted.msh")
    rc = main(
        [
            "sketch",
            "-M",
            str(reference_test_dir / "reads1.fastq"),
            "-o",
            out_path,
        ]
    )
    assert rc == 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["info", "-c", out_path]) == 0
    lines = buf.getvalue().splitlines()
    assert lines[0] == "#Sketch\tBin\tFrequency"
    assert len(lines) > 1
    total = sum(int(l.split("\t")[2]) for l in lines[1:])
    assert total == 1000


def test_dist_zero_zero_pair_is_distance_zero():
    """common == denom is checked FIRST (CommandDistance.cpp:389): two
    empty sketches (0/0) are distance 0, in both the native formatter
    and the numpy path."""
    import numpy as np

    from mash_tpu.core import stats
    from mash_tpu.native import DistFormatter

    fmt = DistFormatter(21, 1000)
    out = fmt.phylip_cells(np.array([0], dtype=np.uint32))
    assert out == b"\t0"

    d = stats.mash_distance_array(
        np.array([0, 0, 5]), np.array([0, 7, 5]), 21
    )
    np.testing.assert_array_equal(d, [0.0, 1.0, 0.0])
    assert stats.mash_distance(0, 0, 21) == 0.0
