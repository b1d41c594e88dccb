"""Host-side orchestration: stream sequence bytes through device kernels.

Replaces the reference's ThreadPool-of-workers architecture
(``src/mash/ThreadPool.h``, ``Sketch.cpp:1147-1336``) with a streaming
chunk pipeline: sequences are concatenated with 0x00 separators, cut into
fixed-shape overlapping chunks, hashed and bottom-s-reduced on device, and
folded into a running sketch state with the associative merge.  Because the
fold is associative and commutative, the same code path scales from one
chip to a mesh (chunks sharded over devices, states merged collectively).
"""

from __future__ import annotations

import functools
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mash_tpu.core.params import SketchParams
from mash_tpu.core.sketch import SketchRef
from mash_tpu.ops import sketch_ops
from mash_tpu.ops.kmers import alphabet_bytes, hash_chunk
from mash_tpu.utils import stage

DEFAULT_CHUNK = 1 << 20
# Pad small inputs to one of these lengths to bound recompilation.
_BUCKETS = (1 << 12, 1 << 14, 1 << 16, 1 << 18, DEFAULT_CHUNK)


def chunk_stream(
    seqs: Iterable[bytes], k: int, chunk_len: int
) -> Iterator[Tuple[bytes, int]]:
    """Cut a stream of sequences into overlapping fixed-size chunks.

    Sequences are separated by a 0x00 byte (never in an alphabet, so
    cross-sequence windows are masked, like the reference ``screen``'s
    ``*`` separators).  Consecutive chunks overlap by k-1 bytes so no
    window is lost.  Yields ``(chunk_bytes, used_len)``; the final chunk
    may be shorter than ``chunk_len``.
    """
    buf = bytearray()
    step = chunk_len - (k - 1)
    assert step > 0
    first = True
    for seq in seqs:
        if not first:
            buf.append(0)
        first = False
        buf += seq
        while len(buf) >= chunk_len:
            yield bytes(buf[:chunk_len]), chunk_len
            del buf[:step]
    if len(buf) >= k:
        yield bytes(buf), len(buf)


class SketchEngine:
    """Compiled sketching pipeline for one parameter signature."""

    def __init__(
        self,
        params: SketchParams,
        chunk_len: int = DEFAULT_CHUNK,
        device: Optional[jax.Device] = None,
    ):
        self.params = params
        self.chunk_len = chunk_len
        self.device = device
        self._alpha = alphabet_bytes(params.alphabet)
        self._folds = {}

    # -- compiled steps ------------------------------------------------------

    def _fold_fn(self, length: int):
        """state, chunk[length] -> state, compiled per padded length."""
        if length in self._folds:
            return self._folds[length]
        p = self.params
        s = p.sketch_size

        batch_op = self._batch_op()

        @jax.jit
        def fold(state, chunk):
            sh, sc = batch_op(
                chunk[None],
                alphabet=self._alpha,
                k=p.kmer_size,
                seed=p.seed,
                use64=p.use64,
                noncanonical=p.noncanonical,
                preserve_case=p.preserve_case,
                s=s,
            )
            return sketch_ops.merge_states(
                state, (sh[0], sc[0]), s=s
            )

        self._folds[length] = fold
        return fold

    def _fold_batch_fn(self, rows: int, packed: bool = False):
        """state, chunks[rows, W] -> state (one compiled shape).

        With ``packed`` the rows are 2-bit+mask ingest rows (see
        ``ops.kmers.unpack_chunks``) reconstructed on device before
        hashing.  With several devices available (and no explicit device
        pin) the chunk rows are sharded over a 1-D mesh and per-device
        states are all_gather-merged — the fold is associative, so this
        is exact.
        """
        key = ("batch", rows, packed)
        if key in self._folds:
            return self._folds[key]
        p = self.params
        s = p.sketch_size
        chunk_len = self.chunk_len

        n_dev = len(jax.local_devices())
        if self.device is None and n_dev > 1 and rows % n_dev == 0:
            from mash_tpu.parallel import mesh as pmesh

            sharded = pmesh.make_sharded_sketch_fn(
                pmesh.default_mesh(), p, s,
                chunk_len=chunk_len if packed else None,
            )

            def fold(state, chunks):
                sh, sc = sharded(chunks)
                return sketch_ops.merge_states(state, (sh, sc), s=s)

            self._folds[key] = fold
            return fold

        batch_op = self._batch_op()

        @jax.jit
        def fold(state, chunks):
            if packed:
                from mash_tpu.ops.kmers import unpack_chunks

                chunks = unpack_chunks(chunks, chunk_len)
            sh, sc = batch_op(
                chunks,
                alphabet=self._alpha,
                k=p.kmer_size,
                seed=p.seed,
                use64=p.use64,
                noncanonical=p.noncanonical,
                preserve_case=p.preserve_case,
                s=s,
            )
            ch = jnp.concatenate([state[0][None], sh])
            cc = jnp.concatenate([state[1][None], sc])
            return sketch_ops.tree_merge(ch, cc, s=s)

        self._folds[key] = fold
        return fold

    def _batch_op(self):
        """chunks[B, L] -> states op, honoring an explicit device pin.

        The fused Pallas kernel only runs on TPU; an engine pinned to a
        non-TPU device (while the default backend is TPU) must take the
        plain XLA path, which compiles anywhere.
        """
        from mash_tpu.ops.pallas_sketch import sketch_chunks_auto

        if self.device is not None and self.device.platform != "tpu":
            p = self.params

            def xla_op(chunks, **_kw):
                h, v = hash_chunk(
                    chunks,
                    alphabet=self._alpha,
                    k=p.kmer_size,
                    seed=p.seed,
                    use64=p.use64,
                    noncanonical=p.noncanonical,
                    preserve_case=p.preserve_case,
                )
                return sketch_ops.sketch_chunk_batch(
                    h, v, s=p.sketch_size, use64=p.use64
                )

            return lambda chunks, **kw: xla_op(chunks)
        return sketch_chunks_auto

    def _bucket(self, n: int) -> int:
        for b in _BUCKETS:
            if n <= b:
                return b
        return ((n + self.chunk_len - 1) // self.chunk_len) * self.chunk_len

    # -- public API ----------------------------------------------------------

    def empty_state(self):
        return sketch_ops.empty_state(self.params.sketch_size)

    def fold_chunk(self, state, chunk: bytes):
        """Fold one raw chunk (any length >= k) into the sketch state."""
        if len(chunk) > self.chunk_len:
            # Keep compiled shapes bounded: rows beyond ~2M elements hit
            # an XLA scoped-VMEM limit in the cumsum lowering, and huge
            # one-off shapes each cost a fresh compile anyway.
            return self.fold_stream(
                state,
                chunk_stream([chunk], self.params.kmer_size, self.chunk_len),
            )
        bucket = self._bucket(len(chunk))
        if len(chunk) < bucket:
            chunk = chunk + b"\x00" * (bucket - len(chunk))
        arr = jnp.asarray(np.frombuffer(chunk, dtype=np.uint8))
        if self.device is not None:
            arr = jax.device_put(arr, self.device)
        return self._fold_fn(bucket)(state, arr)

    def fold_stream(self, state, chunks, batch_rows: int = 8):
        """Fold an iterator of (chunk_bytes, used_len) with row batching.

        Full-length chunks are stacked into ``[batch_rows, chunk_len]``
        device batches (one compiled program; ~3-4x cheaper per base than
        row-at-a-time folding); short tails are zero-padded — 0x00 is
        never in an alphabet, so padded windows are masked out.
        """
        rows = []
        fold = self._fold_batch_fn(batch_rows)
        for chunk, used in chunks:
            if used < self.chunk_len:
                chunk = chunk[:used] + b"\x00" * (self.chunk_len - used)
            rows.append(np.frombuffer(chunk, dtype=np.uint8))
            if len(rows) == batch_rows:
                with stage("engine:fold_batch"):
                    arr = jnp.asarray(np.stack(rows))
                    if self.device is not None:
                        arr = jax.device_put(arr, self.device)
                    state = fold(state, arr)
                rows = []
        if rows:
            zero = np.zeros(self.chunk_len, dtype=np.uint8)
            while len(rows) < batch_rows:
                rows.append(zero)
            with stage("engine:fold_batch"):
                arr = jnp.asarray(np.stack(rows))
                if self.device is not None:
                    arr = jax.device_put(arr, self.device)
                state = fold(state, arr)
        return state

    def fold_batches(self, state, batches, batch_rows: int,
                     packed: bool = False):
        """Fold ready ``[batch_rows, W]`` host batches (async).

        The fast-ingest counterpart of :meth:`fold_stream`: batches come
        pre-packed from :class:`mash_tpu.io.ingest.IngestPipeline`; each
        is dispatched as one async upload + fold so transfers and device
        compute overlap the background parsing.  Nothing blocks until
        the caller materializes the final state.
        """
        fold = self._fold_batch_fn(batch_rows, packed=packed)
        for arr in batches:
            with stage("engine:fold_batch"):
                dev = jax.device_put(arr, self.device)
                state = fold(state, dev)
        return state

    def sketch_seqs(self, seqs: Iterable[bytes]):
        """Sketch a stream of sequences into one bottom-s state."""
        state = self.empty_state()
        return self.fold_stream(
            state,
            chunk_stream(seqs, self.params.kmer_size, self.chunk_len),
        )

    def state_to_ref(
        self,
        state,
        name: str = "",
        comment: str = "",
        length: int = 0,
    ) -> SketchRef:
        """Materialize a device state into a host SketchRef."""
        h = np.asarray(state[0])
        c = np.asarray(state[1])
        n = int((c > 0).sum())
        return SketchRef(
            name=name,
            comment=comment,
            length=length,
            hashes=h[:n].astype(np.uint64),
            counts=c[:n].astype(np.uint32),
            counts_sorted=True,
        )

    def estimate_set_size(self, state) -> float:
        return sketch_ops.estimate_set_size(state, self.params.use64)

    def estimate_multiplicity(self, state) -> float:
        return sketch_ops.estimate_multiplicity(state)

    # -- exact streaming mode --------------------------------------------

    def _hash_fn(self, length: int):
        """chunk[length] -> (hashes, valid), compiled per padded length."""
        key = ("hash", length)
        if key in self._folds:
            return self._folds[key]
        p = self.params

        @jax.jit
        def fn(chunk):
            return hash_chunk(
                chunk,
                alphabet=self._alpha,
                k=p.kmer_size,
                seed=p.seed,
                use64=p.use64,
                noncanonical=p.noncanonical,
                preserve_case=p.preserve_case,
            )

        self._folds[key] = fn
        return fn

    def hash_bytes(self, data: bytes):
        """Hash one buffer on device; returns host numpy (hashes, valid)."""
        with stage("engine:hash_bytes"):
            h, v = self.hash_bytes_async(data)
            return np.asarray(h), np.asarray(v)

    def hash_bytes_async(self, data: bytes):
        """Dispatch hashing of one buffer; returns device arrays.

        Lets callers double-buffer: dispatch chunk i+1 before reading
        chunk i back (the exact-streaming path overlaps device hashing
        with the host-side heap insertion this way).
        """
        bucket = self._bucket(len(data))
        if len(data) < bucket:
            data = data + b"\x00" * (bucket - len(data))
        arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
        if self.device is not None:
            arr = jax.device_put(arr, self.device)
        return self._hash_fn(bucket)(arr)

    # -- windowed (minmer) mode --------------------------------------------

    def _windowed_hash_fn(self, length: int):
        """Forward-strand raw-byte hashing for windowed mode.

        ``getMinHashPositions`` (``Sketch.cpp:585-895``) hashes every
        forward k-mer of the raw sequence — no uppercase pass, no
        canonicalization, no invalid-k-mer skip (disabled in the
        reference), and always the 64-bit hash (``find`` hardcodes
        ``use64``, ``CommandFind.cpp:286``).
        """
        key = ("whash", length)
        if key in self._folds:
            return self._folds[key]
        p = self.params

        @jax.jit
        def fn(chunk):
            h, _ = hash_chunk(
                chunk,
                alphabet=(),
                k=p.kmer_size,
                seed=p.seed,
                use64=True,
                noncanonical=True,
                preserve_case=True,
            )
            return h

        self._folds[key] = fn
        return fn

    def windowed_positions(self, seq: bytes):
        """Minmer (positions, hashes) of one sequence (device + native)."""
        from mash_tpu.native import minmer_positions

        p = self.params
        k = p.kmer_size
        n = len(seq) - k + 1
        assert n >= 1

        def hash_piece(piece: bytes) -> np.ndarray:
            bucket = self._bucket(len(piece))
            data = piece + b"\x00" * (bucket - len(piece))
            arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8))
            if self.device is not None:
                arr = jax.device_put(arr, self.device)
            m = len(piece) - k + 1
            return np.asarray(self._windowed_hash_fn(bucket)(arr))[:m]

        if len(seq) <= self.chunk_len:
            h = hash_piece(seq)
        else:
            # chunk-sized pieces with k-1 overlap: the window hash at
            # position i depends only on bytes [i, i+k), so the
            # concatenated piece hashes equal the whole-sequence array
            # — one compiled shape instead of a fresh executable (and a
            # single giant readback) per distinct large-record size
            step = self.chunk_len - (k - 1)
            h = np.concatenate(
                [
                    hash_piece(seq[o : o + self.chunk_len])
                    for o in range(0, n, step)
                ]
            )[:n]
        pos, hh = minmer_positions(h, p.window_size, p.sketch_size)
        return pos, hh


# ---------------------------------------------------------------------------
# Record-level sketching with the reference's naming rules.
# ---------------------------------------------------------------------------

def sketch_records_exact(
    engine: SketchEngine,
    records,
    file_name: str,
    is_stdin: bool = False,
):
    """Exact-streaming variant of :func:`sketch_records_concat`.

    Hashing runs on device (record-packed chunks, no overlap), but
    bottom-s selection streams through the native ``ExactHeap`` in record
    order, reproducing the reference heap's order-dependent semantics:
    gated multiplicities, ``-m`` min-copy pending, ``-b`` Bloom
    filtering, and per-record ``-c`` target-coverage early stop
    (``Sketch.cpp:1256-1262``, ``MinHashHeap.cpp:68-146``).
    """
    from mash_tpu.native import ExactHeap

    p = engine.params
    k = p.kmer_size
    heap = ExactHeap(
        p.sketch_size,
        p.min_cov if p.reads else 1,
        p.memory_bound,
        p.use64,
    )
    count = 0
    total_len = 0
    name = "" if is_stdin else file_name
    comment = ""
    skipped = False
    stop = False

    buf = bytearray()
    bounds = []  # (window_start, window_count) per record in buf
    pending = None  # (h_dev, v_dev, bounds) — one chunk in flight

    def drain():
        """Read back the in-flight chunk and stream it into the heap."""
        nonlocal stop, count, pending
        if pending is None:
            return
        h_dev, v_dev, pbounds = pending
        pending = None
        h = np.asarray(h_dev)
        v = np.asarray(v_dev)
        for start, nwin, is_start in pbounds:
            if stop:
                break
            if is_start:
                # -c early stop is checked at record granularity, as
                # in the reference's per-read loop (Sketch.cpp:1258-62)
                if (
                    p.reads
                    and p.target_cov > 0
                    and count > 0
                    and heap.multiplicity() >= p.target_cov
                ):
                    stop = True
                    break
                count += 1
            hh = h[start : start + nwin]
            vv = v[start : start + nwin]
            heap.insert(hh[vv])

    def flush():
        # double-buffer: dispatch this chunk's hashing, then drain the
        # previous one while the device works
        nonlocal stop, count, pending
        if not buf:
            drain()
            return
        with stage("engine:hash_bytes"):
            h_dev, v_dev = engine.hash_bytes_async(bytes(buf))
        nxt = (h_dev, v_dev, list(bounds))
        buf.clear()
        bounds.clear()
        drain()
        pending = nxt

    for rec in records:
        if len(rec.seq) < k:
            skipped = True
            continue
        if count == 0 and pending is None and not bounds:
            if is_stdin:
                name = rec.name
                comment = rec.comment or ""
            else:
                comment = rec.name + " " + (rec.comment or "")
        if not p.reads:
            total_len += len(rec.seq)
        # records longer than the chunk split into chunk-sized pieces
        # with k-1 overlap: window order and count are preserved (the
        # overlap re-covers the boundary windows exactly once), and the
        # device only ever compiles/pads the single chunk-length shape
        # instead of one fresh executable per giant-record size
        seq = rec.seq
        if len(seq) <= engine.chunk_len:
            pieces = [seq]
        else:
            step = engine.chunk_len - (k - 1)
            pieces = [
                seq[o : o + engine.chunk_len]
                for o in range(0, len(seq) - k + 1, step)
            ]
        for pi, piece in enumerate(pieces):
            if buf and len(buf) + len(piece) + 1 > engine.chunk_len:
                flush()
                if stop:
                    break
            if buf:
                buf.append(0)
            start = len(buf)
            buf += piece
            bounds.append((start, len(piece) - k + 1, pi == 0))
        if stop:
            break
    if not stop:
        flush()
        drain()

    if p.reads:
        if p.genome_size != 0:
            total_len = p.genome_size
        else:
            total_len = int(heap.set_size())

    if count > 1:
        comment = "[%d seqs] %s [...]" % (count, comment)

    hashes, counts = heap.extract()
    from mash_tpu.core.sketch import SketchRef

    ref = SketchRef(
        name=name,
        comment=comment,
        length=total_len,
        hashes=hashes,
        counts=counts,
        counts_sorted=True,
    )
    return ref, heap, count, skipped


def sketch_records_individual(
    engine: SketchEngine,
    records,
    rows: int = 16,
    wave_bytes: int = 64 << 20,
    stats: dict | None = None,
):
    """Yield one SketchRef per record (len >= k), batched on device.

    The reference's individual mode parallelizes per sequence
    (``sketchFileBySequence``, ``Sketch.cpp:354``); here records of the
    same pad bucket are stacked ``rows`` per dispatch — one device
    round trip per batch instead of per record.  Records are buffered
    in waves of at most ``wave_bytes`` so output order is preserved
    with bounded memory; records longer than the engine chunk length
    fall back to the chunked per-record fold.
    """
    p = engine.params
    k = p.kmer_size
    s = p.sketch_size

    def batch_fn(bucket):
        key = ("indiv", bucket, rows)
        if key in engine._folds:
            return engine._folds[key]
        batch_op = engine._batch_op()

        @jax.jit
        def fn(chunks):
            return batch_op(
                chunks,
                alphabet=engine._alpha,
                k=p.kmer_size,
                seed=p.seed,
                use64=p.use64,
                noncanonical=p.noncanonical,
                preserve_case=p.preserve_case,
                s=s,
            )

        engine._folds[key] = fn
        return fn

    def make_ref(rec, h, c):
        return engine.state_to_ref(
            (h, c), rec.name, rec.comment or "", len(rec.seq)
        )

    wave = []
    wave_sz = 0

    def flush():
        nonlocal wave, wave_sz
        results = {}
        by_bucket = {}
        for i, rec in wave:
            if len(rec.seq) > engine.chunk_len:
                state = engine.sketch_seqs([rec.seq])
                results[i] = make_ref(
                    rec, np.asarray(state[0]), np.asarray(state[1])
                )
            else:
                b = engine._bucket(len(rec.seq))
                by_bucket.setdefault(b, []).append((i, rec))
        for b, items in by_bucket.items():
            fn = batch_fn(b)
            for g0 in range(0, len(items), rows):
                grp = items[g0 : g0 + rows]
                arr = np.zeros((rows, b), dtype=np.uint8)
                for r, (_i, rec) in enumerate(grp):
                    arr[r, : len(rec.seq)] = np.frombuffer(
                        rec.seq, dtype=np.uint8
                    )
                with stage("engine:indiv_batch"):
                    dev = jax.device_put(arr, engine.device)
                    sh, sc = fn(dev)
                    sh = np.asarray(sh)
                    sc = np.asarray(sc)
                for r, (i, rec) in enumerate(grp):
                    results[i] = make_ref(rec, sh[r], sc[r])
        for i in sorted(results):
            yield results[i]
        wave = []
        wave_sz = 0

    idx = 0
    for rec in records:
        if len(rec.seq) < k:
            # report skips so the caller can distinguish "all records
            # too short" from "no records at all" (concat path parity)
            if stats is not None:
                stats["skipped"] = True
            continue
        wave.append((idx, rec))
        wave_sz += len(rec.seq)
        idx += 1
        if wave_sz >= wave_bytes:
            yield from flush()
    yield from flush()


def sketch_records_concat(
    engine: SketchEngine,
    records,
    file_name: str,
    is_stdin: bool = False,
):
    """Sketch a whole file/stream of records into one SketchRef.

    Replicates ``sketchFile`` (``src/mash/Sketch.cpp:1147-1336``): records
    shorter than k are skipped; name is the file name (or the first record
    name for stdin); the comment is the first record's header, wrapped with
    "[N seqs] ... [...]" when several records contribute.
    """
    p = engine.params
    k = p.kmer_size
    state = engine.empty_state()
    count = 0
    total_len = 0
    name = "" if is_stdin else file_name
    comment = ""
    skipped = False

    def gen():
        nonlocal count, total_len, name, comment, skipped
        for rec in records:
            if len(rec.seq) < k:
                skipped = True
                continue
            if count == 0:
                if is_stdin:
                    name = rec.name
                    comment = rec.comment or ""
                else:
                    comment = rec.name + " " + (rec.comment or "")
            count += 1
            if not p.reads:
                total_len += len(rec.seq)
            yield rec.seq

    state = engine.fold_stream(
        state, chunk_stream(gen(), k, engine.chunk_len)
    )

    if p.reads:
        if p.genome_size != 0:
            total_len = p.genome_size
        else:
            total_len = int(engine.estimate_set_size(state))

    if count > 1:
        comment = "[%d seqs] %s [...]" % (count, comment)

    ref = engine.state_to_ref(state, name, comment, total_len)
    return ref, state, count, skipped
