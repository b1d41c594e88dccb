"""Connection-state hook for the axon TPU tunnel.

The development/CI environment reaches its TPU through a remote tunnel
("axon").  Round 3 believed the tunnel's H2D path had a fast regime
(~1.2-1.6 GiB/s) that a device->host readback permanently degraded
~40x, and that ``axon_reset()`` restored it.  Round 4's honest
re-measurement (every timing forced to a scalar fetch that
data-depends on the outputs — ``jax.block_until_ready`` is an async
ACK on this tunnel and returns before remote execution) **retracted
that model**: the H2D path is simply a ~20-38 MiB/s link with no
fast/slow regimes; resets and prior readbacks change nothing.  See
``docs/tpu-design.md`` ("The dev tunnel, measured honestly") and
``scripts/profile_tunnel.py``.

``new_transfer_epoch()`` is therefore **not a performance mechanism**.
It is retained as a no-op-safe hygiene hook around the tunnel's
``axon_reset()`` (drops connection-level state; invalidates every live
device buffer — subsequent use raises ``FAILED_PRECONDITION`` — while
compiled executables survive).  Callers only invoke it at clean phase
boundaries where no device state is live.  On real TPU pods (no
tunnel) and on CPU it is a no-op, so production code can call it
unconditionally.

This is infrastructure for the *development tunnel only*; nothing in
the sketching algorithms depends on it.  The reference codebase has no
equivalent concern (host-resident compute, ``src/mash/ThreadPool.h``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_SO_PATH = "/opt/axon/libaxon_pjrt.so"

_lib: Optional[ctypes.CDLL] = None
_checked = False


def _load() -> Optional[ctypes.CDLL]:
    """The tunnel client library, or None when not running under it."""
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if os.environ.get("MASH_TPU_NO_EPOCH_RESET"):
        return None
    try:
        import jax

        if jax.default_backend() not in ("tpu",):
            return None
        if not os.path.exists(_SO_PATH):
            return None
        # The process already holds this library (it is the PJRT
        # plugin); CDLL returns the same handle without re-loading.
        lib = ctypes.CDLL(_SO_PATH)
        fn = getattr(lib, "axon_reset", None)
        if fn is None:
            return None
        fn.restype = ctypes.c_int
        fn.argtypes = []
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    """True when transfer-epoch resets are possible (axon tunnel)."""
    return _load() is not None


def new_transfer_epoch() -> bool:
    """Drop the tunnel's connection-level state (hygiene hook only —
    NOT a performance mechanism; see the module docstring).

    DANGER: every live device buffer dies.  Call only at phase
    boundaries where all device state has been read back (or can be
    re-created).  Compiled executables survive.

    Returns True when a reset actually happened, False when running
    without the tunnel (no-op).
    """
    lib = _load()
    if lib is None:
        return False
    try:
        return int(lib.axon_reset()) == 0
    except Exception:
        return False
