"""Transfer-epoch management for the axon TPU tunnel.

The development/CI environment reaches its TPU through a remote tunnel
("axon") whose host->device transfer path has two regimes, measured in
``scripts/profile_tunnel.py``:

- **fresh epoch**: back-to-back ``jax.device_put`` sustains
  ~1.2-1.6 GiB/s;
- **post-readback**: after the first successful device->host fetch the
  H2D path permanently degrades to ~29 MiB/s for the remainder of the
  connection (any transfer size; it never recovers on its own).

The tunnel's client library exports ``axon_reset()`` which drops the
connection-level state and restores the fast H2D path.  The reset
invalidates every live device buffer (subsequent use raises
``FAILED_PRECONDITION: buffer allocated before axon reset``) but
compiled executables survive and run correctly on freshly uploaded
inputs.

``new_transfer_epoch()`` wraps this: callers invoke it at clean phase
boundaries — after all results of the previous phase have been read
back to host and before the next phase's uploads — to keep bulk
uploads on the fast path.  On real TPU pods (no tunnel) and on CPU it
is a no-op, so production code can call it unconditionally.

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
    """Start a fresh transfer epoch (restores fast H2D uploads).

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
