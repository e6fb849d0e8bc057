"""Disk cache of PRE-COMPILED executables (PJRT level).

The axon compile service's latency is wildly variable (the same program
fresh-compiled in 8.8 s … 881 s across processes, CLAUDE.md quirks), and
its persistent *compilation* cache sometimes neither reads nor writes
for specific programs.  This module pins whole compiled executables to
disk via ``jax.experimental.serialize_executable`` — loading one is a
deserialization, not a compile, so it bypasses the compile service (and
its pathology) entirely.

Usage: ``cached_compile(key, jitted_fn, *args)`` returns a callable
``jax.stages.Compiled`` taking the DYNAMIC args only (static argnames
are baked in).  Enabled by setting ``NSGP_AOT_DIR`` to a directory;
without it, the call falls through to ``jitted_fn.lower(...).compile()``
with no disk round-trip.  Load failures (backend change, runtime
upgrade, API drift) silently fall back to a fresh compile and re-pin.

The reference has no counterpart — its CUDA kernels are precompiled by
construction; this is the TPU-native equivalent for a remote-compile
environment.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path
from typing import Any, Callable, Optional

import jax


def aot_dir() -> Optional[Path]:
    d = os.environ.get("NSGP_AOT_DIR")
    if not d:
        return None
    # Executable pinning exists to bypass the axon compile service; on the
    # CPU backend compiles are cheap AND XLA:CPU cross-process
    # deserialization is unreliable (the serializer records machine
    # features like +prefer-no-scatter the loading host rejects, then
    # execution dies with "Buffer Definition Event ... not found" —
    # observed 2026-08-17 when a leaked NSGP_AOT_DIR let CPU tests pin).
    # NSGP_AOT_CPU_OK=1 re-enables for tests of the pin mechanics.
    if jax.default_backend() == "cpu" and not os.environ.get("NSGP_AOT_CPU_OK"):
        return None
    return Path(d)


def _fingerprint(lowered) -> str:
    """Stable hash of the lowered program + backend, so a pinned
    executable is never applied to a different program or platform."""
    try:
        text = lowered.as_text()
    except Exception:
        text = repr(lowered)
    h = hashlib.sha256()
    h.update(jax.default_backend().encode())
    h.update(text.encode())
    return h.hexdigest()[:16]


def cached_compile(key: str, jitted_fn, *args, verbose: bool = True, **kwargs):
    """Compile ``jitted_fn`` at ``args`` (statics included), pinning the
    executable to ``$NSGP_AOT_DIR/<key>-<fingerprint>.jaxexec``.

    Returns a ``jax.stages.Compiled``; call it with the dynamic args only.
    """
    from jax.experimental import serialize_executable as se

    lowered = jitted_fn.lower(*args, **kwargs)
    d = aot_dir()
    if d is None:
        return lowered.compile()

    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{key}-{_fingerprint(lowered)}.jaxexec"
    if path.exists():
        try:
            payload, in_tree, out_tree, ndev = pickle.loads(path.read_bytes())
            # deserialize_and_load defaults to ALL backend devices; the
            # executable's device assignment must match its compile-time
            # count (e.g. 1-device programs under an 8-device test mesh)
            compiled = se.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:ndev],
            )
            if verbose:
                print(f"aot_cache: loaded {path.name} "
                      f"({path.stat().st_size/1e6:.2f} MB)", flush=True)
            return compiled
        except Exception as e:  # stale pin — recompile and overwrite
            if verbose:
                print(f"aot_cache: load of {path.name} failed ({e!r}); "
                      f"recompiling", flush=True)

    compiled = lowered.compile()
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        try:
            ndev = len(compiled._executable.xla_executable.local_devices())
        except Exception:
            ndev = 1
        path.write_bytes(pickle.dumps((payload, in_tree, out_tree, ndev)))
        if verbose:
            print(f"aot_cache: pinned {path.name} "
                  f"({path.stat().st_size/1e6:.2f} MB)", flush=True)
    except Exception as e:  # backend can't serialize — still usable live
        if verbose:
            print(f"aot_cache: serialization unsupported ({e!r}); "
                  f"running unpinned", flush=True)
    return compiled
