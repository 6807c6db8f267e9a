"""Axon-tunnel guards for TPU entry points (VERDICT r4 #8).

The dev tunnel to the real chip flaps: `import jax` + backend init then
blocks with NO error, sometimes for 10+ minutes (CLAUDE.md).  Driver-facing
entry points (bench.py, __graft_entry__) must fail FAST with a diagnostic
instead of hanging into the driver's timeout budget.  The reference has no
equivalent concern (local CUDA); this is tpu-deployment machinery.
"""

from __future__ import annotations

import json
import os
import sys
import time


def probe_backend(timeout_s: float | None = None,
                  emit_json: bool = True,
                  fatal: bool = True) -> str | None:
    """Initialize the JAX backend AND push one tiny jit through
    compile+execute+readback, in a daemon thread with a hard timeout.

    Returns the backend name on success.  On timeout or error, prints a
    diagnostic (a JSON `{"error": ...}` line on stdout when emit_json — NOT a
    benchmark record, so the driver can't mistake it for a 0-valued run — plus
    a plain line on stderr) and `os._exit(3)`s: a blocked backend-init thread
    cannot be cancelled, only abandoned.  With fatal=False it returns None
    instead of exiting (`tools doctor` reports rather than dies) — but the
    abandoned thread may still be latched inside backend init, so treat the
    process's jax as unusable afterwards.

    BENCH_SIMULATE_FLAP=1 forces the hang path so the guard is testable;
    BENCH_PROBE_TIMEOUT overrides the default 480 s TOTAL budget.  The
    budget is deliberately patient: the tunnel flaps on minute timescales
    (observed 2026-08-20: down ~50 min, up for ~3 min, down again), backend
    init completes the moment it recovers, and first contact with a
    recovering tunnel was measured at 64 s — a tight single-shot probe
    false-negatives a run that would have succeeded.  A heartbeat line
    prints to stderr every 30 s while waiting so a driver tail shows
    liveness.
    """
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", 480))
    result: dict = {}

    def probe():
        try:
            if os.environ.get("BENCH_SIMULATE_FLAP"):
                time.sleep(timeout_s + 3600)
            import jax

            backend = jax.default_backend()
            n = len(jax.devices())
            # backend init can succeed while compile/execute traffic hangs
            # (observed 2026-08-20: devices listed in 0.1 s, a 256x256 matmul
            # roundtrip blocked > 60 s) — push one tiny program through the
            # FULL compile+execute+readback path before declaring the tunnel
            # up
            import jax.numpy as jnp

            val = float(jax.jit(lambda x: x + 1)(jnp.float32(1)))
            assert val == 2.0, f"probe roundtrip returned {val}"
            result["backend"] = backend
            result["n_devices"] = n
        except Exception as e:  # noqa: BLE001 — diagnostic path
            result["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    deadline = time.monotonic() + timeout_s
    waited = 0.0
    while time.monotonic() < deadline and t.is_alive():
        t.join(min(30.0, max(deadline - time.monotonic(), 0.1)))
        waited = timeout_s - max(deadline - time.monotonic(), 0.0)
        if t.is_alive():
            print(f"backend probe: waiting for tunnel "
                  f"({waited:.0f}/{timeout_s:.0f}s)...",
                  file=sys.stderr, flush=True)
    if "backend" in result:
        print(f"backend probe: {result['backend']} "
              f"x{result['n_devices']} devices", file=sys.stderr, flush=True)
        return result["backend"]
    msg = result.get(
        "error",
        f"backend init or compile roundtrip did not return within "
        f"{timeout_s:.0f}s (axon tunnel down or degraded?)")
    if emit_json:
        print(json.dumps({"error": f"backend-probe: {msg}"}), flush=True)
    if not fatal:
        print(f"backend probe FAILED: {msg}", file=sys.stderr, flush=True)
        return None
    print(f"FATAL backend probe: {msg}", file=sys.stderr, flush=True)
    os._exit(3)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Persistent compiled-executable cache: re-runs of the same program
    (e.g. a driver retry after a timeout) skip minutes of single-core
    lowering.  Best-effort — never fails the caller.  Returns the cache dir
    actually configured (None on failure) so callers (`tools doctor`) report
    the directory jax is using rather than re-deriving it."""
    try:
        import jax

        if cache_dir is None:
            cache_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"compilation cache unavailable ({e!r})", file=sys.stderr,
              flush=True)
        return None
