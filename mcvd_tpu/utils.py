"""Runtime setup helpers."""

from __future__ import annotations

import os


def cpu_fingerprint() -> str:
    """Short hash of the host's CPU feature flags — cache-key component for
    XLA:CPU persistent compile caches (machine-specific AOT code must not be
    reused across VM generations with different features: SIGILL)."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "generic"


def setup_jax(cache_dir: str | None = None, enable_cache: bool = True) -> None:
    """Enable the persistent compilation cache (the axon TPU tunnel's compile
    latency is highly variable — 20s to 500s for identical programs — so
    on-disk caching matters a lot) and other global knobs."""
    import jax

    force_cpu = bool(os.environ.get("MCVD_FORCE_CPU"))
    if force_cpu:
        # The JAX_PLATFORMS env var alone does not win over a preset PJRT
        # plugin platform (CLAUDE.md); the config update does. Used by the
        # multi-process CPU tests to drive main.py end-to-end off-TPU.
        jax.config.update("jax_platforms", "cpu")
    if enable_cache:
        cache_dir = cache_dir or os.environ.get("MCVD_CACHE_DIR")
        if not cache_dir:
            # XLA:CPU caches machine-specific AOT code, and the home dir can
            # outlive VM generations with different CPU features — executing
            # a stale blob is a SIGILL/SIGSEGV. Key the default cache by the
            # host's CPU-feature fingerprint UNCONDITIONALLY: the resolved
            # backend isn't knowable here (setup_jax must run before
            # jax.distributed.initialize, so we can't probe it), jax can
            # fall back to CPU without any env spelling set, and TPU entries
            # lose nothing (platform is part of the cache key).
            cache_dir = os.path.expanduser(
                f"~/.cache/jax_comp_{cpu_fingerprint()}")
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass


def maybe_init_distributed() -> bool:
    """Env-gated multi-host SPMD launch (SURVEY §2.5 TPU plan; the reference
    is single-process DataParallel, ncsn_runner.py:266, and has no analog).

    Set MCVD_DIST=1 to call jax.distributed.initialize() before backend
    init. On a real TPU pod slice the coordinator/process topology is
    autodetected; elsewhere (and in the multi-process CPU tests) pass it
    explicitly via MCVD_COORDINATOR=host:port, MCVD_NUM_PROCESSES and
    MCVD_PROCESS_ID. After this returns True, jax.devices() is the GLOBAL
    device list and jax.process_count()/process_index() drive the per-host
    data sharding in the Runner.
    """
    if os.environ.get("MCVD_DIST", "") not in ("1", "true"):
        return False
    import jax

    try:
        # cross-process CPU collectives (no-op for TPU backends)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    kw = {}
    if os.environ.get("MCVD_COORDINATOR"):
        kw["coordinator_address"] = os.environ["MCVD_COORDINATOR"]
    if os.environ.get("MCVD_NUM_PROCESSES"):
        kw["num_processes"] = int(os.environ["MCVD_NUM_PROCESSES"])
    if os.environ.get("MCVD_PROCESS_ID"):
        kw["process_id"] = int(os.environ["MCVD_PROCESS_ID"])
    # Compile-skew hardening knobs (README "Multi-host"): processes can
    # arrive at init/exit minutes apart when their compile caches are
    # asymmetric, so the default timeouts are sized for the worst observed
    # compile (20-500s on axon, CLAUDE.md). The per-collective-program
    # rendezvous hazard is handled separately by parallel.mesh.lockstep.
    kw["initialization_timeout"] = int(
        os.environ.get("MCVD_DIST_INIT_TIMEOUT", "300"))
    kw["shutdown_timeout_seconds"] = int(
        os.environ.get("MCVD_DIST_SHUTDOWN_TIMEOUT", "900"))
    if os.environ.get("MCVD_DIST_HEARTBEAT_TIMEOUT"):
        kw["heartbeat_timeout_seconds"] = int(
            os.environ["MCVD_DIST_HEARTBEAT_TIMEOUT"])
    try:
        jax.distributed.initialize(**kw)
    except TypeError:
        # older jax without the timeout kwargs
        for k in ("initialization_timeout", "shutdown_timeout_seconds",
                  "heartbeat_timeout_seconds"):
            kw.pop(k, None)
        jax.distributed.initialize(**kw)
    # Create the all-devices communicator clique while processes are still
    # aligned at startup; later collectives (incl. orbax's internal
    # save/restore barriers, which lockstep cannot wrap) then reuse the
    # cached context instead of racing its ~30s init rendezvous.
    from .parallel.mesh import prime_collectives

    prime_collectives()
    return True


_DONATION_OK: bool | None = None


def donation_supported() -> bool:
    """Probe whether the backend accepts donated buffers (the axon TPU
    client historically raised InvalidArgument on donation — re-probed each
    round, tools/probe_axon.py; OK as of r3). Cached per process."""
    global _DONATION_OK
    if _DONATION_OK is None:
        import jax
        import jax.numpy as jnp

        try:
            f = jax.jit(lambda x: x + 1.0, donate_argnums=(0,))
            _ = float(jnp.sum(f(jnp.ones((8, 128)))))
            _DONATION_OK = True
        except Exception:
            _DONATION_OK = False
    return _DONATION_OK


def force_result(x) -> float:
    """Force full materialization of a device array and return sum as float.
    On the axon backend, block_until_ready() returns before execution
    finishes; a dependent host transfer is the only reliable barrier."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def start_stall_watchdog(heartbeat: dict, timeout_s: float, logger=None,
                         exit_code: int = 112, interval_s: float | None = None):
    """Hard-exit the process when the training loop stops making progress.

    TPU-production hardening with no reference analog: the axon backend can
    hang a dispatch indefinitely mid-run (observed r3: the step loop blocked
    >14min inside a device sync, after which the client reported the backend
    UNAVAILABLE). The loop is then wedged inside a blocking native call — no
    in-process recovery is possible — so a daemon thread watches a heartbeat
    the loop bumps after every real device barrier, and `os._exit(exit_code)`s
    once it goes stale for `timeout_s`. The segment-restart loop
    (example_scripts/train_*_production.sh) relaunches with
    --resume_training from the rolling checkpoint (crash-safe by
    construction — the same mechanism that handles the H2D staging leak).

    `heartbeat` is a mutable dict: {"t": time.monotonic(), "step": int,
    "suspended": bool}. Set "suspended" around legitimately-long blocking
    sections (in-training video_gen can run for hours); the timer restarts
    when resumed. Size `timeout_s` above the worst observed compile
    (20-500s on axon, CLAUDE.md) since the first barrier lands after the
    initial compile.
    """
    import os as _os
    import threading
    import time as _time

    interval = interval_s if interval_s is not None else min(
        30.0, max(1.0, timeout_s / 6))

    def _watch():
        while True:
            _time.sleep(interval)
            if heartbeat.get("suspended"):
                heartbeat["t"] = _time.monotonic()
                continue
            dt = _time.monotonic() - heartbeat["t"]
            if dt > timeout_s:
                if logger is not None:
                    logger.critical(
                        "stall watchdog: no training progress for %.0fs "
                        "(last step %s) — exiting %d so the restart loop "
                        "can resume from the checkpoint",
                        dt, heartbeat.get("step"), exit_code)
                    for h in getattr(logger, "handlers", []):
                        try:
                            h.flush()
                        except Exception:
                            pass
                _os._exit(exit_code)

    t = threading.Thread(target=_watch, daemon=True,
                         name="mcvd-stall-watchdog")
    t.start()
    return t
