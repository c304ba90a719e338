"""Multi-host runtime bootstrap.

Single-controller-per-host SPMD: every host runs the same program; JAX's
distributed runtime stitches the hosts' devices into one global device list.
The collision pipeline itself (`parallel/sharding.py`) is host-count
agnostic — it shards over whatever mesh it is given.

The reference has no multi-process story at all (every driver checks
``cudaGetDeviceCount`` and uses device 0, e.g. `broad-phase-fused.cu:367`);
this module plus `jax.distributed` is its replacement for scale-out.
"""
from __future__ import annotations

import os

import jax


def initialize_from_env() -> None:
    """Initialize `jax.distributed` when launched as a multi-host job.

    Reads the standard coordination env vars (COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID). Safe to call in single-process runs — it is
    a no-op unless the multi-host env vars are present. Must run before any
    backend-initializing JAX call (so this function itself touches no JAX
    state unless it actually initializes).
    """
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    if not (coord and nproc and pid):
        return
    try:
        # Probe for prior initialization via the internal client handle;
        # jax._src may move across releases, so failure of the probe only
        # means we fall through to initialize() and tolerate its
        # already-initialized error below.
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return  # already initialized
    except (ImportError, AttributeError):
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    except RuntimeError as e:
        # Swallow ONLY jax's double-init error ("distributed.initialize
        # should only be called once." / "already initialized"). Bare
        # "once"/"already" substrings used to match here, which silently
        # ate genuine failures like a coordinator bind error ("address
        # already in use") and left the process uninitialized.
        msg = str(e).lower()
        if ("called once" not in msg
                and "already initialized" not in msg):
            raise


def shard_bounds(total: int, process_index: int | None = None,
                 process_count: int | None = None) -> tuple[int, int]:
    """Per-host slice of a dataset of ``total`` rows: each host reads only its
    contiguous shard of the configuration file (multi-host data loading,
    SURVEY.md §7 'hard parts')."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = (total + pc - 1) // pc
    lo = min(pi * per, total)
    hi = min(lo + per, total)
    return lo, hi
