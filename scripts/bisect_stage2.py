#!/usr/bin/env python3
"""Bisect round 2: what makes an *empty* mega-kernel-shaped grid cost
~47 us/program? Vary the invariant (constant-index-map) inputs, the batch
size, and the scratch allocation independently.

    python scripts/bisect_stage2.py
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    from robocheck_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CPB = 32
    LANE = 128
    TR = 1024

    rng = np.random.default_rng(0)
    rob_base = jnp.asarray(rng.normal(size=(16, TR)).astype(np.float32))
    obs_t = jnp.asarray(rng.normal(size=(TR, 24)).astype(np.float32))
    obs_rows = jnp.asarray(rng.normal(size=(6, TR)).astype(np.float32))

    def bench(fn, *args, runs=5):
        jax.block_until_ready(fn(*args))
        best = 1e9
        for _ in range(runs):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def report(name, t, b):
        print(json.dumps({
            "piece": name,
            "us_per_conf": round(t / b * 1e6, 3),
            "us_per_program": round(t / (b // CPB) * 1e6, 2),
        }), flush=True)

    def run(name, b, with_rob=False, with_obs=False, with_rows=False,
            scratch=False, cpb=CPB):
        in_specs = [pl.BlockSpec((cpb, 16), lambda i: (i, 0))]
        operands = []
        if with_rob:
            in_specs.append(pl.BlockSpec((16, TR), lambda i: (0, 0)))
            operands.append(rob_base)
        if with_obs:
            in_specs.append(pl.BlockSpec((TR, 24), lambda i: (0, 0)))
            operands.append(obs_t)
        if with_rows:
            in_specs.append(pl.BlockSpec((6, TR), lambda i: (0, 0)))
            operands.append(obs_rows)

        def kern(pose_ref, *rest):
            out_ref = rest[-2] if scratch else rest[-1]
            out_ref[...] = (
                pose_ref[:, 0:1] * jnp.ones((cpb, LANE), jnp.float32)
            ).astype(jnp.int32)

        f = jax.jit(lambda poses: pl.pallas_call(
            kern,
            grid=(b // cpb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((cpb, LANE), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((b, LANE), jnp.int32),
            scratch_shapes=(
                [pltpu.VMEM((cpb, 24, TR), jnp.float32)] if scratch else []
            ),
        )(poses, *operands))
        poses = jnp.asarray(rng.normal(size=(b, 16)).astype(np.float32))
        report(name, bench(f, poses), b)

    B = 16384
    run("pose_only", B)
    run("pose_only_scratch", B, scratch=True)
    run("pose+rob", B, with_rob=True)
    run("pose+obs", B, with_obs=True)
    run("pose+rows", B, with_rows=True)
    run("all_inputs", B, with_rob=True, with_obs=True, with_rows=True,
        scratch=True)
    run("pose_only_B65536", 65536)
    run("pose_only_B4096", 4096)
    run("pose_only_cpb8", B, cpb=8)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
