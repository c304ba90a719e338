#!/usr/bin/env python3
"""Bisect the mega-kernel's stage-1 cost with standalone mini-kernels that
reproduce its shapes and block structure one piece at a time. Temporary
diagnostic; results feed DESIGN.md's roofline section.

    python scripts/bisect_stage1.py
"""
import json
import sys
import time
from functools import partial
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

    from robocheck_tpu.io import assets
    from robocheck_tpu.io.obj import load_obj
    from robocheck_tpu.kernels.megakernel import (
        CONFS_PER_PROGRAM as CPB,
        MegaKernelPrep,
        poses_from_confs,
    )

    robot = load_obj(assets.alpha_robot_path())
    obstacle = load_obj(assets.alpha_obstacle_path())
    prep = MegaKernelPrep.build(robot, obstacle)
    B = 16384
    rng = np.random.default_rng(0)
    confs = rng.uniform(-1, 1, (B, 6)).astype(np.float32)
    LANE = 128
    tr = prep.rob_base.shape[1]

    rob_base = jnp.asarray(prep.rob_base)
    obs_t = jnp.asarray(prep.obs_t)
    obs_rows = jnp.asarray(prep.obs_aabb_rows)

    def bench(fn, *args, runs=5):
        jax.block_until_ready(fn(*args))
        best = 1e9
        for _ in range(runs):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    # XLA-side pieces first (no Pallas).
    pose_fn = jax.jit(poses_from_confs)
    t = bench(pose_fn, jnp.asarray(confs))
    print(json.dumps({"piece": "poses_from_confs_xla",
                      "us_per_conf": round(t / B * 1e6, 3)}), flush=True)

    big = jnp.zeros((B, LANE), jnp.int32)
    pack_fn = jax.jit(lambda o: (o[:, 0] | (o[:, 1] << 1)).astype(jnp.uint8))
    t = bench(pack_fn, big)
    print(json.dumps({"piece": "column_pack_xla",
                      "us_per_conf": round(t / B * 1e6, 3)}), flush=True)

    # Mini-kernels. All take (pose, rob_base, obs_t, obs_rows) with the same
    # block structure as the mega-kernel; `level` controls how much work.
    def mini_kernel(pose_ref, rob_base_ref, obs_t_ref, obs_rows_ref, out_ref,
                    rob_d, *, level):
        def pcol(k):
            return pose_ref[:, k : k + 1]

        acc = pose_ref[:, 0:1] * jnp.ones((CPB, LANE), jnp.float32)
        if level >= 1:  # corner transforms (54 ops on [CPB, tr])
            corners = []
            for c in range(3):
                X = rob_base_ref[3 * c + 0 : 3 * c + 1, :]
                Y = rob_base_ref[3 * c + 1 : 3 * c + 2, :]
                Z = rob_base_ref[3 * c + 2 : 3 * c + 3, :]
                px = pcol(0) * X + pcol(1) * Y + pcol(2) * Z + pcol(3)
                py = pcol(4) * X + pcol(5) * Y + pcol(6) * Z + pcol(7)
                pz = pcol(8) * X + pcol(9) * Y + pcol(10) * Z + pcol(11)
                corners += [px, py, pz]
            acc = acc + corners[0][:, :LANE]
        if level >= 2:  # masked AABB + lane reductions + broad flag
            tri_valid = rob_base_ref[9:10, :] > 0.0
            big_ = jnp.float32(3.0e38)
            broad = None
            for k in range(3):
                lo = jnp.minimum(jnp.minimum(corners[k], corners[3 + k]),
                                 corners[6 + k])
                hi = jnp.maximum(jnp.maximum(corners[k], corners[3 + k]),
                                 corners[6 + k])
                lo_m = jnp.where(tri_valid, lo, big_)
                hi_m = jnp.where(tri_valid, hi, -big_)
                mesh_lo = jnp.min(lo_m, axis=1, keepdims=True)
                mesh_hi = jnp.max(hi_m, axis=1, keepdims=True)
                ax = (mesh_lo <= 1.0) & (-1.0 <= mesh_hi)
                broad = ax if broad is None else (broad & ax)
            acc = acc + broad.astype(jnp.float32)
        if level >= 3:  # rob_d derived-field writes, [CPB, 24, Tr] layout
            for f in range(9):
                rob_d[:, f : f + 1, :] = corners[f][:, None, :]
            for k in range(3):
                rob_d[:, 13 + k : 14 + k, :] = corners[k][:, None, :]
                rob_d[:, 16 + k : 17 + k, :] = corners[3 + k][:, None, :]
            acc = acc + rob_d[:, 0, :LANE]
        if level >= 4:  # same writes, transposed [24, CPB, Tr] layout
            pass  # handled by mini_kernel_t below
        out_ref[...] = acc.astype(jnp.int32)

    def mini_kernel_t(pose_ref, rob_base_ref, obs_t_ref, obs_rows_ref,
                      out_ref, rob_d_t):
        def pcol(k):
            return pose_ref[:, k : k + 1]

        corners = []
        for c in range(3):
            X = rob_base_ref[3 * c + 0 : 3 * c + 1, :]
            Y = rob_base_ref[3 * c + 1 : 3 * c + 2, :]
            Z = rob_base_ref[3 * c + 2 : 3 * c + 3, :]
            px = pcol(0) * X + pcol(1) * Y + pcol(2) * Z + pcol(3)
            py = pcol(4) * X + pcol(5) * Y + pcol(6) * Z + pcol(7)
            pz = pcol(8) * X + pcol(9) * Y + pcol(10) * Z + pcol(11)
            corners += [px, py, pz]
        for f in range(9):
            rob_d_t[f] = corners[f]
        for k in range(3):
            rob_d_t[13 + k] = corners[k]
            rob_d_t[16 + k] = corners[3 + k]
        out_ref[...] = (corners[0][:, :LANE] + rob_d_t[0][:, :LANE]).astype(
            jnp.int32
        )

    def run_mini(level):
        kern = partial(mini_kernel, level=level)
        f = jax.jit(lambda poses: pl.pallas_call(
            kern,
            grid=(B // CPB,),
            in_specs=[
                pl.BlockSpec((CPB, 16), lambda i: (i, 0)),
                pl.BlockSpec((16, tr), lambda i: (0, 0)),
                pl.BlockSpec((obs_t.shape[0], obs_t.shape[1]),
                             lambda i: (0, 0)),
                pl.BlockSpec((6, obs_rows.shape[1]), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((CPB, LANE), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, LANE), jnp.int32),
            scratch_shapes=[pltpu.VMEM((CPB, 24, tr), jnp.float32)],
        )(poses, rob_base, obs_t, obs_rows))
        poses = pose_fn(jnp.asarray(confs))
        t = bench(f, poses)
        print(json.dumps({"piece": f"mini_level{level}",
                          "us_per_conf": round(t / B * 1e6, 3)}), flush=True)

    for level in (0, 1, 2, 3):
        run_mini(level)

    # Transposed scratch layout for the derived-field writes.
    f = jax.jit(lambda poses: pl.pallas_call(
        mini_kernel_t,
        grid=(B // CPB,),
        in_specs=[
            pl.BlockSpec((CPB, 16), lambda i: (i, 0)),
            pl.BlockSpec((16, tr), lambda i: (0, 0)),
            pl.BlockSpec((obs_t.shape[0], obs_t.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((6, obs_rows.shape[1]), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((CPB, LANE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((24, CPB, tr), jnp.float32)],
    )(poses, rob_base, obs_t, obs_rows))
    poses = pose_fn(jnp.asarray(confs))
    t = bench(f, poses)
    print(json.dumps({"piece": "mini_writes_transposed",
                      "us_per_conf": round(t / B * 1e6, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
