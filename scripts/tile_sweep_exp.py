#!/usr/bin/env python3
"""Tile-geometry / early-exit experiment grid for the gated sweep.

Round-3 optimization harness: measures the true async device rate of the
packed kernel on hard-dataset chunks for each (rob_tile, obs_tile,
inner_exit) variant, with a golden-verdict gate per variant. The winner
becomes the checker default.

    python scripts/tile_sweep_exp.py [--chunk 16384] [--variants rt,ot,ie ...]
"""
import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def bench_async(dispatch, reps=8, runs=5):
    import jax

    jax.block_until_ready(dispatch())
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = dispatch()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--valid-only", action="store_true")
    ap.add_argument("--invalid-only", action="store_true")
    ap.add_argument("--counters", action="store_true")
    ap.add_argument("--variants", nargs="*", default=[
        "128,128,1,2", "128,128,1,1", "128,128,1,0", "128,128,0,2",
    ])
    args = ap.parse_args()

    from robocheck_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    from robocheck_tpu.io import assets
    from robocheck_tpu.io.conf import read_conf_file
    from robocheck_tpu.io.obj import load_obj
    from robocheck_tpu.kernels import megakernel as mk

    robot = load_obj(assets.alpha_robot_path())
    obstacle = load_obj(assets.alpha_obstacle_path())
    hard = read_conf_file(assets.dataset_path("hard100k"))
    C = args.chunk
    if args.valid_only:
        sel = np.nonzero(hard.valid)[0][:C]
        confs = hard.confs[sel]
        gold = hard.valid[sel]
    elif args.invalid_only:
        sel = np.nonzero(~hard.valid)[0][:C]
        confs = hard.confs[sel]
        gold = hard.valid[sel]
    else:
        confs = hard.confs[:C]
        gold = hard.valid[:C]
    interpret = jax.default_backend() != "tpu"

    for spec in args.variants:
        parts = [float(x) for x in spec.split(",")]
        rt, ot, ie = (int(p) for p in parts[:3])
        cap = int(parts[3]) if len(parts) > 3 else 2
        hot = float(parts[4]) if len(parts) > 4 else 1024.0
        t0 = time.perf_counter()
        ck = mk.MegaKernelChecker(robot, obstacle, interpret=interpret,
                                  rob_tile=rt, obs_tile=ot)

        def packed(dev, ck=ck, ie=ie, cap=cap, hot=hot):
            return mk._check_block_packed(
                dev, ck._obs_mesh, ck._obs_grp, ck._rob_base, ck._obs_t,
                ck._obs_aabb_rows,
                num_rob_tiles=ck.prep.num_rob_tiles,
                num_obs_tiles=ck.prep.num_obs_tiles,
                rob_tile=rt, obs_tile=ot, inner_exit=bool(ie),
                stage_cap=cap, hot_thresh=hot,
                interpret=interpret,
            )

        dev = jax.device_put(confs)
        packed(dev).block_until_ready()
        compile_s = time.perf_counter() - t0
        out = np.asarray(packed(dev))
        mism = int(((out & 1).astype(bool) != gold).sum())
        best = bench_async(lambda: packed(dev))
        print(json.dumps({
            "rt": rt, "ot": ot, "inner_exit": bool(ie), "stage_cap": cap,
            "hot": hot,
            "checks_per_s": round(C / best, 0),
            "us_per_conf": round(best / C * 1e6, 3),
            "mismatches": mism,
            "compile_s": round(compile_s, 1),
        }), flush=True)
        if args.counters:
            import jax.numpy as jnp
            out = np.asarray(ck.check_block(jnp.asarray(confs)))
            bh = out[:, 3] > 0
            print(json.dumps({
                "counters": True, "broad_hit_rate": round(float(bh.mean()), 4),
                "mean_pairs_bh": round(float(out[bh, 2].mean()), 2),
                "mean_gated_bh": round(float((out[bh, 4] + out[bh, 5]).mean()), 2),
                "mean_plane_bh": round(float(out[bh, 4].mean()), 2),
                "mean_interval_bh": round(float(out[bh, 6].mean()), 2),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
