#!/usr/bin/env python3
"""Roofline / decomposition measurements for the fused mega-kernel.

Replaces the reference's Nsight Compute dossier (`rai_build.yml:43`, report
§4.3-4.6) with the TPU equivalents: steady-state throughput per dataset,
same-shape variant inputs that isolate pipeline stages (all-miss = stage-1
transform+AABB floor; all-hit = sweep dispatch + first-tile cost), and the
kernel's own work counters (gated/plane/interval tile counts), from which
the DESIGN.md roofline section is derived.

    python scripts/roofline.py [--chunk 16384] [--skip-counters]

Prints one JSON line per measurement.
"""
import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def bench(fn, runs=5):
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_async(dispatch, reps=8, runs=5):
    """True device rate: `reps` async dispatches, one block — the ~25 ms
    blocking link round trip amortizes to noise instead of polluting every
    sample (see DESIGN.md 'Measured roofline')."""
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
    ap.add_argument("--skip-counters", action="store_true",
                    help="skip the work-counter pass (extra kernel compile)")
    args = ap.parse_args()

    from robocheck_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    from robocheck_tpu.io import assets
    from robocheck_tpu.io.conf import read_conf_file
    from robocheck_tpu.io.obj import load_obj
    from robocheck_tpu.kernels.megakernel import MegaKernelChecker

    robot = load_obj(assets.alpha_robot_path())
    obstacle = load_obj(assets.alpha_obstacle_path())
    hard = read_conf_file(assets.dataset_path("hard100k"))
    easy = read_conf_file(assets.dataset_path("easy100k"))
    checker = MegaKernelChecker(
        robot, obstacle, interpret=jax.default_backend() != "tpu"
    )
    C = args.chunk

    t0 = time.perf_counter()
    checker.check_valid(hard.confs[:C], chunk=C)
    print(json.dumps({"measure": "compile_s",
                      "value": round(time.perf_counter() - t0, 1)}),
          flush=True)

    for name, confs, gold in [("hard100k", hard.confs, hard.valid),
                              ("easy100k", easy.confs, easy.valid)]:
        v, _ = checker.check_valid(confs, chunk=C)
        best = bench(lambda: checker.check_valid(confs, chunk=C))
        print(json.dumps({
            "measure": f"throughput_{name}",
            "checks_per_s": round(len(confs) / best, 0),
            "best_s": round(best, 4),
            "mismatches": int((v != gold).sum()),
        }), flush=True)

    # Same-compiled-shape variants that isolate stages, measured at the
    # true async device rate (pre-placed inputs, amortized round trip).
    import jax
    import jax.numpy as jnp

    from robocheck_tpu.kernels import megakernel as mk

    rng = np.random.default_rng(0)
    far = np.zeros((C, 6), np.float32)
    far[:, 0] = 1.0e9  # broad-phase miss: stage-1 + grid overhead only
    hit = np.zeros((C, 6), np.float32)  # identity pose: meshes interlock
    hit[:, 3:6] = rng.uniform(-np.pi, np.pi, (C, 3)).astype(np.float32)

    def packed_fn(confs_dev, sweep=True):
        return mk._check_block_packed(
            confs_dev, checker._obs_mesh, checker._obs_grp,
            checker._rob_base, checker._obs_t, checker._obs_aabb_rows,
            num_rob_tiles=checker.prep.num_rob_tiles,
            num_obs_tiles=checker.prep.num_obs_tiles,
            interpret=checker._interpret, sweep=sweep,
        )

    hard_dev = jax.device_put(hard.confs[:C])
    for name, confs in [("hard16k", None), ("allmiss", far),
                        ("allhit", hit)]:
        dev = hard_dev if confs is None else jax.device_put(confs)
        best = bench_async(lambda: packed_fn(dev))
        print(json.dumps({
            "measure": f"device_{name}",
            "checks_per_s": round(C / best, 0),
            "us_per_conf": round(best / C * 1e6, 3),
        }), flush=True)

    # Stage-1-only (sweep compiled out): the exact cost of poses + transform
    # + AABB + broad + gate precompute + epilogue on real hard data.
    best = bench_async(lambda: packed_fn(hard_dev, sweep=False))
    print(json.dumps({
        "measure": "device_hard_nosweep",
        "checks_per_s": round(C / best, 0),
        "us_per_conf": round(best / C * 1e6, 3),
    }), flush=True)

    if not args.skip_counters:

        out = np.asarray(checker.check_block(jnp.asarray(hard.confs[:C])))
        bh = out[:, 3] > 0
        print(json.dumps({
            "measure": "hard_counters",
            "n": C,
            "broad_hit_rate": round(float(bh.mean()), 4),
            "valid_rate": round(float(out[:, 0].mean()), 4),
            "mean_pairs_given_bh": round(float(out[bh, 2].mean()), 2),
            "mean_boxtest_tiles_given_bh": round(
                float((out[bh, 4] + out[bh, 5]).mean()), 2),
            "mean_plane_tiles_given_bh": round(float(out[bh, 4].mean()), 2),
            "mean_interval_tiles_given_bh": round(float(out[bh, 6].mean()), 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
