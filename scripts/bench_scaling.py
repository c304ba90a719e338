#!/usr/bin/env python3
"""Scaling-efficiency benchmark: checks/s at 1, 2, 4, ... devices.

On real multi-chip hardware this measures ICI-sharded throughput directly;
on a single-chip or CPU-only machine, pass --cpu-mesh to run the identical
SPMD program over virtual CPU devices (validates the sharding path and
reports relative scaling of the program structure, not absolute speed).

    python scripts/bench_scaling.py                  # real devices
    python scripts/bench_scaling.py --cpu-mesh 8     # 8 virtual CPU devices
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force N virtual CPU devices (0 = real devices)")
    ap.add_argument("--dataset", default="hard10k")
    ap.add_argument("--confs-per-device", type=int, default=4096)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    if args.cpu_mesh:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
        ).strip()

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from robocheck_tpu.io import assets
    from robocheck_tpu.io.conf import read_conf_file
    from robocheck_tpu.io.obj import load_obj
    from robocheck_tpu.parallel.sharding import ShardedChecker, make_mesh

    robot = load_obj(assets.alpha_robot_path())
    obstacle = load_obj(assets.alpha_obstacle_path())
    ds = read_conf_file(assets.dataset_path(args.dataset))
    interpret = jax.default_backend() != "tpu"

    n_dev_total = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev_total]
    results = {}
    base = None
    for n in sizes:
        checker = ShardedChecker(robot, obstacle, mesh=make_mesh(n),
                                 interpret=interpret)
        want = n * args.confs_per_device
        confs = np.resize(ds.confs, (want, 6)).astype(np.float32)
        checker.check_valid(confs)  # compile + warm
        best = min(
            _timed(checker, confs) for _ in range(args.runs)
        )
        cps = want / best
        eff = None
        if base is None:
            base = cps
        else:
            eff = cps / (base * n)
        results[n] = {"checks_per_s": round(cps, 1),
                      "scaling_efficiency": round(eff, 3) if eff else 1.0}
        print(f"{n} device(s): {cps:,.0f} checks/s"
              + (f", efficiency {eff:.1%}" if eff else ""))

    print(json.dumps({"devices": results,
                      "backend": jax.default_backend(),
                      "dataset": args.dataset}))
    return 0


def _timed(checker, confs) -> float:
    # Times the first-class streamed path (packed verdicts, chunked H2D).
    t0 = time.perf_counter()
    checker.check_valid(confs)
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
