#!/usr/bin/env python3
"""Regenerate the benchmark datasets, including the 100k files that are
git-LFS-missing in the reference checkout (`.MISSING_LARGE_BLOBS`).

Generator semantics mirror `Utils_rai.cu:111-136` (easy = translations in
±10x the robot extent, hard = ±extent/200, all angles uniform in [-pi,pi]);
ground-truth tagging uses the double-precision oracle (native C++ when built)
in place of the reference's FCL pass (`generate-tests.cu:4-46`).

    python scripts/make_datasets.py [--sizes 100000] [--kinds easy hard]
"""
import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[100_000])
    ap.add_argument("--kinds", nargs="+", default=["easy", "hard"],
                    choices=["easy", "hard"])
    ap.add_argument("--seed", type=int, default=508)
    ap.add_argument("--out", default=str(REPO / "data"))
    args = ap.parse_args()

    from robocheck_tpu.io import assets
    from robocheck_tpu.io.conf import write_conf_file
    from robocheck_tpu.io.datagen import alpha_bot_configurations
    from robocheck_tpu.io.obj import load_obj
    from robocheck_tpu.oracle import check_configs

    robot = load_obj(assets.alpha_robot_path())
    obstacle = load_obj(assets.alpha_obstacle_path())
    os.makedirs(args.out, exist_ok=True)

    for size in args.sizes:
        for kind in args.kinds:
            name = f"{kind}_confs{size:,}.conf"
            out = Path(args.out) / name
            if out.exists():
                print(f"{out} exists, skipping")
                continue
            t0 = time.time()
            confs = alpha_bot_configurations(
                robot, size, hard=(kind == "hard"),
                seed=args.seed + (0 if kind == "easy" else 1) * 7919 + size,
            )
            valid = check_configs(robot, obstacle, confs)
            write_conf_file(out, confs, valid)
            dt = time.time() - t0
            print(
                f"wrote {out}: {size} confs, {int(valid.sum())} valid / "
                f"{int((~valid).sum())} invalid in {dt:.1f}s"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
