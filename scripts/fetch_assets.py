#!/usr/bin/env python3
"""Copy the benchmark assets (alpha-puzzle meshes + tagged .conf datasets)
from a reference checkout into this repository's models/ and data/ dirs.

These are data files (Parasol alpha-puzzle benchmark meshes and the
FCL-tagged configuration datasets), not code. Run once:

    python scripts/fetch_assets.py [--reference /root/reference]
"""
import argparse
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

MESHES = [
    "models/alpha1.0/robot.obj",
    "models/alpha1.0/obstacle.obj",
    "models/alpha1.0/alpha.env",
    "models/alpha1.0/alpha.query",
    "models/alpha1.0/README.txt",
]
DATASETS = [
    "easy_confs10,000.conf",
    "hard_confs10,000.conf",
    "10,000samples.conf",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    ref = Path(args.reference)
    if not ref.exists():
        print(f"reference checkout not found at {ref}", file=sys.stderr)
        return 1

    for rel in MESHES:
        src = ref / rel
        dst = REPO / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst)
        print(f"copied {src} -> {dst}")
    for name in DATASETS:
        src = ref / name
        dst = REPO / "data" / name
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst)
        print(f"copied {src} -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
