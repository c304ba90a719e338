"""Ground-truth oracles (the FCL stand-ins).

``check_configs`` dispatches to the native C++ oracle when the shared library
is built (``make -C native``; ~40x faster) and falls back to the NumPy
float64 implementation otherwise. Both implement identical semantics —
`tests/test_native.py` diff-tests them.
"""
from __future__ import annotations

import numpy as np

from ..core.types import Mesh
from . import cpu_oracle


def check_configs(
    robot: Mesh, obstacle: Mesh, confs: np.ndarray, prefer_native: bool = True
) -> np.ndarray:
    """Oracle verdicts: valid[N] bool, True = collision-free."""
    if prefer_native:
        from ..runtime import native

        if native.available():
            return native.oracle_check(
                robot.vertices, robot.triangles,
                obstacle.vertices, obstacle.triangles, confs,
            )
    return cpu_oracle.check_configs(robot, obstacle, confs)
