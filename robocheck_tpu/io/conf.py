"""Configuration-file IO.

Text format of the reference datasets (`Utils_rai.cu:11-109`):

    There are <V> valid configurations and <I> invalid configurations
    x y z pitch yaw roll valid
    ...

``valid`` is 0/1; True means collision-free. Readers tolerate a missing tag
column (untagged files). Large files can route through the native C++ parser
(`io/native.py`); this NumPy path is the portable fallback and the format
reference.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np


class TaggedConfs(NamedTuple):
    confs: np.ndarray  # [N, 6] float32: x y z pitch yaw roll
    valid: np.ndarray | None  # [N] bool, or None if the file was untagged

    @property
    def num_valid(self) -> int:
        return 0 if self.valid is None else int(self.valid.sum())


def read_conf_file(path: str | os.PathLike) -> TaggedConfs:
    with open(path, "r") as f:
        first = f.readline()
        # Header line is free text with counts; data rows are 6 or 7 numbers.
        data = np.loadtxt(f, dtype=np.float64, ndmin=2)
    if not first.lower().startswith("there are"):
        # No header — re-parse including the first line.
        rows = [list(map(float, first.split()))] if first.strip() else []
        body = data.tolist() if data.size else []
        data = np.asarray(rows + body, dtype=np.float64)

    if data.size == 0:
        return TaggedConfs(np.zeros((0, 6), np.float32), np.zeros((0,), bool))
    if data.shape[1] == 7:
        return TaggedConfs(
            data[:, :6].astype(np.float32), data[:, 6].astype(bool)
        )
    if data.shape[1] == 6:
        return TaggedConfs(data.astype(np.float32), None)
    raise ValueError(f"unexpected column count {data.shape[1]} in {path}")


def write_conf_file(
    path: str | os.PathLike, confs: np.ndarray, valid: np.ndarray | None = None
) -> None:
    """Write a (tagged) configuration file in the reference format
    (`Utils_rai.cu:11-41`: header with valid/invalid counts, %g-style floats).
    """
    confs = np.asarray(confs)
    n = confs.shape[0]
    if valid is None:
        valid = np.zeros((n,), dtype=bool)
    nv = int(np.asarray(valid).sum())
    with open(path, "w") as f:
        f.write(
            f"There are {nv} valid configurations and {n - nv} invalid configurations\n"
        )
        for i in range(n):
            row = " ".join(f"{float(v):g}" for v in confs[i, :6])
            f.write(f"{row} {int(valid[i])}\n")
