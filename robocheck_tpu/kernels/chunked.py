"""Oversized-mesh support: chunked fused checking + automatic dispatch.

The fused mega-kernel keeps both mesh tables plus per-configuration derived
fields resident in VMEM, which caps mesh sizes (the reference had the same
wall in constant memory — capacity constants `Utils_rai.h:98-99` — and simply
couldn't load bigger models). Here the wall becomes a split: either mesh is
cut into Morton-ordered triangle chunks, each (robot-chunk x obstacle-chunk)
pair runs the ordinary fused kernel, and verdicts combine exactly —

    collision(robot, obstacle) == any over chunk pairs of collision(rc, oc)

because triangle sets partition and the tri-tri predicate is per-pair. So
``valid`` ANDs, ``coplanar``/``broad`` OR, ``num_pairs`` sums.

``make_checker`` is the public entry: it returns a plain
:class:`MegaKernelChecker` whenever the pair fits the VMEM budget and a
:class:`ChunkedMegaKernelChecker` otherwise — any mesh size checks correctly
through one API.
"""
from __future__ import annotations

import numpy as np

from ..core.types import Mesh
from ..utils.morton import morton_argsort
from .megakernel import MegaKernelChecker, VmemBudgetError

# Chunk caps chosen so a (robot-chunk, obstacle-chunk) pair always fits the
# fused kernel's VMEM budget (see MegaKernelPrep.build): rob_d scratch
# 32 * 24 * 2048 * 4 B ~= 6.3 MB + obs table 8192 * 512 B ~= 4.2 MB < 12 MB.
MAX_ROB_TRIS = 2048
MAX_OBS_TRIS = 8192


def split_mesh(mesh: Mesh, max_tris: int) -> list[Mesh]:
    """Split into Morton-ordered contiguous triangle chunks (spatially tight,
    which keeps each chunk's AABB — and so the broad phase — effective)."""
    t = mesh.num_triangles
    if t <= max_tris:
        return [mesh]
    centroids = mesh.triangle_vertices.mean(axis=1)
    order = morton_argsort(centroids)
    n_chunks = -(-t // max_tris)
    per = -(-t // n_chunks)
    chunks = []
    for k in range(n_chunks):
        idx = order[k * per : (k + 1) * per]
        chunks.append(
            Mesh(mesh.vertices, mesh.triangles[idx],
                 name=f"{mesh.name}[{k}]")
        )
    return chunks


class ChunkedMegaKernelChecker:
    """Fused checking for mesh pairs beyond the single-kernel VMEM budget.

    API-compatible with :class:`MegaKernelChecker` (``check``,
    ``check_valid``). ``check_valid`` compacts per chunk pair: each
    sub-checker's cheap XLA broad phase (bit-identical to its kernel's
    stage 1) selects only the configurations whose robot AABB overlaps THAT
    chunk's obstacle box, so throughput scales with surviving work rather
    than with n_rob_chunks * n_obs_chunks — Morton-tight chunk AABBs are
    what make the per-chunk cull effective. Verdicts are exactly the
    uncompacted ones: a configuration skipped for a chunk pair would have
    exited at that kernel's in-kernel broad phase anyway.

    Pass ``mesh=`` (a `jax.sharding.Mesh`) to run every chunk pair through
    a batch-sharded :class:`parallel.sharding.ShardedChecker` — oversized
    meshes and multi-chip sharding compose.
    """

    def __init__(self, robot: Mesh, obstacle: Mesh, morton: bool = True,
                 interpret: bool = False,
                 max_rob_tris: int = MAX_ROB_TRIS,
                 max_obs_tris: int = MAX_OBS_TRIS,
                 mesh=None):
        self.robot = robot
        self.obstacle = obstacle
        if mesh is not None:
            from ..parallel.sharding import ShardedChecker

            def build(r, o):
                return ShardedChecker(r, o, mesh=mesh, morton=morton,
                                      interpret=interpret)
        else:
            def build(r, o):
                return MegaKernelChecker(r, o, morton=morton,
                                         interpret=interpret)
        self.checkers = [
            build(r, o)
            for r in split_mesh(robot, max_rob_tris)
            for o in split_mesh(obstacle, max_obs_tris)
        ]

    @property
    def num_chunk_pairs(self) -> int:
        return len(self.checkers)

    def check_valid(self, confs: np.ndarray, chunk: int | None = None,
                    compact: bool = True):
        n = np.asarray(confs).shape[0]
        valid = np.ones((n,), dtype=bool)
        coplanar = np.zeros((n,), dtype=bool)
        for ck in self.checkers:
            if compact:
                hits = np.asarray(ck.broad_block(np.asarray(
                    confs, dtype=np.float32)))
                idx = np.nonzero(hits)[0]
                if not idx.size:
                    continue
                v, c = ck.check_valid(confs[idx], chunk=chunk)
                valid[idx] &= v
                coplanar[idx] |= c
            else:
                v, c = ck.check_valid(confs, chunk=chunk)
                valid &= v
                coplanar |= c
        return valid, coplanar

    def check_valid_resolved(self, confs: np.ndarray,
                             chunk: int | None = None) -> np.ndarray:
        """``check_valid`` + float64 resolution of coplanar-flagged
        configurations (see `oracle.resolve_coplanar`), against the FULL
        (unchunked) mesh pair."""
        from ..oracle import resolve_coplanar

        valid, cop = self.check_valid(confs, chunk=chunk)
        return resolve_coplanar(self.robot, self.obstacle, confs, valid, cop)

    def check(self, confs: np.ndarray, two_phase: bool = True):
        valid = None
        coplanar = None
        num_pairs = None
        broad = None
        for ck in self.checkers:
            v, c, p, b = ck.check(confs, two_phase=two_phase)
            valid = v if valid is None else (valid & v)
            coplanar = c if coplanar is None else (coplanar | c)
            num_pairs = p if num_pairs is None else (num_pairs + p)
            broad = b if broad is None else (broad | b)
        return valid, coplanar, num_pairs, broad


def make_checker(robot: Mesh, obstacle: Mesh, morton: bool = True,
                 interpret: bool = False, mesh=None):
    """One checker for any mesh sizes (and optionally any device count):
    fused when the pair fits VMEM, Morton-chunked-fused otherwise; sharded
    over ``mesh`` (a `jax.sharding.Mesh`) when one is given."""
    try:
        if mesh is not None:
            from ..parallel.sharding import ShardedChecker

            # Probe the VMEM budget first (ShardedChecker builds the same
            # prep), then construct the sharded checker.
            from .megakernel import MegaKernelPrep

            MegaKernelPrep.build(robot, obstacle, morton=morton)
            return ShardedChecker(robot, obstacle, mesh=mesh, morton=morton,
                                  interpret=interpret)
        return MegaKernelChecker(robot, obstacle, morton=morton,
                                 interpret=interpret)
    except VmemBudgetError:
        return ChunkedMegaKernelChecker(robot, obstacle, morton=morton,
                                        interpret=interpret, mesh=mesh)
