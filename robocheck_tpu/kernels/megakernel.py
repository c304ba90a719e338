"""The fused collision mega-kernel (Pallas/Mosaic).

TPU re-design of the reference's best-performing configuration — the fully
fused `MegaKernel` (`test/MegaKernel.cu:113-384`: one launch does transform,
AABB broad phase, hierarchical mini-AABB culling and tri-tri tests). The CUDA
version builds a shared-memory pair buffer with atomicAdd and drains it 32
pairs at a time; the TPU version instead evaluates *dense 128x128 pair tiles*
with three levels of work elimination, all branch-free within a tile:

  level 0  mesh-level AABB broad phase -> whole configuration skipped
           (`broadPhaseFusedKernel_sep`, `broad-phase-fused.cu:157-207`).
  level 1  any-hit early exit: once a configuration is known to collide the
           remaining tiles are skipped (the warp-cooperative `valid[ty]` flag
           of `narrow-phase.cu:601-607` made sequential-grid-friendly).
  level 2  mini-AABB tile gate: a 128x128 pair tile whose AABB-overlap mask
           is empty skips the ~200-flop Moller evaluation entirely
           (`MegaKernel.cu:258-331`'s cull, as a mask + skip, no atomics).

Gather-freedom: instead of transforming 792 vertices and then gathering
triangle corners (the CUDA layout), the kernel transforms *pre-gathered*
corner arrays — 3x more transform FLOPs (trivial) for zero dynamic indexing,
which TPUs hate and CUDA shrugs at.

Data layout (host-prepared by `MegaKernelPrep`):
  * robot base corners   rob_base [16, Tr]  — rows 0-8 = c0x,c0y,c0z,...,c2z;
                         row 9 = 1.0 for real triangles, 0.0 for padding.
  * obstacle (transposed) obs_t [To, 24] — cols 0-8 corners, 9-12 plane
                         (nx,ny,nz,d), 13-18 AABB (lo,hi), padding AABB at
                         (+inf,-inf) so padded obstacle triangles never pass
                         the tile gate.
  * poses [B, 16] — r00,r01,r02,tx, r10,...,ty, r20,...,tz (built by XLA so
                         trigonometry is bit-identical to the pure-JAX path).

Pair tiles are [128 obstacle (sublanes) x 128 robot (lanes)]: robot-side
fields are [1,128] row slices of in-kernel scratch (broadcast down sublanes),
obstacle-side fields are [128,1] column slices of obs_t (broadcast across
lanes). No transposes anywhere in the kernel.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import LANE, TOL, round_up
from ..core.types import Mesh, validate_confs
from ..ops.transform import rotation_matrices
from ..utils.morton import morton_argsort

# Rob-side scratch row indices ([24, Tr] VMEM).
_R_C = 0  # rows 0..8: transformed corner coords
_R_N = 9  # rows 9..11: plane normal; row 12: plane d
_R_D = 12
_R_LO = 13  # rows 13..15: tri AABB lo
_R_HI = 16  # rows 16..18: tri AABB hi
_R_ROWS = 24

# Obs-side column indices ([To, 24]).
_O_C = 0
_O_N = 9
_O_D = 12
_O_LO = 13
_O_HI = 16
_O_COLS = 24


def _iszero(v):
    return jnp.abs(v) < TOL


def _isclose(v1, v2):
    a1 = jnp.abs(v1)
    a2 = jnp.abs(v2)
    both = (a1 < TOL) & (a2 < TOL)
    one = (a1 < TOL) | (a2 < TOL)
    rel = jnp.abs((v1 - v2) / jnp.where(a1 < TOL, 1.0, v1)) < TOL
    # both -> True; exactly one small -> False; else rel.
    return both | (~one & rel)


def _la_solve(a1, a2, a3, a4, b1, b2):
    a1_zero = _iszero(a1)
    x2_a = b1 / a2
    x1_a = (b2 - a4 * x2_a) / a3
    denom = a2 * a3 - a1 * a4
    x2_b = (a3 * b1 - a1 * b2) / denom
    x1_b = (b1 - a2 * x2_b) / jnp.where(a1_zero, 1.0, a1)
    return jnp.where(a1_zero, x1_a, x1_b), jnp.where(a1_zero, x2_a, x2_b)


def _tile_moller(rob, obs):
    """Full Moller test on one [128 obs x 128 rob] pair tile.

    Args:
      rob: dict of [1, 128] robot-side fields (c{0,1,2}{x,y,z}, nx,ny,nz,d).
      obs: dict of [128, 1] obstacle-side fields (same keys).
    Returns:
      (collides, coplanar) [128, 128] bool arrays. Semantics identical to
      `ops.narrow.pair_intersects` (same FP operation order).
    """
    nrx, nry, nrz, dr = rob["nx"], rob["ny"], rob["nz"], rob["d"]
    nox, noy, noz, do = obs["nx"], obs["ny"], obs["nz"], obs["d"]

    # Signed distances of obstacle corners vs robot plane, and vice versa.
    dist_o = [
        nrx * obs[f"c{c}x"] + nry * obs[f"c{c}y"] + nrz * obs[f"c{c}z"] + dr
        for c in range(3)
    ]
    dist_r = [
        nox * rob[f"c{c}x"] + noy * rob[f"c{c}y"] + noz * rob[f"c{c}z"] + do
        for c in range(3)
    ]

    def _no_overlap(d3):
        gz = (d3[0] >= TOL) | (d3[1] >= TOL) | (d3[2] >= TOL)
        lz = (d3[0] <= -TOL) | (d3[1] <= -TOL) | (d3[2] <= -TOL)
        return ~(gz & lz)

    sep_o = _no_overlap(dist_o)
    sep_r = _no_overlap(dist_r)

    # Coplanarity: component-ratio test against the first usable component.
    comps = [(nrx, nox), (nry, noy), (nrz, noz), (dr, do)]
    z1 = [_iszero(a) for a, _ in comps]
    z2 = [_iszero(b) for _, b in comps]
    mismatch = (z1[0] ^ z2[0]) | (z1[1] ^ z2[1]) | (z1[2] ^ z2[2]) | (z1[3] ^ z2[3])
    valid = [~za & ~zb for za, zb in zip(z1, z2)]
    ratios = [a / jnp.where(v, b, 1.0) for (a, b), v in zip(comps, valid)]
    ratio0 = jnp.where(
        valid[0], ratios[0],
        jnp.where(valid[1], ratios[1], jnp.where(valid[2], ratios[2], ratios[3])),
    )
    ok = jnp.ones_like(mismatch)
    for v, r in zip(valid, ratios):
        ok &= ~v | _isclose(ratio0, r)
    coplanar = ~mismatch & ok

    # Intersection line of the two planes.
    Dx = nry * noz - nrz * noy
    Dy = nrz * nox - nrx * noz
    Dz = nrx * noy - nry * nox
    x1_z, x2_z = _la_solve(nrx, nry, nox, noy, -dr, -do)
    x1_y, x2_y = _la_solve(nrx, nrz, nox, noz, -dr, -do)
    x1_x, x2_x = _la_solve(nry, nrz, noy, noz, -dr, -do)
    use_z = ~_iszero(Dz)
    use_y = ~use_z & ~_iszero(Dy)
    zeros = jnp.zeros_like(Dx)
    Ox = jnp.where(use_z, x1_z, jnp.where(use_y, x1_y, zeros))
    Oy = jnp.where(use_z, x2_z, jnp.where(use_y, zeros, x1_x))
    Oz = jnp.where(use_z, zeros, jnp.where(use_y, x2_y, x2_x))

    # Projections of all six corners onto the line.
    def proj(side):
        return [
            Dx * (side[f"c{c}x"] - Ox)
            + Dy * (side[f"c{c}y"] - Oy)
            + Dz * (side[f"c{c}z"] - Oz)
            for c in range(3)
        ]

    p_r = proj(rob)
    p_o = proj(obs)

    def interval(p, d3):
        d0, d1, d2 = d3
        c01 = ((d0 > 0) & (d1 > 0)) | ((d0 < 0) & (d1 < 0))
        c02 = ((d0 > 0) & (d2 > 0)) | ((d0 < 0) & (d2 < 0))
        # canonical permutations: c01 -> (0,2,1); c02 -> (0,1,2); else (1,0,2)
        q0 = jnp.where(c01, p[0], jnp.where(c02, p[0], p[1]))
        q1 = jnp.where(c01, p[2], jnp.where(c02, p[1], p[0]))
        q2 = jnp.where(c01, p[1], jnp.where(c02, p[2], p[2]))
        e0 = jnp.where(c01, d0, jnp.where(c02, d0, d1))
        e1 = jnp.where(c01, d2, jnp.where(c02, d1, d0))
        e2 = jnp.where(c01, d1, jnp.where(c02, d2, d2))

        def pvar(pa, pb, da, db):
            dd = da - db
            dd = jnp.where(dd == 0.0, 1.0, dd)
            return pa + (pb - pa) * da / dd

        t01 = pvar(q0, q1, e0, e1)
        t12 = pvar(q1, q2, e1, e2)
        return jnp.minimum(t01, t12), jnp.maximum(t01, t12)

    min_r, max_r = interval(p_r, dist_r)
    min_o, max_o = interval(p_o, dist_o)
    separated_t = (min_r >= max_o) | (min_o >= max_r)

    collides = ~sep_o & ~sep_r & ~coplanar & ~separated_t
    coplanar_live = ~sep_o & ~sep_r & coplanar
    return collides, coplanar_live


# Configurations processed per grid program (the pose/out block row count;
# must satisfy the (8, 128) float32 tiling rule).
CONFS_PER_PROGRAM = 8


def _kernel(
    obs_mesh_ref,  # SMEM [1, 8] obstacle mesh AABB
    pose_ref,  # VMEM [CONFS_PER_PROGRAM, 16]
    rob_base_ref,  # VMEM [16, Tr]
    obs_t_ref,  # VMEM [To, 24]
    out_ref,  # VMEM [CONFS_PER_PROGRAM, 128] int32
    rob_d,  # VMEM scratch [24, Tr]
    *,
    num_rob_tiles: int,
    num_obs_tiles: int,
):
    def config_body(cc, _):
        _one_config(
            cc, obs_mesh_ref, pose_ref, rob_base_ref, obs_t_ref, out_ref,
            rob_d, num_rob_tiles=num_rob_tiles, num_obs_tiles=num_obs_tiles,
        )
        return 0

    jax.lax.fori_loop(0, CONFS_PER_PROGRAM, config_body, 0)


def _one_config(
    cc, obs_mesh_ref, pose_ref, rob_base_ref, obs_t_ref, out_ref, rob_d,
    *, num_rob_tiles: int, num_obs_tiles: int,
):
    pose = pose_ref[pl.ds(cc, 1), :]  # [1, 16]
    p = [pose[0, k] for k in range(12)]
    r00, r01, r02, tx, r10, r11, r12, ty, r20, r21, r22, tz = p

    # ---- Stage 1: transform pre-gathered corners; planes; mini-AABBs. ----
    for c in range(3):
        X = rob_base_ref[3 * c + 0 : 3 * c + 1, :]
        Y = rob_base_ref[3 * c + 1 : 3 * c + 2, :]
        Z = rob_base_ref[3 * c + 2 : 3 * c + 3, :]
        rob_d[_R_C + 3 * c + 0 : _R_C + 3 * c + 1, :] = r00 * X + r01 * Y + r02 * Z + tx
        rob_d[_R_C + 3 * c + 1 : _R_C + 3 * c + 2, :] = r10 * X + r11 * Y + r12 * Z + ty
        rob_d[_R_C + 3 * c + 2 : _R_C + 3 * c + 3, :] = r20 * X + r21 * Y + r22 * Z + tz

    c0 = [rob_d[_R_C + k : _R_C + k + 1, :] for k in range(3)]
    c1 = [rob_d[_R_C + 3 + k : _R_C + 4 + k, :] for k in range(3)]
    c2 = [rob_d[_R_C + 6 + k : _R_C + 7 + k, :] for k in range(3)]
    e1 = [c1[k] - c0[k] for k in range(3)]
    e2 = [c2[k] - c1[k] for k in range(3)]
    nx = e1[1] * e2[2] - e1[2] * e2[1]
    ny = e1[2] * e2[0] - e1[0] * e2[2]
    nz = e1[0] * e2[1] - e1[1] * e2[0]
    rob_d[_R_N + 0 : _R_N + 1, :] = nx
    rob_d[_R_N + 1 : _R_N + 2, :] = ny
    rob_d[_R_N + 2 : _R_N + 3, :] = nz
    rob_d[_R_D : _R_D + 1, :] = -(nx * c0[0] + ny * c0[1] + nz * c0[2])

    for k in range(3):
        lo = jnp.minimum(jnp.minimum(c0[k], c1[k]), c2[k])
        hi = jnp.maximum(jnp.maximum(c0[k], c1[k]), c2[k])
        rob_d[_R_LO + k : _R_LO + k + 1, :] = lo
        rob_d[_R_HI + k : _R_HI + k + 1, :] = hi

    # ---- Stage 2: mesh-level broad phase (level-0 skip). ----
    tri_valid = rob_base_ref[9:10, :] > 0.0  # [1, Tr]
    big = jnp.float32(3.0e38)
    mesh_lo = [
        jnp.min(jnp.where(tri_valid, rob_d[_R_LO + k : _R_LO + k + 1, :], big))
        for k in range(3)
    ]
    mesh_hi = [
        jnp.max(jnp.where(tri_valid, rob_d[_R_HI + k : _R_HI + k + 1, :], -big))
        for k in range(3)
    ]
    obs_lo = [obs_mesh_ref[0, k] for k in range(3)]
    obs_hi = [obs_mesh_ref[0, 3 + k] for k in range(3)]
    broad_hit = (
        (mesh_lo[0] <= obs_hi[0]) & (obs_lo[0] <= mesh_hi[0])
        & (mesh_lo[1] <= obs_hi[1]) & (obs_lo[1] <= mesh_hi[1])
        & (mesh_lo[2] <= obs_hi[2]) & (obs_lo[2] <= mesh_hi[2])
    )

    # ---- Stage 3: tile sweep with level-1/level-2 skipping. ----
    def tile_body(t, carry):
        hit, cop, npairs = carry

        def run():
            i = t % num_rob_tiles  # robot tile (lane blocks of rob_d)
            j = t // num_rob_tiles  # obstacle tile (sublane blocks of obs_t)
            roff = pl.multiple_of(i * LANE, LANE)
            ooff = pl.multiple_of(j * LANE, LANE)

            def rrow(r):
                return rob_d[r : r + 1, pl.ds(roff, LANE)]  # [1, 128]

            def ocol(c):
                return obs_t_ref[pl.ds(ooff, LANE), c : c + 1]  # [128, 1]

            # Level-2 gate: mini-AABB pair mask.
            mask = rob_base_ref[9:10, pl.ds(roff, LANE)] > 0.0
            for k in range(3):
                mask &= rrow(_R_LO + k) <= ocol(_O_HI + k)
                mask &= ocol(_O_LO + k) <= rrow(_R_HI + k)
            count = jnp.sum(mask.astype(jnp.int32))

            def full():
                rob = {"nx": rrow(_R_N), "ny": rrow(_R_N + 1),
                       "nz": rrow(_R_N + 2), "d": rrow(_R_D)}
                for c in range(3):
                    rob[f"c{c}x"] = rrow(_R_C + 3 * c + 0)
                    rob[f"c{c}y"] = rrow(_R_C + 3 * c + 1)
                    rob[f"c{c}z"] = rrow(_R_C + 3 * c + 2)
                obs = {"nx": ocol(_O_N), "ny": ocol(_O_N + 1),
                       "nz": ocol(_O_N + 2), "d": ocol(_O_D)}
                for c in range(3):
                    obs[f"c{c}x"] = ocol(_O_C + 3 * c + 0)
                    obs[f"c{c}y"] = ocol(_O_C + 3 * c + 1)
                    obs[f"c{c}z"] = ocol(_O_C + 3 * c + 2)
                collides, coplanar = _tile_moller(rob, obs)
                return (
                    hit | jnp.any(collides & mask),
                    cop | jnp.any(coplanar & mask),
                    npairs + count,
                )

            return jax.lax.cond(count > 0, full, lambda: (hit, cop, npairs))

        return jax.lax.cond(hit, lambda: carry, run)

    def run_tiles():
        return jax.lax.fori_loop(
            0, num_rob_tiles * num_obs_tiles, tile_body,
            (jnp.bool_(False), jnp.bool_(False), jnp.int32(0)),
        )

    hit, cop, npairs = jax.lax.cond(
        broad_hit, run_tiles,
        lambda: (jnp.bool_(False), jnp.bool_(False), jnp.int32(0)),
    )

    col = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    out = jnp.where(col == 0, (~hit).astype(jnp.int32), 0)
    out = jnp.where(col == 1, cop.astype(jnp.int32), out)
    out = jnp.where(col == 2, npairs, out)
    out = jnp.where(col == 3, broad_hit.astype(jnp.int32), out)
    out_ref[pl.ds(cc, 1), :] = out


@dataclasses.dataclass(frozen=True)
class MegaKernelPrep:
    """Host-side mesh preparation for the mega-kernel (done once per mesh
    pair, unlike the reference which re-reads and re-uploads per call)."""

    rob_base: np.ndarray  # [16, Tr] f32
    obs_t: np.ndarray  # [To, 24] f32
    obs_mesh_aabb: np.ndarray  # [1, 8] f32
    num_rob_tiles: int
    num_obs_tiles: int

    @staticmethod
    def build(robot: Mesh, obstacle: Mesh, morton: bool = True) -> "MegaKernelPrep":
        def corners(mesh: Mesh) -> np.ndarray:
            tv = mesh.vertices[mesh.triangles].astype(np.float64)  # [T,3,3]
            if morton:
                order = morton_argsort(tv.mean(axis=1))
                tv = tv[order]
            return tv

        rob_tv = corners(robot)
        tr = round_up(rob_tv.shape[0], LANE)
        rob_base = np.zeros((16, tr), dtype=np.float32)
        flat = rob_tv.reshape(rob_tv.shape[0], 9).T  # [9, T]
        rob_base[0:9, : rob_tv.shape[0]] = flat.astype(np.float32)
        rob_base[9, : rob_tv.shape[0]] = 1.0

        obs_tv = corners(obstacle).astype(np.float32)
        to = round_up(obs_tv.shape[0], LANE)
        obs_t = np.zeros((to, _O_COLS), dtype=np.float32)
        obs_t[: obs_tv.shape[0], 0:9] = obs_tv.reshape(obs_tv.shape[0], 9)
        # Planes (same op order as ops.narrow.compute_plane, in f32).
        e1 = obs_tv[:, 1] - obs_tv[:, 0]
        e2 = obs_tv[:, 2] - obs_tv[:, 1]
        n = np.cross(e1, e2)
        d = -np.sum(n * obs_tv[:, 0], axis=-1)
        obs_t[: obs_tv.shape[0], _O_N : _O_N + 3] = n
        obs_t[: obs_tv.shape[0], _O_D] = d
        obs_t[:, _O_LO : _O_LO + 3] = np.inf
        obs_t[:, _O_HI : _O_HI + 3] = -np.inf
        obs_t[: obs_tv.shape[0], _O_LO : _O_LO + 3] = obs_tv.min(axis=1)
        obs_t[: obs_tv.shape[0], _O_HI : _O_HI + 3] = obs_tv.max(axis=1)

        obs_mesh = np.zeros((1, 8), dtype=np.float32)
        obs_mesh[0, 0:3] = obstacle.aabb[:3]
        obs_mesh[0, 3:6] = obstacle.aabb[3:]

        return MegaKernelPrep(
            rob_base=rob_base,
            obs_t=obs_t,
            obs_mesh_aabb=obs_mesh,
            num_rob_tiles=tr // LANE,
            num_obs_tiles=to // LANE,
        )


@functools.partial(jax.jit, static_argnames=("num_rob_tiles", "num_obs_tiles",
                                             "interpret"))
def _mega_call(poses, obs_mesh_aabb, rob_base, obs_t, *, num_rob_tiles,
               num_obs_tiles, interpret=False):
    b = poses.shape[0]
    assert b % CONFS_PER_PROGRAM == 0, (b, CONFS_PER_PROGRAM)
    tr = rob_base.shape[1]
    to = obs_t.shape[0]
    kernel = functools.partial(
        _kernel, num_rob_tiles=num_rob_tiles, num_obs_tiles=num_obs_tiles
    )
    return pl.pallas_call(
        kernel,
        grid=(b // CONFS_PER_PROGRAM,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((CONFS_PER_PROGRAM, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tr), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, _O_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CONFS_PER_PROGRAM, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_R_ROWS, tr), jnp.float32)],
        interpret=interpret,
    )(obs_mesh_aabb, poses, rob_base, obs_t)


def poses_from_confs(confs: jnp.ndarray) -> jnp.ndarray:
    """[B,6] configurations -> [B,16] flattened (R | t) pose rows."""
    R = rotation_matrices(confs)  # [B,3,3]
    t = confs[:, 0:3]
    b = confs.shape[0]
    out = jnp.zeros((b, 16), dtype=jnp.float32)
    out = out.at[:, 0:3].set(R[:, 0, :])
    out = out.at[:, 3].set(t[:, 0])
    out = out.at[:, 4:7].set(R[:, 1, :])
    out = out.at[:, 7].set(t[:, 1])
    out = out.at[:, 8:11].set(R[:, 2, :])
    out = out.at[:, 11].set(t[:, 2])
    return out


class MegaKernelChecker:
    """Drop-in fast path: same verdicts as the XLA pipeline, one fused kernel.

    Returns (valid, coplanar, num_pairs, broad_hit) device arrays via
    ``check_block``; `CollisionWorld`-style host convenience via ``check``.
    """

    def __init__(self, robot: Mesh, obstacle: Mesh, morton: bool = True,
                 interpret: bool = False):
        self.prep = MegaKernelPrep.build(robot, obstacle, morton=morton)
        self._rob_base = jnp.asarray(self.prep.rob_base)
        self._obs_t = jnp.asarray(self.prep.obs_t)
        self._obs_mesh = jnp.asarray(self.prep.obs_mesh_aabb)
        self._interpret = interpret

    def check_block(self, confs: jnp.ndarray) -> jnp.ndarray:
        """[B,6] device confs -> [B,128] int32 raw kernel output."""
        poses = poses_from_confs(confs)
        return _mega_call(
            poses, self._obs_mesh, self._rob_base, self._obs_t,
            num_rob_tiles=self.prep.num_rob_tiles,
            num_obs_tiles=self.prep.num_obs_tiles,
            interpret=self._interpret,
        )

    def check(self, confs: np.ndarray):
        confs = validate_confs(confs)
        n = confs.shape[0]
        pad = (-n) % CONFS_PER_PROGRAM
        if pad:
            confs = np.pad(confs, ((0, pad), (0, 0)))
        out = np.asarray(self.check_block(jnp.asarray(confs)))[:n]
        valid = out[:, 0].astype(bool)
        coplanar = out[:, 1].astype(bool)
        num_pairs = out[:, 2]
        broad_hit = out[:, 3].astype(bool)
        return valid, coplanar, num_pairs, broad_hit
