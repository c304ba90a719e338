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
  level 3  plane prefilter: tiles that do run first evaluate only the
           signed-distance/plane-separation stage (~40 flops); the interval
           stage runs only if some masked pair has both planes straddled —
           an exact short-circuit (a separated pair can't collide and can't
           be live-coplanar).

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


class VmemBudgetError(ValueError):
    """Mesh pair exceeds the fused kernel's VMEM residency budget.

    Raised by :meth:`MegaKernelPrep.build`; `kernels.chunked.make_checker`
    catches exactly this to dispatch to the Morton-chunked checker (other
    ``ValueError``s — malformed meshes etc. — propagate)."""


def _iszero(v):
    return jnp.abs(v) < TOL


def _true_div(a, b):
    return a / b


def _probe_div(a, b):
    # Profiling stand-in (stage_cap=3): multiply instead of divide to
    # isolate the VPU divide cost. WRONG results; never the default.
    return a * b


def _isclose(v1, v2, div=_true_div):
    a1 = jnp.abs(v1)
    a2 = jnp.abs(v2)
    both = (a1 < TOL) & (a2 < TOL)
    one = (a1 < TOL) | (a2 < TOL)
    rel = jnp.abs(div(v1 - v2, jnp.where(a1 < TOL, 1.0, v1))) < TOL
    # both -> True; exactly one small -> False; else rel.
    return both | (~one & rel)


def _la_solve(a1, a2, a3, a4, b1, b2, div=_true_div):
    a1_zero = _iszero(a1)
    x2_a = div(b1, a2)
    x1_a = div(b2 - a4 * x2_a, a3)
    denom = a2 * a3 - a1 * a4
    x2_b = div(a3 * b1 - a1 * b2, denom)
    x1_b = div(b1 - a2 * x2_b, jnp.where(a1_zero, 1.0, a1))
    return jnp.where(a1_zero, x1_a, x1_b), jnp.where(a1_zero, x2_a, x2_b)


def _tile_planes(rob, obs):
    """Cheap first stage of the Moller test on one [128 x 128] pair tile:
    signed corner distances against the opposite plane and the plane
    separation tests (`compute_signed_dists`/`no_overlap`,
    `narrow-phase.cu:78-106`). A pair with either plane separating cannot
    collide and cannot be live-coplanar, so tiles where `live` is empty can
    skip `_tile_moller_rest` entirely — an exact short-circuit.

    Returns (dist_o, dist_r, live) where live = ~sep_o & ~sep_r.
    """
    nrx, nry, nrz, dr = rob["nx"], rob["ny"], rob["nz"], rob["d"]
    nox, noy, noz, do = obs["nx"], obs["ny"], obs["nz"], obs["d"]

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

    live = ~_no_overlap(dist_o) & ~_no_overlap(dist_r)
    return dist_o, dist_r, live


def _moller_interval_parts(rob, obs, dist_o, dist_r, live, div=_true_div):
    """Vector core of the Moller interval stage on one pair block: interval
    separation plus the conservative coplanarity precheck, NO reductions and
    NO control flow — per-pair boolean arrays only, so both the per-tile
    cond flow (`_tile_moller_rest`) and the slab sweep's accumulate-only
    flow share bit-identical FP semantics.

    Returns (isect_raw, maybe_cop): isect_raw = live pairs whose projected
    intervals overlap (a hit unless the pair is ratio-coplanar); maybe_cop =
    live pairs where the conservative necessary condition for ratio
    coplanarity fires (the exact component-ratio test is only needed — and
    only run by callers — when some maybe_cop pair exists, which on real
    data is ~never).
    """
    nrx, nry, nrz, dr = rob["nx"], rob["ny"], rob["nz"], rob["d"]
    nox, noy, noz, do = obs["nx"], obs["ny"], obs["nz"], obs["d"]

    # Intersection-line DIRECTION only (origin-free projections: a shared
    # line origin shifts both triangles' interval endpoints equally and
    # cancels in the >= comparisons — Moller'97's optimized form. The
    # reference solves 2x2 systems for the origin, `narrow-phase.cu:127-154`;
    # dropping them removes ~60 vector ops and 12 of 24 VPU divides from the
    # issue-bound hot stage). The cross-product terms are kept separate: the
    # coplanarity precheck reuses them.
    axx, bxx = nry * noz, nrz * noy
    axy, bxy = nrz * nox, nrx * noz
    axz, bxz = nrx * noy, nry * nox
    Dx = axx - bxx
    Dy = axy - bxy
    Dz = axz - bxz

    # Projections of all six corners onto the line.
    def proj(side):
        return [
            Dx * side[f"c{c}x"]
            + Dy * side[f"c{c}y"]
            + Dz * side[f"c{c}z"]
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
            return pa + (pb - pa) * div(da, dd)

        t01 = pvar(q0, q1, e0, e1)
        t12 = pvar(q1, q2, e1, e2)
        return jnp.minimum(t01, t12), jnp.maximum(t01, t12)

    min_r, max_r = interval(p_r, dist_r)
    min_o, max_o = interval(p_o, dist_o)
    separated_t = (min_r >= max_o) | (min_o >= max_r)
    isect_raw = ~separated_t & live

    # Conservative coplanarity precheck: ratio-coplanar (all nonzero
    # component ratios within TOL=1e-6 of each other) forces each |D|
    # component below ~1e-6x the magnitude of its two cross terms — unless a
    # component pair is inside the |.|<TOL zero band on BOTH sides, in which
    # case that axis is excused (the ratio test skips it too). The bound
    # here uses 1e-3, three orders of magnitude of headroom over the exact
    # bound plus f32 evaluation noise (~6e-8 relative), so precheck=False
    # PROVES no live pair can be ratio-coplanar and the full component-ratio
    # block (8 VPU divides) is skipped. Mismatched zero patterns are
    # non-coplanar by definition and need no excuse.
    B = jnp.float32(1.0e-3)
    bs_x = _iszero(nrx) & _iszero(nox)
    bs_y = _iszero(nry) & _iszero(noy)
    bs_z = _iszero(nrz) & _iszero(noz)
    okx = (jnp.abs(Dx) <= B * (jnp.abs(axx) + jnp.abs(bxx))) | bs_y | bs_z
    oky = (jnp.abs(Dy) <= B * (jnp.abs(axy) + jnp.abs(bxy))) | bs_z | bs_x
    okz = (jnp.abs(Dz) <= B * (jnp.abs(axz) + jnp.abs(bxz))) | bs_x | bs_y
    maybe_cop = okx & oky & okz & live

    # Second branch of the ratio test's truth table: when EVERY valid
    # component ratio |nr/no| is itself below TOL (~6 orders of mesh-scale
    # mismatch between the two triangles), `_isclose`'s both-small case
    # declares the ratios equal and the full test flags coplanar even
    # though the planes are nowhere near parallel — the |D| bound above
    # does not cover that. Detect it directly: each of the four components
    # either sits in the shared zero band or is valid with
    # |nr| <= 2*TOL*|no| (factor-2 headroom over the f32 divide noise in
    # the exact |nr/no| < TOL threshold); mismatched zero patterns make
    # the component non-coplanar and correctly fail both branches.
    T2 = jnp.float32(2.0 * TOL)

    def _sub_ratio(a, b):
        za = _iszero(a)
        zb = _iszero(b)
        return (za & zb) | (~za & ~zb & (jnp.abs(a) <= T2 * jnp.abs(b)))

    maybe_cop = maybe_cop | (
        _sub_ratio(nrx, nox) & _sub_ratio(nry, noy) & _sub_ratio(nrz, noz)
        & _sub_ratio(dr, do) & live
    )
    return isect_raw, maybe_cop


def _tile_moller_rest(rob, obs, dist_o, dist_r, live, hit, cop,
                      div=_true_div):
    """Expensive remainder of the Moller test: interval overlap plus the
    (rare) coplanarity resolution, on one pair tile. Only pairs where
    `_tile_planes` reported live matter; ``live`` must already include the
    mini-AABB mask.

    Returns scalar (hit', cop') carries: hit' = hit OR some live pair
    intersects; cop' = cop OR some live pair is flagged coplanar. Combined
    semantics are identical to `ops.narrow.pair_intersects` (same FP
    operation order); the ~45-op/8-divide component-ratio block runs only
    when the conservative `maybe_cop` precheck fires on some live pair.
    """
    isect_raw, maybe_cop = _moller_interval_parts(rob, obs, dist_o, dist_r,
                                                  live, div)
    nrx, nry, nrz, dr = rob["nx"], rob["ny"], rob["nz"], rob["d"]
    nox, noy, noz, do = obs["nx"], obs["ny"], obs["nz"], obs["d"]

    def with_cop(c):
        h, cp = c
        # Component-ratio test against the first usable component
        # (`narrow-phase.cu:253-294` semantics).
        comps = [(nrx, nox), (nry, noy), (nrz, noz), (dr, do)]
        z1 = [_iszero(a) for a, _ in comps]
        z2 = [_iszero(b) for _, b in comps]
        mismatch = (z1[0] ^ z2[0]) | (z1[1] ^ z2[1]) | (z1[2] ^ z2[2]) | (
            z1[3] ^ z2[3])
        valid = [~za & ~zb for za, zb in zip(z1, z2)]
        ratios = [div(a, jnp.where(v, b, 1.0))
                  for (a, b), v in zip(comps, valid)]
        ratio0 = jnp.where(
            valid[0], ratios[0],
            jnp.where(valid[1], ratios[1],
                      jnp.where(valid[2], ratios[2], ratios[3])),
        )
        ok = jnp.ones_like(mismatch)
        for v, r in zip(valid, ratios):
            ok &= ~v | _isclose(ratio0, r, div)
        coplanar = ~mismatch & ok
        return (h | jnp.any(isect_raw & ~coplanar),
                cp | jnp.any(coplanar & live))

    def no_cop(c):
        h, cp = c
        return (h | jnp.any(isect_raw), cp)

    return jax.lax.cond(jnp.any(maybe_cop), with_cop, no_cop, (hit, cop))


# Configurations processed per grid program (the pose/out block row count;
# must be a multiple of the f32 sublane count, 8). Measured on v5e: each
# grid program carries ~7 us of fixed cost (prologue + block DMA + stage-1
# latency chains), so more configs per program amortizes it — 32 puts the
# all-miss floor at ~0.25 us/config while the derived-field scratch stays
# ~3 MB of VMEM.
CONFS_PER_PROGRAM = 32

# Gate bitmask word size: bits per float-encoded word (exact in f32 <= 2^24;
# 16 keeps headroom).
_GATE_WORD_BITS = 16


def _gate_words(num_obs_tiles: int) -> int:
    return (num_obs_tiles + _GATE_WORD_BITS - 1) // _GATE_WORD_BITS


def _rob_any_words(num_rob_tiles: int) -> int:
    return (num_rob_tiles + _GATE_WORD_BITS - 1) // _GATE_WORD_BITS


# misc header layout (fixed LANE cols): col 0 broad flag, 1..3 hot summary
# words, 4..6 cold summary words, 7 always-zero (the profiling probes'
# runtime-false source), 8 best-tile code (argmax rc*cc, 0 = none), rest
# spare. Gate words live in their OWN scratch (`gates_scr`) so misc rows
# stay exactly 128 lanes: Mosaic cannot lower dynamic-sublane scalar loads
# from wider rows ("dynamic load with unaligned indices" on [32, 256]).


def _gate_cols(num_rob_tiles: int, num_obs_tiles: int) -> int:
    # Hot gate words followed by cold gate words, lane-padded.
    return round_up(
        max(2 * num_rob_tiles * _gate_words(num_obs_tiles), 1), LANE)


def _ctz16(word):
    """Count trailing zeros of a scalar int32 known to be nonzero and
    < 2^16. Mosaic's scalar core has no popcount; isolate the lowest set bit
    and binary-search its position with 4 mask tests (branchless)."""
    low = word & -word
    j = jnp.where((low & 0xAAAA) != 0, 1, 0)
    j = j + jnp.where((low & 0xCCCC) != 0, 2, 0)
    j = j + jnp.where((low & 0xF0F0) != 0, 4, 0)
    return j + jnp.where((low & 0xFF00) != 0, 8, 0)


def _kernel(
    obs_mesh_ref,  # SMEM [1, 8] obstacle mesh AABB
    obs_grp_ref,  # SMEM [num_obs_tiles, 8] per-group obstacle AABBs
    pose_ref,  # VMEM [CONFS_PER_PROGRAM, 16]
    rob_base_ref,  # VMEM [16, Tr]
    obs_t_ref,  # VMEM [To, 24]
    obs_aabb_rows_ref,  # VMEM [6, To] obstacle tri AABBs, row layout
    out_ref,  # VMEM [CONFS_PER_PROGRAM, 128] int32
    rob_d,  # VMEM scratch [CONFS_PER_PROGRAM, 24, Tr]
    misc,  # VMEM scratch [CONFS_PER_PROGRAM, LANE] f32 header: col 0 =
    #        broad flag, 1..6 summaries, 7 probe zero, 8 best-tile code.
    gates_scr,  # VMEM scratch [CONFS_PER_PROGRAM, _gate_cols] f32:
    #        hot gate words then cold gate words (float-encoded ints).
    *,
    num_rob_tiles: int,
    num_obs_tiles: int,
    rob_tile: int = LANE,
    obs_tile: int = LANE,
    inner_exit: bool = True,
    sweep: bool = True,
    stats: bool = True,
    stage_cap: int = 2,
    hot_thresh: float = 1024.0,
    best_first: bool = True,
):
    # ---- Stage 1 (vectorized across the block's configurations):
    # transform pre-gathered corners; planes; mini-AABBs; broad flags. ----
    def pcol(k):
        return pose_ref[:, k : k + 1]  # [CPB, 1]

    corners = []  # 9 arrays [CPB, Tr]
    for c in range(3):
        X = rob_base_ref[3 * c + 0 : 3 * c + 1, :]  # [1, Tr]
        Y = rob_base_ref[3 * c + 1 : 3 * c + 2, :]
        Z = rob_base_ref[3 * c + 2 : 3 * c + 3, :]
        px = pcol(0) * X + pcol(1) * Y + pcol(2) * Z + pcol(3)
        py = pcol(4) * X + pcol(5) * Y + pcol(6) * Z + pcol(7)
        pz = pcol(8) * X + pcol(9) * Y + pcol(10) * Z + pcol(11)
        corners += [px, py, pz]

    c0 = corners[0:3]
    c1 = corners[3:6]
    c2 = corners[6:9]

    tri_valid = rob_base_ref[9:10, :] > 0.0  # [1, Tr]
    big = jnp.float32(3.0e38)
    broad = None
    los, his, lo_raw, hi_raw = [], [], [], []
    for k in range(3):
        lo = jnp.minimum(jnp.minimum(c0[k], c1[k]), c2[k])
        hi = jnp.maximum(jnp.maximum(c0[k], c1[k]), c2[k])
        lo_raw.append(lo)
        hi_raw.append(hi)
        lo_m = jnp.where(tri_valid, lo, big)
        hi_m = jnp.where(tri_valid, hi, -big)
        los.append(lo_m)
        his.append(hi_m)
        mesh_lo = jnp.min(lo_m, axis=1, keepdims=True)
        mesh_hi = jnp.max(hi_m, axis=1, keepdims=True)
        ax = (mesh_lo <= obs_mesh_ref[0, 3 + k]) & (
            obs_mesh_ref[0, k] <= mesh_hi
        )  # [CPB, 1]
        broad = ax if broad is None else (broad & ax)

    # Level-1.5 gate, precomputed vectorized: for every (config, robot tile)
    # an obstacle-tile bitmask, chunked into float-encoded 16-bit words
    # (exact in f32) so arbitrary obstacle tile counts fit. Replaces
    # per-(tile,tile) scalar-core gate evaluations in the sweep with one bit
    # test per tile. The gate is refined beyond group-vs-group: a tile passes
    # only if some ROBOT triangle box touches the obstacle GROUP box (row
    # test) AND some OBSTACLE triangle box touches the robot GROUP box (col
    # test) — both exact necessary conditions for any pairwise overlap (a
    # triangle box is contained in its group box). The per-128-lane "any"
    # reductions are done as ONE [CPB, T] x [T, tiles] segment-indicator
    # matmul per side (sums of 0/1 are exact; >0 == any) — lane reductions
    # are slow on the VPU, matmuls are not. Everything below the broad flag
    # only runs when some configuration in the program survived the broad
    # phase, so all-miss programs (sparse datasets) pay for transform+AABB
    # only.
    n_words = _gate_words(num_obs_tiles)
    misc_cols = misc.shape[-1]
    col = jax.lax.broadcasted_iota(
        jnp.int32, (CONFS_PER_PROGRAM, misc_cols), 1
    )
    broad_col = jnp.where(col == 0, broad.astype(jnp.float32), 0.0)
    any_broad = jnp.any(broad)

    @pl.when(jnp.logical_not(any_broad))
    def _():
        misc[...] = broad_col

    @pl.when(any_broad)
    def _():
        # Derived per-triangle fields, written once for the sweep to read.
        for f in range(9):
            rob_d[:, _R_C + f : _R_C + f + 1, :] = corners[f][:, None, :]
        e1 = [c1[k] - c0[k] for k in range(3)]
        e2 = [c2[k] - c1[k] for k in range(3)]
        nx = e1[1] * e2[2] - e1[2] * e2[1]
        ny = e1[2] * e2[0] - e1[0] * e2[2]
        nz = e1[0] * e2[1] - e1[1] * e2[0]
        rob_d[:, _R_N + 0 : _R_N + 1, :] = nx[:, None, :]
        rob_d[:, _R_N + 1 : _R_N + 2, :] = ny[:, None, :]
        rob_d[:, _R_N + 2 : _R_N + 3, :] = nz[:, None, :]
        dplane = -(nx * c0[0] + ny * c0[1] + nz * c0[2])
        rob_d[:, _R_D : _R_D + 1, :] = dplane[:, None, :]
        for k in range(3):
            rob_d[:, _R_LO + k : _R_LO + k + 1, :] = lo_raw[k][:, None, :]
            rob_d[:, _R_HI + k : _R_HI + k + 1, :] = hi_raw[k][:, None, :]

        tr = los[0].shape[1]
        to = obs_aabb_rows_ref.shape[1]
        seg_r = (
            jax.lax.broadcasted_iota(jnp.int32, (tr, num_rob_tiles), 0)
            // rob_tile
            == jax.lax.broadcasted_iota(jnp.int32, (tr, num_rob_tiles), 1)
        ).astype(jnp.float32)
        seg_o = (
            jax.lax.broadcasted_iota(jnp.int32, (to, num_obs_tiles), 0)
            // obs_tile
            == jax.lax.broadcasted_iota(jnp.int32, (to, num_obs_tiles), 1)
        ).astype(jnp.float32)

        # Row side: per obstacle group j, count rob tri boxes touching it,
        # segment-reduced over robot tiles -> row_counts[j] [CPB, n_rob_t].
        row_counts = []
        for j in range(num_obs_tiles):
            m = None
            for k in range(3):
                og_lo = obs_grp_ref[j, k]  # SMEM scalar
                og_hi = obs_grp_ref[j, 3 + k]
                ax = (los[k] <= og_hi) & (og_lo <= his[k])  # [CPB, Tr]
                m = ax if m is None else (m & ax)
            row_counts.append(
                jax.lax.dot(m.astype(jnp.float32), seg_r)
            )  # [CPB, n_rob_tiles]

        # Col side: per robot tile i, count obs tri boxes touching its group
        # box, segment-reduced over obstacle tiles -> [CPB, n_obs_tiles].
        # Gates split into HOT words (estimated pair count row*col >=
        # hot_thresh) and COLD words (the rest): the sweep visits hot tiles
        # first, so colliding configurations — whose contact tile is almost
        # always the densest — take the any-hit exit after ~1 visit instead
        # of scanning in Morton order. Valid configurations visit the same
        # set either way. Per-config summary words (bit i = "robot tile i
        # has any hot/cold gate bit") land in cols 1..3 (hot) and 4..6
        # (cold).
        misc_val = broad_col
        gcol = jax.lax.broadcasted_iota(
            jnp.int32, (CONFS_PER_PROGRAM, gates_scr.shape[-1]), 1
        )
        gates_val = jnp.zeros(
            (CONFS_PER_PROGRAM, gates_scr.shape[-1]), jnp.float32
        )
        r_words = _rob_any_words(num_rob_tiles)
        rob_any_h = [jnp.zeros((CONFS_PER_PROGRAM, 1), jnp.float32)
                     for _ in range(r_words)]
        rob_any_c = [jnp.zeros((CONFS_PER_PROGRAM, 1), jnp.float32)
                     for _ in range(r_words)]
        thresh = jnp.float32(hot_thresh)
        cold_base = num_rob_tiles * n_words

        # First sweep over robot tiles: per-tile obstacle counts (the
        # expensive [CPB, To] compares + matmul, done once and kept — each
        # col_counts[i] is a small [CPB, n_obs_tiles] array), plus the
        # per-config BEST tile (argmax of rc*cc over gated tiles) via ONE
        # lane-indexed product matrix. The sweep dispatches that tile
        # FIRST: a colliding configuration's contact is almost always in
        # its densest tile, so the any-hit exit fires after ~1 visit
        # instead of a hot-bucket Morton scan (counters: colliding configs
        # visited 4.58 tiles before, 2.67 after). Products and tile codes
        # are packed into one value (prod * 2^7 + reversed code, exact in
        # f32: prod <= 128*128 = 2^14, so packed < 2^21) so the argmax is a
        # single lane-reduce instead of 64 serialized [CPB, 1] selects —
        # the first version of this sweep kept 128 live [CPB, 1] arrays
        # across two passes and the resulting spills cost easy100k 2x.
        n_tiles = num_rob_tiles * num_obs_tiles
        code_bits = max(7, (n_tiles - 1).bit_length())
        code_w = jnp.float32(1 << code_bits)
        # Clamp the product so packed < 2^23 stays exact in f32 (clamped
        # ties fall to the lowest tile index — any near-max tile is fine).
        max_prod = jnp.float32((1 << (23 - code_bits)) - 1)
        col_counts = []
        packed = jnp.zeros((CONFS_PER_PROGRAM, n_tiles), jnp.float32)
        tcol = jax.lax.broadcasted_iota(
            jnp.int32, (CONFS_PER_PROGRAM, n_tiles), 1)
        for i in range(num_rob_tiles):  # noqa: C901
            sl = slice(i * rob_tile, (i + 1) * rob_tile)
            rg_lo = [jnp.min(los[k][:, sl], axis=1, keepdims=True)
                     for k in range(3)]  # [CPB, 1]
            rg_hi = [jnp.max(his[k][:, sl], axis=1, keepdims=True)
                     for k in range(3)]
            m = None
            for k in range(3):
                o_lo = obs_aabb_rows_ref[k : k + 1, :]  # [1, To]
                o_hi = obs_aabb_rows_ref[3 + k : 4 + k, :]
                ax = (rg_lo[k] <= o_hi) & (o_lo <= rg_hi[k])  # [CPB, To]
                m = ax if m is None else (m & ax)
            col_counts.append(jax.lax.dot(m.astype(jnp.float32), seg_o))
            if best_first:
                for j in range(num_obs_tiles):
                    rc = row_counts[j][:, i : i + 1]
                    cc_ = col_counts[i][:, j : j + 1]
                    gate = (rc > 0.0) & (cc_ > 0.0)
                    idx = i * num_obs_tiles + j
                    val = jnp.where(
                        gate,
                        jnp.minimum(rc * cc_, max_prod) * code_w
                        + jnp.float32(n_tiles - 1 - idx),
                        0.0,
                    )
                    packed = jnp.where(tcol == idx, val, packed)
        if best_first:
            best_val = jnp.max(packed, axis=1, keepdims=True)  # [CPB, 1]
            best_prod = jnp.floor(best_val / code_w)
            # code = tile index + 1; 0 = no gated tile anywhere.
            best_code = jnp.where(
                best_val > 0.0,
                jnp.float32(n_tiles) - (best_val - best_prod * code_w),
                0.0,
            )
        else:
            best_code = jnp.zeros((CONFS_PER_PROGRAM, 1), jnp.float32)

        # Second sweep: hot/cold word encoding from the kept small count
        # matrices, the best tile excluded from its word (it is dispatched
        # unconditionally, so valid configs visit the same total tile set
        # as before).
        for i in range(num_rob_tiles):
            words_h = [jnp.zeros((CONFS_PER_PROGRAM, 1), jnp.float32)
                       for _ in range(n_words)]
            words_c = [jnp.zeros((CONFS_PER_PROGRAM, 1), jnp.float32)
                       for _ in range(n_words)]
            for j in range(num_obs_tiles):
                code = jnp.float32(i * num_obs_tiles + j + 1)
                rc = row_counts[j][:, i : i + 1]
                cc_ = col_counts[i][:, j : j + 1]
                gate = (rc > 0.0) & (cc_ > 0.0) & (best_code != code)
                hot = gate & (rc * cc_ >= thresh)
                w, b = divmod(j, _GATE_WORD_BITS)
                bit = jnp.float32(1 << b)
                words_h[w] = words_h[w] + hot.astype(jnp.float32) * bit
                words_c[w] = words_c[w] + (
                    gate & jnp.logical_not(hot)
                ).astype(jnp.float32) * bit
            wi, bi = divmod(i, _GATE_WORD_BITS)
            for rob_any, words in ((rob_any_h, words_h), (rob_any_c,
                                                          words_c)):
                any_i = words[0]
                for w in range(1, n_words):
                    any_i = any_i + words[w]
                rob_any[wi] = rob_any[wi] + (any_i > 0.0).astype(
                    jnp.float32
                ) * jnp.float32(1 << bi)
            for w in range(n_words):
                gates_val = jnp.where(gcol == i * n_words + w,
                                      words_h[w], gates_val)
                gates_val = jnp.where(gcol == cold_base + i * n_words + w,
                                      words_c[w], gates_val)
        for w in range(r_words):
            misc_val = jnp.where(col == 1 + w, rob_any_h[w], misc_val)
            misc_val = jnp.where(col == 4 + w, rob_any_c[w], misc_val)
        misc_val = jnp.where(col == 8, best_code, misc_val)
        misc[...] = misc_val
        gates_scr[...] = gates_val

    # ---- Stage 2+3 per configuration: gated tile sweep. ----
    # sweep=False is a profiling knob (scripts/roofline.py): stage 1 +
    # epilogue only, so (full - nosweep) isolates the sweep's cost.
    def config_body(cc, _):
        if sweep:
            _one_config(
                cc, obs_grp_ref, rob_base_ref, obs_t_ref,
                out_ref, rob_d, misc, gates_scr,
                num_rob_tiles=num_rob_tiles,
                num_obs_tiles=num_obs_tiles, rob_tile=rob_tile,
                obs_tile=obs_tile, inner_exit=inner_exit, stats=stats,
                stage_cap=stage_cap,
                best_first=best_first,
            )
        else:
            broad = misc[pl.ds(cc, 1), 0:1][0, 0] > 0.0
            ccol = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
            row = jnp.where(ccol == 0, 1, 0)
            row = jnp.where(ccol == 3, broad.astype(jnp.int32), row)
            out_ref[pl.ds(cc, 1), :] = row
        return 0

    # All-miss programs (the sparse-dataset common case) write the whole
    # output block in one vectorized store instead of 32 serial per-config
    # epilogues.
    @pl.when(jnp.logical_not(any_broad))
    def _():
        ocol = jax.lax.broadcasted_iota(
            jnp.int32, (CONFS_PER_PROGRAM, LANE), 1
        )
        out_ref[...] = jnp.where(ocol == 0, 1, 0)

    @pl.when(any_broad)
    def _():
        jax.lax.fori_loop(0, CONFS_PER_PROGRAM, config_body, 0)


def _one_config(
    cc, obs_grp_ref, rob_base_ref, obs_t_ref, out_ref, rob_d,
    misc, gates_scr,
    *, num_rob_tiles: int, num_obs_tiles: int, rob_tile: int = LANE,
    obs_tile: int = LANE, inner_exit: bool = True, stats: bool = True,
    stage_cap: int = 2, best_first: bool = True,
):
    broad_hit = misc[pl.ds(cc, 1), 0:1][0, 0] > 0.0
    # Runtime-false scalar for the stage_cap profiling probes: misc col 7 is
    # always 0 at runtime but opaque to the compiler, so probe bodies cannot
    # be dead-code-eliminated.
    rt_false = misc[pl.ds(cc, 1), 7:8][0, 0] > 0.5

    # Sweep only the SET gate bits: the outer loop pops robot tiles from the
    # stage-1 summary word (bit i = robot tile i has any gated obstacle
    # tile), the inner loop pops obstacle tiles from that robot tile's gate
    # word. On the hard dataset a mean of ~4 of 64 (rob, obs) tile pairs are
    # gated in — iterating bits instead of the full grid removes ~94% of the
    # sweep's scalar-core work (measured as the dominant per-config cost).
    # The Moller tile body is instantiated once per gate word (one word for
    # meshes <= 2048 triangles), keeping Mosaic compile time bounded.
    if stats:
        zero_carry = (jnp.bool_(False), jnp.bool_(False), jnp.int32(0),
                      jnp.int32(0), jnp.int32(0), jnp.int32(0))
    else:
        zero_carry = (jnp.bool_(False), jnp.bool_(False))

    n_words = _gate_words(num_obs_tiles)
    r_words = _rob_any_words(num_rob_tiles)

    def load_words(i, base0):
        # Gate-word loads need a static lane column -> switch over tiles.
        def mk(i0):
            def branch():
                base = base0 + i0 * n_words
                return tuple(
                    gates_scr[pl.ds(cc, 1), base + w : base + w + 1][0, 0]
                    .astype(jnp.int32)
                    for w in range(n_words)
                )
            return branch
        return jax.lax.switch(i, [mk(i0) for i0 in range(num_rob_tiles)])

    def load_rob_fields(i):
        """ONE wide dynamic load for robot tile i's 19 field rows ([1, 24,
        rob_tile] block), sliced in-register — 19 serialized
        address-dependent narrow loads were a measured ~40% of the sweep's
        cost. Returns (rfield, r_lo, r_hi, tile_mask)."""
        roff = pl.multiple_of(i * rob_tile, rob_tile)
        rblock = rob_d[pl.ds(cc, 1), :, pl.ds(roff, rob_tile)][0]

        def rrow_at(r):
            return rblock[r : r + 1, :]

        rfield = {"nx": rrow_at(_R_N), "ny": rrow_at(_R_N + 1),
                  "nz": rrow_at(_R_N + 2), "d": rrow_at(_R_D)}
        for c in range(3):
            rfield[f"c{c}x"] = rrow_at(_R_C + 3 * c + 0)
            rfield[f"c{c}y"] = rrow_at(_R_C + 3 * c + 1)
            rfield[f"c{c}z"] = rrow_at(_R_C + 3 * c + 2)
        r_lo = [rrow_at(_R_LO + k) for k in range(3)]
        r_hi = [rrow_at(_R_HI + k) for k in range(3)]
        tile_mask = rob_base_ref[9:10, pl.ds(roff, rob_tile)] > 0.0
        return rfield, r_lo, r_hi, tile_mask

    def tile_body(j, carry3, rfield, r_lo, r_hi, tile_mask):
            ooff = pl.multiple_of(j * obs_tile, obs_tile)

            # One wide [obs_tile, 24] load for the obstacle tile,
            # column-sliced in-register.
            oblock = obs_t_ref[pl.ds(ooff, obs_tile), :]

            def ocol(c):
                return oblock[:, c : c + 1]

            mask = tile_mask
            for k in range(3):
                mask &= r_lo[k] <= ocol(_O_HI + k)
                mask &= ocol(_O_LO + k) <= r_hi[k]

            def mk_obs_fields():
                # Built inside the gated branches: tiles whose mini-AABB
                # mask is empty (the majority of visits) never pay the
                # 13 column slices.
                obs_fields = {"nx": ocol(_O_N), "ny": ocol(_O_N + 1),
                              "nz": ocol(_O_N + 2), "d": ocol(_O_D)}
                for c in range(3):
                    obs_fields[f"c{c}x"] = ocol(_O_C + 3 * c + 0)
                    obs_fields[f"c{c}y"] = ocol(_O_C + 3 * c + 1)
                    obs_fields[f"c{c}z"] = ocol(_O_C + 3 * c + 2)
                return obs_fields

            if not stats:
                # Throughput flow (the packed path): same gating as the
                # stats path (mask -> planes -> interval; unconditional
                # plane evaluation measured slower than the any(mask) sync
                # it saves — DESIGN.md's falsified `fuse_planes` run) minus
                # the pair-count reduction.
                hit, cop = carry3

                if stage_cap == 0:
                    # Profiling probe: mask + any() sync only (& rt_false
                    # keeps the reduction live without ever setting hit).
                    return (hit | (jnp.any(mask) & rt_false), cop)

                def full2(c4):
                    obs_fields = mk_obs_fields()
                    dist_o, dist_r, live = _tile_planes(rfield, obs_fields)
                    live = live & mask
                    if stage_cap == 1:
                        # Profiling probe: planes but never the interval
                        # stage.
                        h, cp = c4
                        return (h | (jnp.any(live) & rt_false), cp)
                    div = _probe_div if stage_cap == 3 else _true_div
                    return jax.lax.cond(
                        jnp.any(live),
                        lambda c5: _tile_moller_rest(
                            rfield, obs_fields, dist_o, dist_r, live,
                            c5[0], c5[1], div=div,
                        ),
                        lambda c5: c5, c4,
                    )

                return jax.lax.cond(jnp.any(mask), full2, lambda c4: c4,
                                    (hit, cop))

            hit, cop, npairs, nfull, ngate, nrest = carry3

            def full(c4):
                hit, cop, npairs, nfull, ngate, nrest = c4
                count = jnp.sum(mask.astype(jnp.int32))
                # Stage a: plane separation (cheap). Pairs with a separating
                # plane can neither collide nor count as live-coplanar, so
                # an all-separated tile skips the expensive interval stage
                # exactly.
                obs_fields = mk_obs_fields()
                dist_o, dist_r, live = _tile_planes(rfield, obs_fields)
                live &= mask

                def rest(c5):
                    hit, cop, npairs, nfull, ngate, nrest = c5
                    hit, cop = _tile_moller_rest(
                        rfield, obs_fields, dist_o, dist_r, live, hit, cop
                    )
                    return (hit, cop, npairs, nfull, ngate, nrest + 1)

                c4 = (hit, cop, npairs + count, nfull + 1, ngate, nrest)
                return jax.lax.cond(jnp.any(live), rest, lambda c5: c5, c4)

            return jax.lax.cond(
                jnp.any(mask), full, lambda c4: c4,
                (hit, cop, npairs, nfull, ngate + 1, nrest),
            )

    def eval_rob_tile(i, carry, base0):
        words = load_words(i, base0)
        rfield, r_lo, r_hi, tile_mask = load_rob_fields(i)

        def tile(j, c):
            return tile_body(j, c, rfield, r_lo, r_hi, tile_mask)

        carry2 = carry
        for w in range(n_words):

            def obs_cond(state):
                word, c = state
                if not inner_exit:
                    # Exit only between robot tiles: the inner loop's
                    # continue-condition no longer depends on the previous
                    # tile's any-hit reduction, breaking the scalar
                    # dependency chain between consecutive tile bodies.
                    return word != 0
                return (word != 0) & jnp.logical_not(c[0])

            def obs_body(state, w=w):
                word, c = state
                j = w * _GATE_WORD_BITS + _ctz16(word)
                return (word & (word - 1), tile(j, c))

            _, carry2 = jax.lax.while_loop(obs_cond, obs_body,
                                           (words[w], carry2))
        return carry2

    cold_base = num_rob_tiles * n_words

    def sweep_pass(carry, summary_col, base0):
        """Per-tile exact flow over one gate-word set (hot or cold), with
        the any-hit exit between tiles."""
        for w in range(r_words):
            rw0 = misc[
                pl.ds(cc, 1), summary_col + w : summary_col + w + 1
            ][0, 0].astype(jnp.int32)

            def rob_cond(state):
                rw, c = state
                return (rw != 0) & jnp.logical_not(c[0])

            def rob_body(state, w=w, base0=base0):
                rw, c = state
                i = w * _GATE_WORD_BITS + _ctz16(rw)
                return (rw & (rw - 1), eval_rob_tile(i, c, base0))

            _, carry = jax.lax.while_loop(rob_cond, rob_body, (rw0, carry))
        return carry

    def run_tiles():
        # Dispatch order: (1) the config's BEST tile (argmax estimated pair
        # count, precomputed in stage 1) unconditionally — a colliding
        # configuration's contact is almost always there, so the any-hit
        # exit fires after this one visit; (2) HOT tiles; (3) COLD tiles —
        # all through the same per-tile exact flow (two slab-granular
        # variants were measured slower and deleted; receipts in
        # DESIGN.md "Measured roofline"). Valid configurations visit the
        # same total tile set as without the best-first step (stage 1
        # cleared the best tile's gate bit).
        if best_first:
            best_code = misc[pl.ds(cc, 1), 8:9][0, 0].astype(jnp.int32)

            def visit_best(c):
                ib = (best_code - 1) // num_obs_tiles
                jb = (best_code - 1) % num_obs_tiles
                rfield, r_lo, r_hi, tile_mask = load_rob_fields(ib)
                return tile_body(jb, c, rfield, r_lo, r_hi, tile_mask)

            carry = jax.lax.cond(best_code > 0, visit_best, lambda c: c,
                                 zero_carry)
        else:
            carry = zero_carry
        carry = sweep_pass(carry, 1, 0)  # hot
        return sweep_pass(carry, 4, cold_base)

    carry_out = jax.lax.cond(broad_hit, run_tiles, lambda: zero_carry)
    if stats:
        hit, cop, npairs, nfull, ngate, nrest = carry_out
    else:
        hit, cop = carry_out
        npairs = nfull = ngate = nrest = jnp.int32(0)

    # Full-lane-width row store: narrow ([1, 8]) or SMEM scalar stores both
    # sent Mosaic compile time pathological (~10x); [1, 128] is the fast
    # layout, and the impl wrapper trims to OUT_COLS on device.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    out = jnp.where(col == 0, jnp.logical_not(hit).astype(jnp.int32), 0)
    out = jnp.where(col == 1, cop.astype(jnp.int32), out)
    out = jnp.where(col == 2, npairs, out)
    out = jnp.where(col == 3, broad_hit.astype(jnp.int32), out)
    out = jnp.where(col == 4, nfull, out)
    out = jnp.where(col == 5, ngate, out)
    out = jnp.where(col == 6, nrest, out)
    out_ref[pl.ds(cc, 1), :] = out


@dataclasses.dataclass(frozen=True)
class MegaKernelPrep:
    """Host-side mesh preparation for the mega-kernel (done once per mesh
    pair, unlike the reference which re-reads and re-uploads per call)."""

    rob_base: np.ndarray  # [16, Tr] f32
    obs_t: np.ndarray  # [To, 24] f32
    obs_mesh_aabb: np.ndarray  # [1, 8] f32
    obs_group_aabbs: np.ndarray  # [To/obs_tile, 8] f32 per-group AABBs
    obs_aabb_rows: np.ndarray  # [6, To] f32 tri AABBs in row layout
    num_rob_tiles: int
    num_obs_tiles: int
    rob_tile: int = LANE
    obs_tile: int = LANE

    @staticmethod
    def build(robot: Mesh, obstacle: Mesh, morton: bool = True,
              rob_tile: int = LANE, obs_tile: int = LANE) -> "MegaKernelPrep":
        def corners(mesh: Mesh) -> np.ndarray:
            tv = mesh.vertices[mesh.triangles].astype(np.float64)  # [T,3,3]
            if morton:
                order = morton_argsort(tv.mean(axis=1))
                tv = tv[order]
            return tv

        assert rob_tile % LANE == 0 and obs_tile % LANE == 0, (rob_tile,
                                                              obs_tile)
        rob_tv = corners(robot)
        tr = round_up(rob_tv.shape[0], rob_tile)
        rob_base = np.zeros((16, tr), dtype=np.float32)
        flat = rob_tv.reshape(rob_tv.shape[0], 9).T  # [9, T]
        rob_base[0:9, : rob_tv.shape[0]] = flat.astype(np.float32)
        rob_base[9, : rob_tv.shape[0]] = 1.0

        obs_tv = corners(obstacle).astype(np.float32)
        to = round_up(obs_tv.shape[0], obs_tile)
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
        # The same triangle AABBs in row-major [6, To] layout (lo x/y/z rows
        # 0-2, hi rows 3-5) so the stage-1 col gate reads [1, LANE] row
        # slices — no in-kernel transposes. Padding keeps the empty box.
        obs_aabb_rows = np.ascontiguousarray(
            obs_t[:, _O_LO : _O_LO + 6].T
        ).astype(np.float32)

        # Mesh-level obstacle box from the *referenced* triangle vertices
        # (not mesh.aabb, which reduces over the whole vertex array): for
        # Morton chunks sharing a parent vertex buffer this is what makes
        # per-chunk broad culling real rather than the whole-mesh box.
        # min/max are order-independent, so for fully-referenced meshes this
        # is bit-identical to the vertex-array reduction.
        obs_mesh = np.zeros((1, 8), dtype=np.float32)
        obs_mesh[0, 0:3] = obs_tv.reshape(-1, 3).min(axis=0)
        obs_mesh[0, 3:6] = obs_tv.reshape(-1, 3).max(axis=0)

        # Per-obs_tile-triangle-group obstacle AABBs for the scalar-core
        # gate. Morton ordering (above) makes these tight. Fully padded
        # groups get an empty box; partially padded groups reduce over real
        # rows only.
        n_groups = to // obs_tile
        obs_grp = np.zeros((n_groups, 8), dtype=np.float32)
        obs_grp[:, 0:3] = np.inf
        obs_grp[:, 3:6] = -np.inf
        for g in range(n_groups):
            lo = g * obs_tile
            hi = min((g + 1) * obs_tile, obs_tv.shape[0])
            if hi > lo:
                obs_grp[g, 0:3] = obs_tv[lo:hi].reshape(-1, 3).min(axis=0)
                obs_grp[g, 3:6] = obs_tv[lo:hi].reshape(-1, 3).max(axis=0)

        # VMEM residency check: the kernel keeps the full mesh tables plus
        # derived-field scratch on-chip. Oversized meshes need the streaming
        # design this kernel doesn't implement yet — fail loudly and point at
        # the XLA pipeline, which handles any size.
        vmem_bytes = (
            CONFS_PER_PROGRAM * _R_ROWS * tr * 4  # rob_d scratch
            + to * LANE * 4  # obs_t (lane-padded physical layout)
            + 16 * tr * 4  # rob_base
        )
        if vmem_bytes > 28 * 1024 * 1024:
            raise VmemBudgetError(
                f"mesh pair too large for the fused kernel's VMEM budget "
                f"({vmem_bytes / 1e6:.1f} MB estimated for {rob_tv.shape[0]} "
                f"robot / {obs_tv.shape[0]} obstacle triangles); use "
                f"kernels.chunked.make_checker (automatic Morton-chunked "
                f"dispatch) or ops.pipeline.CollisionWorld"
            )
        # Robot-tile summary words live in misc cols 1..3 (hot) and 4..6
        # (cold); col 0 = broad flag, col 7 reserved zero, col 8 best-tile
        # code. The VMEM budget binds first in practice; this is a
        # belt-and-braces guard.
        assert _rob_any_words(tr // rob_tile) <= 3, tr
        # Gate words must fit one 128-lane scratch row: Mosaic cannot lower
        # dynamic-sublane scalar loads from wider rows. The chunked caps
        # (2048 robot / 8192 obstacle tris) sit exactly at this bound, so
        # oversized shapes route to the chunked checker like any other
        # budget overflow.
        if 2 * (tr // rob_tile) * _gate_words(to // obs_tile) > LANE:
            raise VmemBudgetError(
                f"gate-word table exceeds one scratch row "
                f"({tr // rob_tile} robot tiles x "
                f"{_gate_words(to // obs_tile)} words x 2 > {LANE}); use "
                f"kernels.chunked.make_checker"
            )

        return MegaKernelPrep(
            rob_base=rob_base,
            obs_t=obs_t,
            obs_mesh_aabb=obs_mesh,
            obs_group_aabbs=obs_grp,
            obs_aabb_rows=obs_aabb_rows,
            num_rob_tiles=tr // rob_tile,
            num_obs_tiles=to // obs_tile,
            rob_tile=rob_tile,
            obs_tile=obs_tile,
        )


@functools.partial(jax.jit, static_argnames=("num_rob_tiles", "num_obs_tiles",
                                             "rob_tile", "obs_tile",
                                             "inner_exit", "interpret",
                                             "sweep", "stats", "stage_cap",
                                             "hot_thresh",
                                             "best_first"))
def _mega_call(poses, obs_mesh_aabb, obs_group_aabbs, rob_base, obs_t,
               obs_aabb_rows, *, num_rob_tiles, num_obs_tiles,
               rob_tile=LANE, obs_tile=LANE, inner_exit=True,
               interpret=False, sweep=True, stats=True, stage_cap=2,
               hot_thresh=1024.0, best_first=True):
    b = poses.shape[0]
    assert b % CONFS_PER_PROGRAM == 0, (b, CONFS_PER_PROGRAM)
    tr = rob_base.shape[1]
    to = obs_t.shape[0]
    kernel = functools.partial(
        _kernel, num_rob_tiles=num_rob_tiles, num_obs_tiles=num_obs_tiles,
        rob_tile=rob_tile, obs_tile=obs_tile, inner_exit=inner_exit,
        sweep=sweep, stats=stats, stage_cap=stage_cap, hot_thresh=hot_thresh,
        best_first=best_first,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // CONFS_PER_PROGRAM,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((num_obs_tiles, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CONFS_PER_PROGRAM, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tr), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, _O_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, to), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CONFS_PER_PROGRAM, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, LANE), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((CONFS_PER_PROGRAM, _R_ROWS, tr), jnp.float32),
            pltpu.VMEM((CONFS_PER_PROGRAM, LANE), jnp.float32),
            pltpu.VMEM(
                (CONFS_PER_PROGRAM, _gate_cols(num_rob_tiles, num_obs_tiles)),
                jnp.float32,
            ),
        ],
        # v5e has 128 MB of VMEM; the default 16 MB scoped limit rejects
        # chunked-checker table sizes (2k robot / 8k obstacle triangles)
        # that comfortably fit. 64 MB: the cap-sized chunk pair's scoped
        # allocation measured 49.1 MB (stage-1 temporaries, round 4).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(obs_mesh_aabb, obs_group_aabbs, poses, rob_base, obs_t, obs_aabb_rows)


def poses_from_confs(confs: jnp.ndarray) -> jnp.ndarray:
    """[B,6] configurations -> [B,16] flattened (R | t) pose rows."""
    R = rotation_matrices(confs)  # [B,3,3]
    t = confs[:, 0:3]
    b = confs.shape[0]
    pad = jnp.zeros((b, 4), dtype=jnp.float32)
    return jnp.concatenate(
        [
            R[:, 0, :], t[:, 0:1],
            R[:, 1, :], t[:, 1:2],
            R[:, 2, :], t[:, 2:3],
            pad,
        ],
        axis=1,
    )


# Columns of the kernel output (an SMEM block, so no trimming pass needed).
# 0=valid, 1=coplanar, 2=num_pairs (mini-AABB-overlapping), 3=broad,
# 4=nfull (tiles that ran the plane stage), 5=ngate (tiles gated off by the
# empty mini-AABB mask), 6=nrest (tiles that ran the interval stage).
OUT_COLS = 8


@functools.partial(jax.jit, static_argnames=("num_rob_tiles", "num_obs_tiles",
                                             "rob_tile", "obs_tile",
                                             "interpret"))
def _check_block_impl(confs, obs_mesh, obs_grp, rob_base, obs_t,
                      obs_aabb_rows, *, num_rob_tiles,
                      num_obs_tiles, rob_tile=LANE, obs_tile=LANE,
                      interpret=False):
    """Fused block check: pose construction + kernel + column trim, one jit.

    Trimming to OUT_COLS on-device matters: the kernel's [B, 128] int32
    output would otherwise cross the device->host link 16x wider than
    needed (profiled as the dominant cost of a hard-dataset run)."""
    out = _mega_call(
        poses_from_confs(confs), obs_mesh, obs_grp, rob_base, obs_t,
        obs_aabb_rows,
        num_rob_tiles=num_rob_tiles, num_obs_tiles=num_obs_tiles,
        rob_tile=rob_tile, obs_tile=obs_tile,
        interpret=interpret,
    )
    return out[:, :OUT_COLS]


@functools.partial(jax.jit, static_argnames=("num_rob_tiles", "num_obs_tiles",
                                             "rob_tile", "obs_tile",
                                             "inner_exit", "interpret",
                                             "sweep", "stage_cap",
                                             "hot_thresh",
                                             "best_first"))
def _check_block_packed(confs, obs_mesh, obs_grp, rob_base, obs_t,
                        obs_aabb_rows, *, num_rob_tiles,
                        num_obs_tiles, rob_tile=LANE, obs_tile=LANE,
                        inner_exit=True, interpret=False, sweep=True,
                        stage_cap=2, hot_thresh=1024.0,
                        best_first=True):
    # stats=False: verdict bits only — drops the per-tile pair-count
    # reduction and one cond level per gated tile (a measured ~2x sweep
    # win); the impl path keeps full counters for the stats surface.
    """Like `_check_block_impl` but returns a [B] uint8 packed verdict
    (bit 0 = valid, bit 1 = coplanar-pair-seen): 1 byte/config over the
    device->host link instead of 32 — the link, not the kernel, limits
    large-batch throughput on tunneled/tethered deployments."""
    out = _mega_call(
        poses_from_confs(confs), obs_mesh, obs_grp, rob_base, obs_t,
        obs_aabb_rows,
        num_rob_tiles=num_rob_tiles, num_obs_tiles=num_obs_tiles,
        rob_tile=rob_tile, obs_tile=obs_tile, inner_exit=inner_exit,
        interpret=interpret, sweep=sweep, stats=False, stage_cap=stage_cap,
        hot_thresh=hot_thresh, best_first=best_first,
    )
    return (out[:, 0] | (out[:, 1] << 1)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=())
def _broad_sort(confs, corner_pts, corner_mask, obs_lo, obs_hi):
    """Device-side presort for the streamed path: broad phase + stable
    partition with broad-phase HITS first. Returns (sorted_confs, dest)
    where dest[i] is row i's position in the sorted array (so un-permuting
    the packed verdicts is a plain row gather). Implemented with cumsums +
    one iota scatter + row gathers — a real argsort is O(n log^2 n)
    comparator stages on TPU and measured tens of ms at 100k rows, while
    this is linear. Runs entirely on device so the streamed dispatch
    pipeline never pays a host round trip (a blocking broad-phase fetch
    measured ~90 ms on the tethered link vs ~0.1 ms of device time)."""
    hits = _broad_overlap(confs, corner_pts, corner_mask, obs_lo, obs_hi)
    n = confs.shape[0]
    nh = jnp.cumsum(hits.astype(jnp.int32))
    n_hit = nh[-1]
    nm = jnp.cumsum(jnp.logical_not(hits).astype(jnp.int32))
    dest = jnp.where(hits, nh - 1, n_hit + nm - 1)
    src = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True
    )
    return confs[src], dest, n_hit


@functools.partial(jax.jit, static_argnames=("chunk",))
def _slice_chunk(arr, lo, *, chunk):
    return jax.lax.dynamic_slice(arr, (lo, 0), (chunk, arr.shape[1]))


@functools.partial(jax.jit, static_argnames=())
def _unpermute(packed_sorted, dest):
    return packed_sorted[dest]


@functools.partial(jax.jit, static_argnames=())
def _robot_bounds(confs, corner_pts, corner_mask):
    """Per-config robot AABB (lo[B,3], hi[B,3]) — the expensive half of the
    broad phase, computed once and compared against any number of obstacle
    boxes on the host. Bit-identical FP order to `_broad_overlap` (whose
    final comparisons are plain f32 <=, exactly reproducible in numpy).
    The K-box variant was first written as one fused [K,B,3] jit; XLA's
    fusion fell apart and a blocking call cost ~300 ms — computing bounds
    on device and comparing on host is one small fetch instead."""
    R = rotation_matrices(confs)  # [B,3,3]
    t = confs[:, 0:3]
    x, y, z = corner_pts[:, 0], corner_pts[:, 1], corner_pts[:, 2]
    c0 = R[:, None, :, 0]
    c1 = R[:, None, :, 1]
    c2 = R[:, None, :, 2]
    v = x[None, :, None] * c0 + y[None, :, None] * c1 + z[None, :, None] * c2
    v = v + t[:, None, :]  # [B, C, 3]
    big = jnp.float32(3.0e38)
    lo = jnp.min(jnp.where(corner_mask[None, :, None], v, big), axis=1)
    hi = jnp.max(jnp.where(corner_mask[None, :, None], v, -big), axis=1)
    return lo, hi


@functools.partial(jax.jit, static_argnames=())
def _broad_overlap(confs, corner_pts, corner_mask, obs_lo, obs_hi):
    """Mesh-level broad phase over pre-gathered corners — bit-identical FP
    order to the kernel's stage 1/2 (transform as r·X sums, masked min/max,
    <= interval tests), so two-phase dispatch never disagrees with the fused
    path about which configurations can be skipped."""
    R = rotation_matrices(confs)  # [B,3,3]
    t = confs[:, 0:3]
    x, y, z = corner_pts[:, 0], corner_pts[:, 1], corner_pts[:, 2]
    c0 = R[:, None, :, 0]
    c1 = R[:, None, :, 1]
    c2 = R[:, None, :, 2]
    v = x[None, :, None] * c0 + y[None, :, None] * c1 + z[None, :, None] * c2
    v = v + t[:, None, :]  # [B, C, 3]
    big = jnp.float32(3.0e38)
    lo = jnp.min(jnp.where(corner_mask[None, :, None], v, big), axis=1)
    hi = jnp.max(jnp.where(corner_mask[None, :, None], v, -big), axis=1)
    return jnp.all((lo <= obs_hi) & (obs_lo <= hi), axis=-1)  # [B] bool


class MegaKernelChecker:
    """Drop-in fast path: same verdicts as the XLA pipeline, one fused kernel.

    Returns (valid, coplanar, num_pairs, broad_hit) device arrays via
    ``check_block``; `CollisionWorld`-style host convenience via ``check``.

    ``check`` defaults to two-phase dispatch: a cheap XLA broad phase over
    the whole batch, then the fused kernel only on configurations whose mesh
    AABBs overlap the obstacle (the reference's skip-if-already-valid
    contract, `narrow-phase.cu:698-699`, done batch-level). On sparse
    datasets this removes almost all kernel work.
    """

    def __init__(self, robot: Mesh, obstacle: Mesh, morton: bool = True,
                 interpret: bool = False, rob_tile: int = LANE,
                 obs_tile: int = LANE):
        self.robot = robot
        self.obstacle = obstacle
        self.prep = MegaKernelPrep.build(robot, obstacle, morton=morton,
                                         rob_tile=rob_tile,
                                         obs_tile=obs_tile)
        self._rob_base = jnp.asarray(self.prep.rob_base)
        self._obs_t = jnp.asarray(self.prep.obs_t)
        self._obs_aabb_rows = jnp.asarray(self.prep.obs_aabb_rows)
        self._obs_mesh = jnp.asarray(self.prep.obs_mesh_aabb)
        self._obs_grp = jnp.asarray(self.prep.obs_group_aabbs)
        self._interpret = interpret
        # Corner table for the XLA broad phase: [3*Tr, 3] points + valid mask.
        rb = self.prep.rob_base
        pts = rb[0:9].T.reshape(-1, 3, 3)  # [Tr, 3 corners, 3 xyz]
        self._corner_pts = jnp.asarray(pts.reshape(-1, 3))  # [3*Tr, 3]
        self._corner_mask = jnp.asarray(np.repeat(rb[9] > 0, 3))
        self._obs_lo = jnp.asarray(self.prep.obs_mesh_aabb[0, 0:3])
        self._obs_hi = jnp.asarray(self.prep.obs_mesh_aabb[0, 3:6])

    def check_block(self, confs: jnp.ndarray) -> jnp.ndarray:
        """[B,6] device confs -> [B, OUT_COLS] int32 kernel output."""
        return _check_block_impl(
            confs, self._obs_mesh, self._obs_grp, self._rob_base, self._obs_t,
            self._obs_aabb_rows,
            num_rob_tiles=self.prep.num_rob_tiles,
            num_obs_tiles=self.prep.num_obs_tiles,
            rob_tile=self.prep.rob_tile, obs_tile=self.prep.obs_tile,
            interpret=self._interpret,
        )

    def broad_block(self, confs: jnp.ndarray) -> jnp.ndarray:
        """[B,6] -> [B] bool mesh-AABB overlap (True = needs narrow phase)."""
        return _broad_overlap(
            confs, self._corner_pts, self._corner_mask, self._obs_lo,
            self._obs_hi,
        )

    @staticmethod
    def _pad_block(n: int) -> int:
        """Round survivor counts to a coarse grid to bound recompiles while
        keeping padding waste low (<= 1/8 of the batch)."""
        if n <= 256:
            return max(round_up(n, CONFS_PER_PROGRAM), CONFS_PER_PROGRAM)
        if n <= 4096:
            return 1 << (n - 1).bit_length()
        step = 1 << ((n - 1).bit_length() - 3)  # 1/8 granularity
        return round_up(n, step)

    # Streaming chunk size: big enough to amortize dispatch, small enough
    # that uploads of chunk i+1 overlap the kernel of chunk i.
    STREAM_CHUNK = 16384

    def check_valid(self, confs: np.ndarray, chunk: int | None = None,
                    presort: bool | None = None):
        """Throughput path: [N,6] configs -> (valid[N], coplanar[N]) bool.

        Single-phase (the kernel's in-kernel broad phase handles misses) and
        streamed: the batch is cut into fixed-shape chunks whose H2D upload,
        kernel, and 1-byte/config packed D2H pipeline against each other via
        JAX async dispatch — no host sync between phases, no survivor
        re-upload. Same verdicts as ``check``
        (tests/test_megakernel.py::TestCheckValid asserts it).

        ``presort`` (default OFF — on this tethered deployment its one
        scalar sync costs more than the dispatches it saves; opt in on
        direct-attached deployments) first runs the cheap XLA broad phase —
        bit-identical FP order to the kernel's stage 1 — over the whole
        batch and orders broad-phase HITS first. Chunks past the hits are never dispatched (a broad miss is
        `valid=True, coplanar=False` by construction), and hit-dense chunks
        skip the per-program gate-precompute waste that randomly scattered
        hits cause. Verdicts are identical either way; this is the
        reference's skip-if-already-valid contract
        (`narrow-phase.cu:698-699`) at batch scale with static shapes.
        """
        confs = validate_confs(confs)
        n = confs.shape[0]
        finite = np.isfinite(confs).all(axis=1)
        if not finite.all():
            out_v = np.zeros((n,), dtype=bool)
            out_c = np.zeros((n,), dtype=bool)
            if finite.any():
                v, c = self.check_valid(confs[finite], chunk=chunk,
                                        presort=presort)
                out_v[finite] = v
                out_c[finite] = c
            return out_v, out_c
        chunk = chunk or self.STREAM_CHUNK
        chunk = max(CONFS_PER_PROGRAM, chunk - chunk % CONFS_PER_PROGRAM)
        if presort is None:
            # Default OFF: on this tethered deployment the one scalar sync
            # (~30-40 ms link round trip) costs more than the dispatches it
            # saves, measured on both datasets. On a directly-attached TPU
            # (sync ~0.1 ms) presort wins on sparse batches — opt in.
            presort = False
        if presort:
            # Fully device-side: broad phase, hits-first argsort, gather,
            # per-chunk kernel dispatches on the sorted array, inverse
            # permutation — then ONE packed fetch. No host sync anywhere in
            # the pipeline (the blocking broad fetch this replaces cost
            # ~90 ms on the tethered link). Sorting clusters broad hits into
            # few programs, so all-miss programs take the vectorized store
            # path and skip gate precompute; verdicts are identical (the
            # broad phase is the kernel's own stage 1, bit for bit, and
            # configurations are independent).
            padded = ((n + chunk - 1) // chunk) * chunk
            cpad = confs
            if padded > n:
                tail = np.zeros((padded - n, 6), dtype=np.float32)
                tail[:, 0] = 1.0e9  # far away: sorts to the miss tail
                cpad = np.concatenate([confs, tail], axis=0)
            sorted_confs, dest, n_hit = _broad_sort(
                jnp.asarray(cpad), self._corner_pts, self._corner_mask,
                self._obs_lo, self._obs_hi,
            )
            # ONE scalar sync: how many chunks actually contain broad hits.
            # Chunks past that are never dispatched — a broad miss is
            # valid=True/coplanar=False by construction, so their packed
            # byte is the constant 1, filled on device.
            k = int(np.asarray(n_hit))
            nchunks = (min(k, n) + chunk - 1) // chunk
            outs = []
            for ci in range(nchunks):
                part = _slice_chunk(sorted_confs, ci * chunk, chunk=chunk)
                outs.append(
                    _check_block_packed(
                        part, self._obs_mesh, self._obs_grp,
                        self._rob_base, self._obs_t, self._obs_aabb_rows,
                        num_rob_tiles=self.prep.num_rob_tiles,
                        num_obs_tiles=self.prep.num_obs_tiles,
                        rob_tile=self.prep.rob_tile,
                        obs_tile=self.prep.obs_tile,
                        interpret=self._interpret,
                    )
                )
            if nchunks * chunk < padded:
                outs.append(jnp.ones((padded - nchunks * chunk,),
                                     dtype=jnp.uint8))
            packed = _unpermute(
                outs[0] if len(outs) == 1 else jnp.concatenate(outs), dest
            )
            packed = np.asarray(packed)[:n]
            return (packed & 1).astype(bool), (packed >> 1).astype(bool)
        outs = []
        for lo in range(0, n, chunk):
            part = confs[lo : lo + chunk]
            if part.shape[0] < chunk:
                # Pad rows far away: they exit at the in-kernel broad phase.
                pad = np.zeros((chunk - part.shape[0], 6), dtype=np.float32)
                pad[:, 0] = 1.0e9
                part = np.concatenate([part, pad], axis=0)
            outs.append(
                _check_block_packed(
                    jnp.asarray(part), self._obs_mesh, self._obs_grp,
                    self._rob_base, self._obs_t, self._obs_aabb_rows,
                    num_rob_tiles=self.prep.num_rob_tiles,
                    num_obs_tiles=self.prep.num_obs_tiles,
                    rob_tile=self.prep.rob_tile,
                    obs_tile=self.prep.obs_tile,
                    interpret=self._interpret,
                )
            )
        # Concatenate on device: ONE device->host fetch for the whole batch
        # (each fetch pays the link's fixed round-trip latency).
        packed = np.asarray(outs[0] if len(outs) == 1
                            else jnp.concatenate(outs))[:n]
        return (packed & 1).astype(bool), (packed >> 1).astype(bool)

    def check_valid_resolved(self, confs: np.ndarray,
                             chunk: int | None = None) -> np.ndarray:
        """``check_valid`` + exact float64 resolution of coplanar-flagged
        configurations (`oracle.resolve_coplanar`) — the verdict surface
        consumers should certify against. Returns valid[N] bool."""
        from ..oracle import resolve_coplanar

        valid, cop = self.check_valid(confs, chunk=chunk)
        return resolve_coplanar(self.robot, self.obstacle, confs, valid, cop)

    def check(self, confs: np.ndarray, two_phase: bool = True):
        confs = validate_confs(confs)
        n = confs.shape[0]
        # Non-finite configurations are not poses; never report them valid
        # (NaN comparisons would otherwise sail through the broad phase).
        finite = np.isfinite(confs).all(axis=1)
        if not finite.all():
            out_v = np.zeros((n,), dtype=bool)
            out_c = np.zeros((n,), dtype=bool)
            out_p = np.zeros((n,), dtype=np.int32)
            out_b = np.ones((n,), dtype=bool)
            if finite.any():
                v, c, p, b = self.check(confs[finite], two_phase=two_phase)
                out_v[finite] = v
                out_c[finite] = c
                out_p[finite] = p
                out_b[finite] = b
            return out_v, out_c, out_p, out_b
        if not two_phase:
            pad = (-n) % CONFS_PER_PROGRAM
            if pad:
                confs = np.pad(confs, ((0, pad), (0, 0)))
            out = np.asarray(self.check_block(jnp.asarray(confs)))[:n]
            return (out[:, 0].astype(bool), out[:, 1].astype(bool),
                    out[:, 2], out[:, 3].astype(bool))

        # Phase 1: broad phase over the whole batch (pad to a coarse grid).
        bpad = self._pad_block(max(n, 1))
        cpad = np.pad(confs, ((0, bpad - n % bpad if n % bpad else 0), (0, 0)))
        overlap = np.asarray(self.broad_block(jnp.asarray(cpad)))[:n]

        valid = np.ones((n,), dtype=bool)
        coplanar = np.zeros((n,), dtype=bool)
        num_pairs = np.zeros((n,), dtype=np.int32)

        idx = np.nonzero(overlap)[0]
        if idx.size:
            # Phase 2: fused kernel on survivors only. Padding rows are
            # placed far away so they exit at the kernel's broad phase.
            m = self._pad_block(idx.size)
            surv = np.zeros((m, 6), dtype=np.float32)
            surv[:, 0] = 1.0e9
            surv[: idx.size] = confs[idx]
            out = np.asarray(self.check_block(jnp.asarray(surv)))[: idx.size]
            valid[idx] = out[:, 0].astype(bool)
            coplanar[idx] = out[:, 1].astype(bool)
            num_pairs[idx] = out[:, 2]
        return valid, coplanar, num_pairs, overlap
