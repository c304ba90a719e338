#!/usr/bin/env python3
"""Offline (numpy) study of tile-gate designs for the megakernel sweep.

Round-4 design driver: the roofline showed valid broad-hit configurations
visit 3.34 gated 128x128 tiles but only 0.84 have a non-empty pair mask —
each wasted visit costs ~0.5 us of serialized mask+any()+cond machinery.
This script measures, on REAL hard-dataset configurations, how close each
candidate gate design gets to the exact non-empty-mask tile set:

  current   row (rob TRI box vs obs 128-group box) AND
            col (obs TRI box vs rob 128-group box)       — marginal tests
  joint16   rob 16-tri sub-box vs obs 16-tri sub-box,
            any() over each tile's 8x8 sub-pair block     — joint locality
  absR16    like joint16 but the rob sub-box is the rotated BASE sub-box's
            enclosing box (c' = R c + t, e' = |R| e) — what the kernel can
            compute in O(sub-boxes) instead of O(triangles)
  exact     any pair-box overlap in the tile (the floor)

plus live-slab statistics (16-obs-row slabs with any masked pair) to size a
slab-level sweep. Pure numpy over a config sample; no TPU needed.

    JAX_PLATFORMS=cpu python scripts/gate_study.py [--n 1024]
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def box_overlap(lo_a, hi_a, lo_b, hi_b):
    """[A,3],[A,3] vs [B,3],[B,3] -> [A,B] bool."""
    return (
        (lo_a[:, None] <= hi_b[None]) & (lo_b[None] <= hi_a[:, None])
    ).all(axis=-1)


def block_any(m, rows, cols):
    """[R,C] bool -> [R//rows, C//cols] any-reduce."""
    r, c = m.shape
    return m.reshape(r // rows, rows, c // cols, cols).any(axis=(1, 3))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--dataset", default="hard100k")
    args = ap.parse_args()

    import jax.numpy as jnp

    from robocheck_tpu.io import assets
    from robocheck_tpu.io.conf import read_conf_file
    from robocheck_tpu.io.obj import load_obj
    from robocheck_tpu.kernels.megakernel import MegaKernelPrep
    from robocheck_tpu.ops.transform import rotation_matrices

    robot = load_obj(assets.alpha_robot_path())
    obstacle = load_obj(assets.alpha_obstacle_path())
    prep = MegaKernelPrep.build(robot, obstacle)
    ds = read_conf_file(assets.dataset_path(args.dataset))

    # Robot base corners in prep (Morton) order: [Tr, 3 corners, 3 xyz].
    rb = prep.rob_base
    tr_total = rb.shape[1]
    base = rb[0:9].T.reshape(tr_total, 3, 3).astype(np.float64)
    rob_valid = rb[9] > 0
    n_real = int(rob_valid.sum())

    # Obstacle per-tri boxes (inf-padded) and mesh box from prep.
    obs_lo = prep.obs_t[:, 13:16].astype(np.float64)
    obs_hi = prep.obs_t[:, 16:19].astype(np.float64)
    to_total = obs_lo.shape[0]

    SUB = 16
    n_rsub = tr_total // SUB
    n_osub = to_total // SUB
    TILE = 128
    n_rt = tr_total // TILE
    n_ot = to_total // TILE

    # Obstacle sub-boxes (exact, static).
    oslo = obs_lo.reshape(n_osub, SUB, 3).min(axis=1)
    oshi = obs_hi.reshape(n_osub, SUB, 3).max(axis=1)
    # Obstacle tile group boxes (prep's, recomputed).
    oglo = obs_lo.reshape(n_ot, TILE, 3).min(axis=1)
    oghi = obs_hi.reshape(n_ot, TILE, 3).max(axis=1)

    # Robot BASE sub-box centers / half-extents for the absR variant
    # (padding tris excluded via +/-inf so empty groups never overlap).
    big = 1e30
    blo = np.where(rob_valid[:, None], base.min(axis=1), big)
    bhi = np.where(rob_valid[:, None], base.max(axis=1), -big)
    bslo = blo.reshape(n_rsub, SUB, 3).min(axis=1)
    bshi = bhi.reshape(n_rsub, SUB, 3).max(axis=1)
    empty_rsub = bslo[:, 0] > bshi[:, 0]
    bc = np.where(empty_rsub[:, None], 0.0, (bslo + bshi) / 2)
    be = np.where(empty_rsub[:, None], -big, (bshi - bslo) / 2)

    # Broad-phase sample: first --n broad-hit configs of the dataset.
    confs = ds.confs
    R_all = np.asarray(rotation_matrices(jnp.asarray(confs)),
                       dtype=np.float64)
    om_lo = prep.obs_mesh_aabb[0, 0:3].astype(np.float64)
    om_hi = prep.obs_mesh_aabb[0, 3:6].astype(np.float64)

    stats = {k: {True: [], False: []} for k in
             ("current", "joint16", "absR16", "absR16_and_cur", "exact",
              "slabs_exact", "slabs_at_absR16", "subpairs16",
              "slab_cand", "hot_visits", "cold_visits", "row16col_tiles")}
    taken = 0
    for ci in range(confs.shape[0]):
        if taken >= args.n:
            break
        R = R_all[ci]
        t = confs[ci, 0:3].astype(np.float64)
        tv = base @ R.T + t  # [Tr,3,3]
        tlo = np.where(rob_valid[:, None], tv.min(axis=1), big)
        thi = np.where(rob_valid[:, None], tv.max(axis=1), -big)
        mlo = tlo[:n_real].reshape(-1, 3).min(axis=0)
        mhi = thi[:n_real].reshape(-1, 3).max(axis=0)
        if not ((mlo <= om_hi) & (om_lo <= mhi)).all():
            continue  # broad miss: kernel already skips these
        taken += 1
        v = bool(ds.valid[ci])

        # Exact pair mask, tile-reduced.
        M = box_overlap(tlo, thi, obs_lo, obs_hi)  # [Tr, To]
        exact = block_any(M, TILE, TILE)  # [n_rt, n_ot]

        # Current gates.
        rg_lo = tlo.reshape(n_rt, TILE, 3).min(axis=1)
        rg_hi = thi.reshape(n_rt, TILE, 3).max(axis=1)
        row = block_any(box_overlap(tlo, thi, oglo, oghi), TILE, 1)
        col = box_overlap(rg_lo, rg_hi, obs_lo, obs_hi)  # [n_rt, To]
        col = col.reshape(n_rt, n_ot, TILE).any(axis=2)
        current = row & col

        # Joint16 exact sub-boxes.
        rslo = tlo.reshape(n_rsub, SUB, 3).min(axis=1)
        rshi = thi.reshape(n_rsub, SUB, 3).max(axis=1)
        S16 = box_overlap(rslo, rshi, oslo, oshi)  # [n_rsub, n_osub]
        joint16 = block_any(S16, TILE // SUB, TILE // SUB)

        # absR16: conservative rotated-base sub-boxes.
        ac = bc @ R.T + t
        ae = be @ np.abs(R).T
        A16 = box_overlap(ac - ae, ac + ae, oslo, oshi)
        absr16 = block_any(A16, TILE // SUB, TILE // SUB)

        stats["current"][v].append(current.sum())
        stats["joint16"][v].append(joint16.sum())
        stats["absR16"][v].append(absr16.sum())
        stats["absR16_and_cur"][v].append((absr16 & current).sum())
        stats["exact"][v].append(exact.sum())
        # Slab stats: obs-16 slabs (per visited tile) with any masked pair.
        slab = M.reshape(tr_total, n_osub, SUB).any(axis=2)  # [Tr, n_osub]
        slab_t = slab.reshape(n_rt, TILE, n_osub).any(axis=1)  # rob-tile x obs-sub
        stats["slabs_exact"][v].append(int(slab_t.sum()))
        # Slabs the kernel would touch under the absR16 gate: obs-subs with
        # any absR16 sub-pair, per rob TILE.
        at = A16.reshape(n_rt, TILE // SUB, n_osub).any(axis=1)
        stats["slabs_at_absR16"][v].append(int(at.sum()))
        stats["subpairs16"][v].append(int(A16.sum()))

        # Slab candidates under the cheap IN-SWEEP test the kernel can run
        # per visited tile for ~0.01 us: rob TRI boxes (tile i) vs obs
        # SUB-boxes (tile j's 8 slabs) — [8,128] ops, 1 vreg. Counted over
        # currently-gated tiles only (that's what gets visited).
        tri_slab = box_overlap(oslo, oshi, tlo, thi)  # [n_osub, Tr]
        ts = tri_slab.reshape(n_ot, TILE // SUB, n_rt, TILE).any(axis=3)
        # ts[j, s, i] -> candidate slab (i, j, s); gate by current[i, j].
        cand = ts.transpose(2, 0, 1) & current[:, :, None]
        stats["slab_cand"][v].append(int(cand.sum()))

        # Refined tile gate: row at (rob tri x obs SUB) + current col —
        # tile (i,j) gated only if some slab candidate exists.
        row16 = cand.any(axis=2)
        stats["row16col_tiles"][v].append(int((row16 & current).sum()))

        # Hot/cold split of current-gated tiles (hot_thresh=1024 on
        # rowcount*colcount, as in stage 1).
        rowc = box_overlap(tlo, thi, oglo, oghi)  # [Tr, n_ot]
        rowc = rowc.reshape(n_rt, TILE, n_ot).sum(axis=1)  # [n_rt, n_ot]
        colc = box_overlap(rg_lo, rg_hi, obs_lo, obs_hi)
        colc = colc.reshape(n_rt, n_ot, TILE).sum(axis=2)
        hot = current & (rowc * colc >= 1024)
        stats["hot_visits"][v].append(int(hot.sum()))
        stats["cold_visits"][v].append(int((current & ~hot).sum()))

    out = {"n": taken, "dataset": args.dataset}
    for k, d in stats.items():
        for v in (True, False):
            a = np.asarray(d[v], dtype=np.float64)
            if a.size:
                out[f"{k}_{'valid' if v else 'coll'}"] = round(
                    float(a.mean()), 3)
    out["n_valid"] = len(stats["exact"][True])
    out["n_coll"] = len(stats["exact"][False])
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
