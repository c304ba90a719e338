"""Mega-kernel tests (interpret mode on CPU; the real-hardware equivalence is
exercised by bench.py's golden gate on TPU).

The kernel must agree with the pure-XLA pipeline (same FP semantics) and with
the float64 oracle on synthetic scenes small enough for interpret mode.
"""
import numpy as np
import pytest

from robocheck_tpu.kernels.megakernel import (
    CONFS_PER_PROGRAM,
    MegaKernelChecker,
    MegaKernelPrep,
)
from robocheck_tpu.models.shapes import icosphere, tetrahedron
from robocheck_tpu.ops.pipeline import CollisionWorld, PipelineConfig
from robocheck_tpu.oracle import cpu_oracle


@pytest.fixture(scope="module")
def sphere_world():
    robot = icosphere(1, radius=1.0, name="robot")  # 80 triangles
    obstacle = icosphere(1, radius=1.5, name="obstacle")
    return robot, obstacle


@pytest.fixture(scope="module")
def sphere_confs(rng=None):
    rng = np.random.default_rng(77)
    confs = np.zeros((16, 6), dtype=np.float32)
    # Mix of: deep overlap, shell-crossing, near-miss, far-away.
    confs[:, 0] = np.concatenate(
        [
            rng.uniform(0.0, 0.4, 4),     # robot inside obstacle -> no surface hit
            rng.uniform(0.4, 2.6, 6),     # shells cross
            rng.uniform(2.6, 2.7, 2),     # near miss
            rng.uniform(5.0, 50.0, 4),    # far away
        ]
    ).astype(np.float32)
    confs[:, 3:6] = rng.uniform(-np.pi, np.pi, (16, 3)).astype(np.float32)
    return confs


def test_kernel_matches_xla_pipeline(sphere_world, sphere_confs):
    robot, obstacle = sphere_world
    mk = MegaKernelChecker(robot, obstacle, interpret=True)
    valid_k, cop_k, _, _ = mk.check(sphere_confs)

    world = CollisionWorld(
        robot, obstacle,
        PipelineConfig(batch_block=16, narrow_chunk=8, max_pairs=4096),
    )
    valid_x = world.check(sphere_confs)
    np.testing.assert_array_equal(valid_k, valid_x)


def test_kernel_matches_oracle(sphere_world, sphere_confs):
    robot, obstacle = sphere_world
    mk = MegaKernelChecker(robot, obstacle, interpret=True)
    valid_k, _, _, _ = mk.check(sphere_confs)
    valid_o = cpu_oracle.check_configs(robot, obstacle, sphere_confs)
    np.testing.assert_array_equal(valid_k, valid_o)


def test_kernel_tetrahedra_fixture():
    # The reference's 2-config fixture: interlocking tetrahedra collide at
    # the identity pose and are clear at +100x (`test-narrow-phase.cu:628-686`).
    # (Coincident identical tetrahedra would NOT register: every pair is
    # coplanar or edge-sharing, which the TOL-band semantics skip — same as
    # the reference kernels.)
    from robocheck_tpu.core.types import Mesh

    robot = tetrahedron()
    obs_pts = np.array(
        [[1, 0.1, 0], [1.5, 1, 2.2], [1, 2.4, 0], [3.3, 2, 2]], np.float32
    )
    obstacle = Mesh(obs_pts, robot.triangles, "obs-tetra")
    mk = MegaKernelChecker(robot, obstacle, interpret=True)
    confs = np.zeros((2, 6), np.float32)
    confs[1, 0] = 100.0
    valid, cop, npairs, broad = mk.check(confs)
    assert not valid[0]
    assert valid[1]
    assert broad[0] and not broad[1]


def test_mismatched_scale_coplanar_precheck():
    # ADVICE r3 (medium): when every plane-coefficient ratio |nr/no| is
    # itself below TOL (~4 orders of mesh-scale mismatch), the full
    # component-ratio test declares pairs coplanar via _isclose's
    # both-small branch, but the parallel-normal |D| precheck never fires —
    # the kernel then skipped the coplanar flag and reported a raw hit,
    # diverging from ops.narrow. The precheck's sub-TOL-ratio branch now
    # covers it; this is the differential fixture: unit robot vs a 1e4x
    # obstacle (plane coeffs O(1) vs O(1e8..1e12)). The robot is a box
    # CENTERED at its own origin so that any pose whose translation lies on
    # an obstacle face plane straddles that plane for every rotation
    # (corners come in +/- pairs).
    from robocheck_tpu.models.shapes import box

    robot = box(extent=(2.0, 2.0, 2.0))
    obstacle = tetrahedron(scale=1.0e4)
    mk = MegaKernelChecker(robot, obstacle, interpret=True)
    world = CollisionWorld(
        robot, obstacle,
        PipelineConfig(batch_block=8, narrow_chunk=8, max_pairs=4096,
                       resolve_coplanar=False),
    )
    rng = np.random.default_rng(3)
    confs = np.zeros((8, 6), dtype=np.float32)
    # Rows 0-4: ON the big tetra's slanted face x - 2y - z + 4e4 = 0 (and
    # just off it), where every component ratio is sub-TOL -> ratio-coplanar
    # pairs. Rows 5-6: on the x=0 face, whose normal has zero y/z components
    # while the robot's are generic -> zero-pattern mismatch, NOT coplanar.
    # Row 7: far away.
    confs[:, 0:3] = np.array(
        [
            [6.0e3, 1.8e4, 1.0e4],
            [6.0e3 + 0.5, 1.8e4, 1.0e4],
            [2.0e4 - 10.0, 1.9e4, 1.99e4],
            [0.0, 1.99e4, 5.0],
            [6.0e3, 1.8e4, 1.0e4 - 2.0],
            [0.0, 5.0e3, 5.0e3],
            [1.0, 5.0e3, 5.0e3],
            [9.0e5, 9.0e5, 9.0e5],
        ],
        dtype=np.float32,
    )
    confs[:, 3:6] = rng.uniform(-np.pi, np.pi, (8, 3)).astype(np.float32)
    valid_k, cop_k, _, _ = mk.check(confs)
    valid_x, res = world.check(confs, return_result=True)
    np.testing.assert_array_equal(valid_k, valid_x)
    np.testing.assert_array_equal(cop_k, res.coplanar)
    # The fixture must actually exercise the sub-TOL branch.
    assert cop_k.any()
    # End-to-end resolved surface agrees with the float64 oracle.
    resolved = mk.check_valid_resolved(confs)
    np.testing.assert_array_equal(
        resolved, cpu_oracle.check_configs(robot, obstacle, confs)
    )


def test_morton_off_same_verdicts(sphere_world, sphere_confs):
    robot, obstacle = sphere_world
    a = MegaKernelChecker(robot, obstacle, morton=True, interpret=True)
    b = MegaKernelChecker(robot, obstacle, morton=False, interpret=True)
    va, *_ = a.check(sphere_confs)
    vb, *_ = b.check(sphere_confs)
    np.testing.assert_array_equal(va, vb)


def test_packed_matches_stats_path(sphere_world, sphere_confs):
    # The packed throughput flow (stats=False, verdict bits only) must
    # agree bit for bit with the full counters path on the same batch.
    # (This replaces the removed slab_sweep/contact_slabs variant-equality
    # tests — both variants were measured losers and deleted; receipts in
    # DESIGN.md "Measured roofline" and git history.)
    import jax.numpy as jnp

    from robocheck_tpu.kernels import megakernel as mk
    from robocheck_tpu.kernels.megakernel import CONFS_PER_PROGRAM

    robot, obstacle = sphere_world
    ck = MegaKernelChecker(robot, obstacle, interpret=True)
    n = (len(sphere_confs) + CONFS_PER_PROGRAM - 1) // CONFS_PER_PROGRAM
    confs = np.zeros((n * CONFS_PER_PROGRAM, 6), np.float32)
    confs[:, 0] = 1.0e9
    confs[: len(sphere_confs)] = sphere_confs

    packed = np.asarray(mk._check_block_packed(
        jnp.asarray(confs), ck._obs_mesh, ck._obs_grp, ck._rob_base,
        ck._obs_t, ck._obs_aabb_rows,
        num_rob_tiles=ck.prep.num_rob_tiles,
        num_obs_tiles=ck.prep.num_obs_tiles,
        interpret=True,
    ))
    stats = np.asarray(ck.check_block(jnp.asarray(confs)))
    np.testing.assert_array_equal(packed & 1, stats[:, 0].astype(np.uint8))
    np.testing.assert_array_equal(packed >> 1, stats[:, 1].astype(np.uint8))


def test_prep_shapes(alpha_meshes):
    robot, obstacle = alpha_meshes
    prep = MegaKernelPrep.build(robot, obstacle)
    assert prep.rob_base.shape == (16, 1024)
    assert prep.obs_t.shape == (1024, 24)
    assert prep.num_rob_tiles == 8
    assert prep.num_obs_tiles == 8
    # Padding robot triangles are flagged invalid.
    assert prep.rob_base[9, :1008].all()
    assert not prep.rob_base[9, 1008:].any()
    # Padding obstacle AABBs are empty (never pass the gate).
    assert np.all(prep.obs_t[1008:, 13:16] == np.inf)
    assert np.all(prep.obs_t[1008:, 16:19] == -np.inf)


@pytest.mark.slow
def test_multiword_gate_masks(rng):
    # >16 obstacle tiles exercises the chunked gate-bitmask encoding
    # (2200 triangles -> 18 tiles -> 2 words per robot tile).
    from robocheck_tpu.models.shapes import triangle_soup
    from robocheck_tpu.oracle import cpu_oracle

    obstacle = triangle_soup(rng, 2200, extent=1.0)
    robot = icosphere(1, radius=0.2)
    mk = MegaKernelChecker(robot, obstacle, interpret=True)
    confs = rng.uniform(-1.5, 1.5, (8, 6)).astype(np.float32)
    valid, *_ = mk.check(confs)
    gt = cpu_oracle.check_configs(robot, obstacle, confs)
    np.testing.assert_array_equal(valid, gt)


class TestCheckValid:
    """The streamed throughput path (`check_valid`) is what bench.py times;
    it must agree with `check` (two-phase) and the f64 oracle — including
    the packed-uint8 decode, chunk padding, and the non-finite recursion."""

    def test_matches_check_and_oracle_mixed(self, sphere_world, sphere_confs):
        robot, obstacle = sphere_world
        mk = MegaKernelChecker(robot, obstacle, interpret=True)
        v_stream, c_stream = mk.check_valid(sphere_confs)
        v_check, c_check, _, _ = mk.check(sphere_confs)
        np.testing.assert_array_equal(v_stream, v_check)
        np.testing.assert_array_equal(c_stream, c_check)
        v_oracle = cpu_oracle.check_configs(robot, obstacle, sphere_confs)
        np.testing.assert_array_equal(v_stream, v_oracle)

    def test_non_divisible_multi_chunk(self, sphere_world):
        # chunk=8 over 19 configs: two full chunks + a padded tail, and the
        # multi-chunk device-side concatenation.
        robot, obstacle = sphere_world
        mk = MegaKernelChecker(robot, obstacle, interpret=True)
        rng = np.random.default_rng(3)
        confs = rng.uniform(-2.0, 2.0, (19, 6)).astype(np.float32)
        v_stream, c_stream = mk.check_valid(confs, chunk=8)
        v_check, c_check, _, _ = mk.check(confs)
        np.testing.assert_array_equal(v_stream, v_check)
        np.testing.assert_array_equal(c_stream, c_check)

    def test_nonfinite_rows(self, sphere_world):
        robot, obstacle = sphere_world
        mk = MegaKernelChecker(robot, obstacle, interpret=True)
        confs = np.zeros((6, 6), np.float32)
        confs[0, 0] = np.nan
        confs[2, 3] = np.inf
        confs[4, 0] = 100.0  # far away -> valid
        v, c = mk.check_valid(confs)
        assert not v[0] and not v[2]  # non-finite poses are never valid
        assert v[4]
        v_check, *_ = mk.check(confs)
        np.testing.assert_array_equal(v, v_check)

    def test_all_miss_and_all_hit_chunks(self, sphere_world):
        robot, obstacle = sphere_world
        mk = MegaKernelChecker(robot, obstacle, interpret=True)
        far = np.zeros((8, 6), np.float32)
        far[:, 0] = 1000.0
        near = np.zeros((8, 6), np.float32)
        near[:, 0] = 1.0  # shells cross at |t| in (0.5, 2.5)
        confs = np.concatenate([far, near])
        v, c = mk.check_valid(confs, chunk=8)  # one all-miss, one all-hit
        assert v[:8].all()
        assert not v[8:].any()

    def test_alpha_golden_slice(self, alpha_meshes, hard10k):
        # Real meshes, tagged goldens (256-conf slice; full files run on TPU
        # via bench.py and in the slow tier).
        robot, obstacle = alpha_meshes
        mk = MegaKernelChecker(robot, obstacle, interpret=True)
        confs = hard10k.confs[:256]
        v, _ = mk.check_valid(confs, chunk=64)
        np.testing.assert_array_equal(v, hard10k.valid[:256])


def test_batch_padding_roundtrip(sphere_world):
    robot, obstacle = sphere_world
    mk = MegaKernelChecker(robot, obstacle, interpret=True)
    confs = np.zeros((CONFS_PER_PROGRAM + 3, 6), np.float32)
    confs[:, 0] = 100.0  # all far away
    valid, *_ = mk.check(confs)
    assert valid.shape == (CONFS_PER_PROGRAM + 3,)
    assert valid.all()


class TestCoplanarResolution:
    """The failure mode the reference printf's on (`narrow-phase.cu:544-545`):
    near-coplanar face-on-face contact. The f32 kernel flags it; the float64
    oracle resolves it; `check_valid_resolved` is the surface consumers
    certify against. Fixture found by search: two triangles lying in one
    tilted plane at ~300-unit coordinates, where f32 rounding makes the
    signed distances straddle the ±TOL band (so the pair is 'live') while
    the plane-coefficient ratios still match (so it is flagged coplanar) —
    and the exact f64 geometry intersects."""

    RT = np.array([[-88.58568, -287.5827, -148.07309],
                   [-105.54053, -122.13013, -65.34459],
                   [9.788717, -353.9158, -98.061005]], dtype=np.float32)
    OT = np.array([[-163.90807, -449.27316, -312.38596],
                   [55.186058, -181.60817, 45.36783],
                   [-9.889383, -480.09338, -190.76962]], dtype=np.float32)

    def _world(self):
        from robocheck_tpu.core.types import Mesh

        tris = np.array([[0, 1, 2]], np.int32)
        return Mesh(self.RT, tris, name="r"), Mesh(self.OT, tris, name="o")

    def test_flagged_then_resolved_colliding(self):
        robot, obstacle = self._world()
        ck = MegaKernelChecker(robot, obstacle, interpret=True)
        confs = np.zeros((1, 6), np.float32)
        valid, cop = ck.check_valid(confs)
        assert valid[0] and cop[0], "fixture must be flagged-but-unresolved"
        resolved = ck.check_valid_resolved(confs)
        assert not resolved[0], "exact geometry collides"
        from robocheck_tpu.oracle import check_configs

        assert not check_configs(robot, obstacle, confs)[0]

    def test_resolution_keeps_clean_verdicts(self):
        # Far-away configs: nothing flagged, resolved == raw (and the helper
        # returns the input array untouched).
        robot, obstacle = self._world()
        ck = MegaKernelChecker(robot, obstacle, interpret=True)
        confs = np.zeros((4, 6), np.float32)
        confs[:, 0] = 1e5
        raw, cop = ck.check_valid(confs)
        assert raw.all() and not cop.any()
        assert ck.check_valid_resolved(confs).all()

    def test_invalid_stays_invalid(self):
        # resolve_coplanar must never overturn a collision verdict.
        from robocheck_tpu.oracle import resolve_coplanar

        robot, obstacle = self._world()
        valid = np.array([False, True])
        cop = np.array([True, False])
        out = resolve_coplanar(robot, obstacle, np.zeros((2, 6), np.float32),
                               valid, cop)
        np.testing.assert_array_equal(out, [False, True])


def test_presort_matches_plain(sphere_world):
    # Broad-phase presort + never-dispatched all-miss tail must be verdict-
    # identical to the plain streamed path, with order restored.
    robot, obstacle = sphere_world
    mk = MegaKernelChecker(robot, obstacle, interpret=True)
    rng = np.random.default_rng(3)
    confs = np.zeros((40, 6), np.float32)
    confs[:, 0] = rng.permutation(
        np.concatenate([rng.uniform(0.0, 2.4, 25),      # hits
                        rng.uniform(50.0, 90.0, 15)])    # misses
    ).astype(np.float32)
    confs[:, 3:6] = rng.uniform(-np.pi, np.pi, (40, 3)).astype(np.float32)
    v0, c0 = mk.check_valid(confs, chunk=8, presort=False)
    v1, c1 = mk.check_valid(confs, chunk=8, presort=True)
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_array_equal(c0, c1)
