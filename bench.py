#!/usr/bin/env python3
"""Headline benchmark: collision checks/second through the fused Pallas
mega-kernel on the reference's hard dataset, with verdict correctness gated
against the FCL-tagged goldens.

Protocol mirrors the reference report (§4.2): minimum over 5 timed runs,
device transfers included, file reads excluded. Baseline = the optimized CPU
oracle (the reference's conclusion was that its GPU never beat the CPU FCL
baseline; beating the CPU here is the bar that matters), measured on this
machine and extrapolated from a subsample.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


# Stated real-time budget for one planner-step-shaped batch (2048 configs
# through check_valid_resolved, host numpy in -> verdicts out). 50 ms = a
# 20 Hz replanning loop, the usual bar for online manipulator planning;
# BASELINE.json's metric is "p50 batch latency vs real-time budget" and
# round 4 measured p50 42.8 ms, so this is a budget we meet, not a wish.
LATENCY_BUDGET_MS = 50.0


def easy_leg():
    """Fresh-process easy100k measurement (spawned by main): warm-up plus
    min-of-5, the SAME protocol as the hard leg, in a process unpolluted
    by prior dataset runs (within-session warming skewed the round-4
    number by up to ~50% — DESIGN.md round-4 notes)."""
    import time as _t

    import jax

    from robocheck_tpu.io import assets
    from robocheck_tpu.io.conf import read_conf_file
    from robocheck_tpu.io.obj import load_obj
    from robocheck_tpu.kernels.megakernel import MegaKernelChecker
    from robocheck_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    robot = load_obj(assets.alpha_robot_path())
    obstacle = load_obj(assets.alpha_obstacle_path())
    eds = read_conf_file(assets.dataset_path("easy100k"))
    checker = MegaKernelChecker(
        robot, obstacle, interpret=jax.default_backend() != "tpu")
    ev = checker.check_valid_resolved(eds.confs)  # warm-up / compile
    mism = (int((ev != eds.valid).sum()) if eds.valid is not None
            and eds.tags_match_header is not False else -1)
    times = []
    for _ in range(5):
        t0 = _t.perf_counter()
        checker.check_valid_resolved(eds.confs)
        times.append(round(_t.perf_counter() - t0, 4))
    print(json.dumps({"n": len(eds.confs), "times_s": times,
                      "mismatches": mism}))


def main():
    import jax

    from robocheck_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()

    from robocheck_tpu.io import assets
    from robocheck_tpu.io.conf import read_conf_file
    from robocheck_tpu.io.obj import load_obj
    from robocheck_tpu.kernels.megakernel import MegaKernelChecker
    from robocheck_tpu.oracle import check_configs

    robot = load_obj(assets.alpha_robot_path())
    obstacle = load_obj(assets.alpha_obstacle_path())

    # Prefer the 100k dataset when it has been generated; fall back to 10k.
    try:
        ds = read_conf_file(assets.dataset_path("hard100k"))
        ds_name = "hard100k"
    except FileNotFoundError:
        ds = read_conf_file(assets.dataset_path("hard10k"))
        ds_name = "hard10k"
    confs = ds.confs
    n = confs.shape[0]

    interpret = jax.default_backend() != "tpu"
    checker = MegaKernelChecker(robot, obstacle, interpret=interpret)

    # Warm-up / compile (the throughput path: streamed single-phase
    # dispatch, packed 1-byte/config verdicts over the link; coplanar flags
    # resolved exactly in float64 — free when nothing is flagged).
    valid = checker.check_valid_resolved(confs)

    # Correctness gate (the reference's KERNEL BROKEN check,
    # full-integration-test.cu:695-724). Files whose row tags disagree with
    # their own header (e.g. the reference's 10,000samples.conf: header says
    # 7296/2704 but every row tag is 0) are treated as untagged — diffing
    # against stale tags would report thousands of spurious mismatches.
    mismatches = -1
    if ds.valid is not None and ds.tags_match_header is not False:
        mismatches = int((valid != ds.valid).sum())
    elif ds.tags_match_header is False:
        print(
            f"warning: {ds_name} row tags disagree with its header "
            f"({ds.num_valid} tagged valid vs header {ds.header_valid}); "
            "skipping the golden mismatch gate",
            file=sys.stderr,
        )

    # Timed runs: min of 5, includes H2D/D2H.
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        checker.check_valid_resolved(confs)
        times.append(time.perf_counter() - t0)
    best = min(times)
    checks_per_s = n / best

    # CPU-oracle baseline on a subsample (scaled), cached across runs. The
    # native C++ oracle (built on demand) is the honest baseline; the NumPy
    # fallback is only used if the toolchain is unavailable.
    from robocheck_tpu.runtime import native as native_mod

    if not native_mod.available():
        import subprocess

        subprocess.run(
            ["make", "-C",
             os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")],
            check=False, capture_output=True,
        )
        native_mod._tried = False  # re-probe after build
    oracle_kind = "native" if native_mod.available() else "numpy"

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".bench_baseline_{ds_name}_{oracle_kind}.json")
    if os.path.exists(cache):
        with open(cache) as f:
            baseline_cps = json.load(f)["cpu_oracle_checks_per_s"]
    else:
        sub = min(1024 if oracle_kind == "native" else 200, n)
        t0 = time.perf_counter()
        check_configs(robot, obstacle, confs[:sub])
        dt = time.perf_counter() - t0
        baseline_cps = sub / dt
        with open(cache, "w") as f:
            json.dump({"cpu_oracle_checks_per_s": baseline_cps}, f)

    # Latency leg (BASELINE.json's metric names p50 batch latency alongside
    # throughput): round-trip wall time of ONE planner-step-shaped batch
    # (2048 configs, host numpy in -> verdicts out, including H2D/D2H and
    # any coplanar resolution). This is what an SQP/RRT iteration actually
    # waits on; on a tethered deployment it is dominated by the link round
    # trip, which amortized streaming throughput hides.
    lat_n = 2048
    lat_confs = confs[:lat_n]
    checker.check_valid_resolved(lat_confs)  # warm the shape
    lats = []
    for _ in range(101):
        t0 = time.perf_counter()
        checker.check_valid_resolved(lat_confs)
        lats.append(time.perf_counter() - t0)
    lats.sort()
    p50_ms = lats[len(lats) // 2] * 1e3
    # Nearest-rank p99 over 101 sorted samples is index 99 (index 98 is
    # ~p97-98).
    p99_ms = lats[int(round(0.99 * (len(lats) - 1)))] * 1e3

    # Clearance-query leg: the TPU clearance engine (`planner/clearance.py`)
    # that powers the continuous certifier — exact min posed-vertex to
    # obstacle-surface distances, refine-4 alpha robot (133,902 vertices,
    # 131 blocks) vs the 1008-triangle obstacle, near-contact poses.
    clear_cps = None
    clear_pairs = None
    try:
        from robocheck_tpu.planner.ccd import subdivide_mesh
        from robocheck_tpu.planner.clearance import TpuClearanceEngine

        rob4 = subdivide_mesh(robot, 4)
        eng = TpuClearanceEngine(rob4.vertices, obstacle)
        rng = np.random.default_rng(5)
        cl_confs = rng.uniform(-np.pi, np.pi, (256, 6)).astype(np.float32)
        center = 0.5 * (obstacle.aabb[:3] + obstacle.aabb[3:])
        ext = obstacle.aabb[3:] - obstacle.aabb[:3]
        cl_confs[:, 0:3] = center + rng.uniform(-0.6, 0.6, (256, 3)) * ext
        eng.min_distances(cl_confs)  # warm / compile
        for k in eng.stats:
            eng.stats[k] = 0 if isinstance(eng.stats[k], int) else 0.0
        t0 = time.perf_counter()
        eng.min_distances(cl_confs)
        dt = time.perf_counter() - t0
        clear_cps = round(len(cl_confs) / dt, 1)
        clear_pairs = int(eng.stats["pairs"])
    except Exception as e:  # noqa: BLE001 — secondary leg must not kill
        print(f"warning: clearance leg failed: {e}", file=sys.stderr)

    # Secondary metric: the sparse dataset, measured in a FRESH subprocess
    # with the same warm-up + min-of-5 protocol as the hard leg. Running it
    # warm at the tail of this process inflated round-3's number ~3.5x over
    # round-4's judging-day record; the per-run spread is now part of the
    # artifact (recorded on stderr so the headline stays one line).
    easy_cps = None
    easy_mismatches = None
    easy_times = None
    try:
        read_conf_file(assets.dataset_path("easy100k"))  # existence check
        import subprocess

        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", "easy"],
            capture_output=True, text=True, timeout=1200,
        )
        if proc.returncode != 0 or not proc.stdout.strip():
            # Surface the child's actual failure (e.g. exclusive-attach
            # deployments where a second process cannot acquire the TPU)
            # instead of a bare parse error.
            tail = (proc.stderr.strip().splitlines()[-1][-300:]
                    if proc.stderr.strip() else "no output")
            raise RuntimeError(
                f"easy-leg subprocess rc={proc.returncode}: {tail}")
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        easy_times = rec["times_s"]
        easy_cps = round(rec["n"] / min(easy_times), 1)
        easy_mismatches = rec["mismatches"]
    except FileNotFoundError:
        pass
    except Exception as e:  # noqa: BLE001 — secondary leg must not kill
        print(f"warning: easy leg failed: {e}", file=sys.stderr)

    result = {
        "metric": f"collision_checks_per_s_{ds_name}",
        "value": round(checks_per_s, 1),
        "unit": "checks/s/chip",
        "vs_baseline": round(checks_per_s / baseline_cps, 2),
        "p50_batch_latency_ms": round(p50_ms, 2),
        "latency_budget_ms": LATENCY_BUDGET_MS,
        "latency_margin_ms": round(LATENCY_BUDGET_MS - p50_ms, 2),
    }
    extra = {
        "dataset": ds_name,
        "n_confs": n,
        "best_time_s": round(best, 4),
        "golden_mismatches": mismatches,
        "latency_batch": lat_n,
        "p99_batch_latency_ms": round(p99_ms, 2),
        "easy100k_checks_per_s": easy_cps,
        "easy100k_times_s": easy_times,
        "easy100k_mismatches": easy_mismatches,
        "clearance_configs_per_s": clear_cps,
        "clearance_pairs_run": clear_pairs,
        "cpu_oracle_baseline_checks_per_s": round(baseline_cps, 1),
        "cpu_oracle_kind": oracle_kind,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    print(json.dumps(extra), file=sys.stderr)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--leg" and sys.argv[2] == "easy":
        easy_leg()
    else:
        main()
