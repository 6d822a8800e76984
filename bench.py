"""Benchmark: scan-to-map VFM registrations per second on the available device.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
with the PRIMARY number measured at the reference's production scale
(524k-point map / 16k-point scans / 384-d descriptors,
`registration_node.py:568-578`) under the reference iteration budget
(max_iterations=1000, `Registration.cpp:92`); the legacy small-scale workload
is reported alongside in the `secondary` key.

Baseline (BASELINE.json): >= 50 scan-to-map registrations/sec target on v5e-8;
vs_baseline is reported against that north star normalized to one chip
(50/8 = 6.25 reg/s/chip).

Flow (the paper's headline method, `ransac/vfm` path): the scene map is
indexed into the device hash grid ONCE per scene (the reference's maps are
static per scene; its per-call VoxelHashMap rebuild is pure overhead) and
SCANS_PER_SCENE scans register against it in batches of B; each scan runs
5 m voxel downsample -> cosine 1-NN VFM correspondences vs the full map ->
VFM-ICP (MAD-filtered GN phase + geometric phase on the slab-cached 27-voxel
NN). The timed loop includes the grid build, amortized at its per-scene rate.
Staged as separate jits (build | match | register) — the monolithic program
stresses the remote-compile path; the split compiles in seconds and costs one
extra dispatch per step.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_REG_PER_SEC_PER_CHIP = 50.0 / 8.0


def _enable_compilation_cache():
    """Persistent compile cache, shared with `__graft_entry__` so both entry
    points get the runtime-tag namespacing (a cache dir keyed by jax version +
    libtpu build — an untagged dir can replay a stale AOT executable across a
    rolling libtpu upgrade, the round-1 failure mode)."""
    import __graft_entry__

    __graft_entry__._enable_compilation_cache()


def _shared_map_batch(batch, n_map, n_scan, d, seed=0, offset=True):
    """One world map + `batch` scans sampled from it (scene-registration shape).

    With `offset` (the PRIMARY workload), each scan carries a random rigid
    misalignment — |t| in [0.2, 0.5] m, rotation in [0.5, 2] deg — the scale
    of a RANSAC output / cross-season prior, so the ICP loops run a realistic
    number of GN iterations. Identity-pose scans (offset=False, the
    'converged' secondary) exit at the 1e-4 tolerance after ~1 iteration and
    measure only matching + dispatch.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    mp = np.c_[
        rng.uniform(-100, 100, (n_map, 2)), rng.uniform(0, 8, (n_map, 1))
    ].astype(np.float32)
    W = rng.normal(size=(3, d)).astype(np.float32)
    mf = np.sin(mp @ W * 0.1).astype(np.float32)
    scans, sfeats = [], []
    for _ in range(batch):
        sel = rng.choice(n_map, n_scan, replace=False)
        pts = mp[sel] + rng.normal(0, 0.02, (n_scan, 3)).astype(np.float32)
        if offset:
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            ang = np.deg2rad(rng.uniform(0.5, 2.0))
            K = np.array([[0, -axis[2], axis[1]],
                          [axis[2], 0, -axis[0]],
                          [-axis[1], axis[0], 0]])
            R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
            t_dir = rng.normal(size=3)
            t = t_dir / np.linalg.norm(t_dir) * rng.uniform(0.2, 0.5)
            # scan observed in a frame offset by (R, t): registration must
            # recover the inverse.
            pts = ((pts - t) @ R).astype(np.float32)
        scans.append(pts)
        sfeats.append(mf[sel])
    return mp, mf, np.stack(scans), np.stack(sfeats)


def _run_workload(batch, n_map, n_scan, d, n_vfm, max_iterations, iters,
                  scans_per_scene=32, offset=True):
    import jax
    import jax.numpy as jnp

    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.ops.matching import get_vfm_correspondences_batched
    from vfmreg_tpu.ops.voxel import voxel_down_sample_masked
    from vfmreg_tpu.registration.vfm_icp import register_frame_vfm

    mp, mf, sp, sf = _shared_map_batch(batch, n_map, n_scan, d, offset=offset)
    mp, mf = jnp.asarray(mp), jnp.asarray(mf)
    sp, sf = jnp.asarray(sp), jnp.asarray(sf)
    mm = jnp.ones((n_map,), bool)
    sm = jnp.ones((batch, n_scan), bool)

    build = jax.jit(lambda mp, mf, mm: build_hash_grid(mp, 1.0, mask=mm, feats=mf))

    @jax.jit
    def match(grid, sp, sf, sm):
        def vds(s, f, m):
            # 5 m voxelize the scan -> small query set (`Registration.cpp:217`)
            p5, f5, m5 = voxel_down_sample_masked(s, 5.0, mask=m, feats=f)
            return p5[:n_vfm], f5[:n_vfm], m5[:n_vfm]

        p5, f5, m5 = jax.vmap(vds)(sp, sf, sm)
        # Flattened-batch matching: the map descriptors (805 MB at the primary
        # scale) stream from HBM once for all B scans, not once per lane.
        return get_vfm_correspondences_batched(
            grid.points, grid.feats, grid.valid, p5, f5, m5
        )

    @jax.jit
    def register(grid, sp, sm, corrs):
        def one(s, m, corr):
            pose, _, _, _ = register_frame_vfm(
                grid, s, m, corr, jnp.eye(4, dtype=jnp.float32), 6.0, 0.667,
                max_iterations=max_iterations,
            )
            return pose

        return jax.vmap(one)(sp, sm, corrs)

    # Warmup / compile. The trailing host fetch is load-bearing for honest
    # timing: before the process's first device-to-host transfer, this
    # platform's block_until_ready does NOT actually block (measured: 20
    # enqueued 5.5-TFLOP programs "complete" in 0.2 ms pre-transfer, honestly
    # post-transfer) — so the transfer flips the runtime into accounted mode
    # before the clock starts.
    import numpy as np

    grid = build(mp, mf, mm)
    corrs = match(grid, sp, sf, sm)
    poses = register(grid, sp, sm, corrs)
    _ = np.asarray(poses)

    batches_per_scene = max(scans_per_scene // batch, 1)
    t0 = time.perf_counter()
    done = 0
    while done < iters:
        grid = build(mp, mf, mm)  # once per scene
        for _ in range(min(batches_per_scene, iters - done)):
            corrs = match(grid, sp, sf, sm)
            poses = register(grid, sp, sm, corrs)
            done += 1
    _ = np.asarray(poses)  # result fetch inside the timed region
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _make_synthetic_scene(batch, n_map, n_scan, d, seed=0, extent=100.0):
    """A reference-layout scene for the DRIVER benchmark: one world map with
    descriptors + `batch` local-frame query scans, each sampling a 30 m-radius
    region, GT poses stored with the 0.2-0.5 m / 0.5-2 deg noise of a release
    GT (so the GT-ICP stage runs representative iteration counts)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    # Ground-dominated world (70% ground returns, 30% structure) — the height
    # distribution of real LiDAR maps, and what determines how far the 1 m
    # voxel downsample collapses a scan (real 16k scans run ~4-8k survivors).
    n_ground = int(n_map * 0.7)
    xy = rng.uniform(-extent, extent, (n_map, 2))
    z = np.concatenate(
        [rng.uniform(0, 0.3, n_ground), rng.uniform(0, 8, n_map - n_ground)]
    )
    mp = np.c_[xy, z[rng.permutation(n_map)]].astype(np.float32)
    W = rng.normal(size=(3, d)).astype(np.float32)
    mf = np.sin(mp @ W * 0.1).astype(np.float32)
    local_map = np.c_[mp, mf]

    scene_poses, scene_clouds = [], []
    for _ in range(batch):
        center = rng.uniform(-extent * 0.4, extent * 0.4, 2)
        near = np.flatnonzero(np.linalg.norm(mp[:, :2] - center, axis=1) < 30.0)
        sel = rng.choice(near, min(n_scan, near.size), replace=False)
        pts = mp[sel] + rng.normal(0, 0.02, (sel.size, 3)).astype(np.float32)

        # True pose: translation to the region center. Stored (noisy) GT.
        T = np.eye(4)
        T[:2, 3] = center
        local = (pts - T[:3, 3]).astype(np.float32)

        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = np.deg2rad(rng.uniform(0.5, 2.0))
        K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
        Rn = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
        noisy = T.copy()
        noisy[:3, :3] = Rn @ T[:3, :3]
        t_dir = rng.normal(size=3)
        noisy[:3, 3] += t_dir / np.linalg.norm(t_dir) * rng.uniform(0.2, 0.5)

        scene_poses.append(noisy)
        scene_clouds.append(np.c_[local, mf[sel]])
    return {"scene_poses": scene_poses, "scene_point_clouds": scene_clouds}, local_map


def _run_harness_workload(batch, n_map, n_scan, d, iters):
    """Driver-level throughput: `RegistrationNode._precompute_scene_batched`
    on a synthetic scene — the COMPLETE per-scan method row of the flagship
    benchmark (GT ICP + 5 m vfm correspondences (+1 m retry) + snap filter +
    50k-hypothesis RANSAC + ICP refine + vanilla ICP), host syncs included,
    with the device scan-preprocessing path (0.1 m voxelize + double
    downsample + 5 m query voxelize on device).

    Device-resident convention (same as the primary workload): the scene's
    tensors live on device; each lap re-runs the full per-scene COMPUTE —
    grid build from the map arrays, preprocessing, matching, snap, RANSAC,
    three ICP rows, and the driver's host syncs. The per-scene host->device
    copies are excluded: on production PCIe they cost ~60 ms at this scale,
    but on this tunneled dev chip the link moves ~12 MB/s, so including them
    would measure the tunnel (69 s for the 805 MB map), not the driver."""
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.ops.voxel import bucket_size
    from vfmreg_tpu.pipeline.registration_node import RegistrationNode

    scene, local_map = _make_synthetic_scene(batch, n_map, n_scan, d)
    tmp = tempfile.mkdtemp()
    node = RegistrationNode(
        Path(tmp),
        methods_ransac=[("vfm", True)],
        methods_teaser=[],
        methods_pointdsc=[],
        batch_scans=True,
        device_preprocess=True,
    )
    node.filenames = [Path(tmp) / "scene_bench.h5"]  # _gt_fixed_pose path check

    # Scans resident on device, stacked to the driver's padded layout.
    n_pad = max(bucket_size(max(c.shape[0], 1)) for c in scene["scene_point_clouds"])
    raw = np.zeros((batch, n_pad, 3 + d), np.float32)
    msk = np.zeros((batch, n_pad), bool)
    for j, c in enumerate(scene["scene_point_clouds"]):
        raw[j, : c.shape[0]] = c
        msk[j, : c.shape[0]] = True
    scene["scene_point_clouds_device"] = (jnp.asarray(raw), jnp.asarray(msk))

    # Map resident once; each scene re-runs the full grid BUILD from the
    # device arrays (sort + slabs + probe table — the real per-scene work).
    g0 = node._map_hash(local_map, with_descriptors=True).device_grid()
    vs = float(node.config.mapping.voxel_size)
    rebuild = jax.jit(lambda p, v, f: build_hash_grid(p, vs, mask=v, feats=f))

    class _ResidentMap:
        def device_grid(self):
            return rebuild(g0.points, g0.valid, g0.feats)

    node._map_hash = lambda lm, with_descriptors: _ResidentMap()

    node._precompute_scene_batched(scene, local_map)  # warm / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        node._precompute_scene_batched(scene, local_map)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _cpu_mesh_scaling_child(n_devices: int) -> None:
    """Child process: the harness workload on a virtual n-device CPU mesh.
    Prints one JSON line {"n": n, "scans_per_sec": x}."""
    import re

    kept = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        os.environ.get("XLA_FLAGS", ""),
    ).strip()
    os.environ["XLA_FLAGS"] = (
        kept + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # CPU-feasible scale: the curve's SHAPE is the signal (hidden host
    # serialization flattens it), not the absolute numbers.
    rate = _run_harness_workload(batch=8, n_map=32768, n_scan=2048, d=32, iters=2)
    print(json.dumps({"n": n_devices, "scans_per_sec": round(rate, 3)}))


def _run_cpu_mesh_scaling(counts=(1, 2, 4, 8)) -> dict:
    """Measured (not extrapolated) multi-device driver scaling on the virtual
    CPU mesh (VERDICT r4 item 3): the batched driver's scan-sharded stages at
    1 -> 2 -> 4 -> 8 devices. Not perf-representative of TPU ICI — the check
    is that the curve has no hidden host serialization (e.g. a per-scan
    dispatch loop would flatten it)."""
    import subprocess

    out = {}
    for n in counts:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cpu-scaling-child", str(n)],
                capture_output=True, text=True, timeout=1800,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
            out[str(n)] = json.loads(line)["scans_per_sec"]
        except Exception as e:  # record the failure rather than kill the bench
            out[str(n)] = f"failed: {type(e).__name__}"
    return out


def main():
    _enable_compilation_cache()
    import jax

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # PRIMARY: reference production scale, reference iteration cap, and
        # REALISTIC per-scan misalignment (0.2-0.5 m / 0.5-2 deg — the scale
        # of a RANSAC output or cross-season prior) so the GN loops run a
        # representative iteration count instead of exiting at tolerance
        # after ~1 step.
        real = _run_workload(
            batch=8, n_map=524288, n_scan=16384, d=384, n_vfm=512,
            max_iterations=1000, iters=8, offset=True,
        )
        unit = (
            "reg/s (1 chip, map=524288, scan=16384, D=384, B=8, "
            "0.2-0.5 m / 0.5-2 deg initial offsets, 1000-iter cap, "
            "full VFM pipeline incl. grid build)"
        )
        # SECONDARY: converged regime (identity-pose scans; ICP exits at its
        # 1e-4 tolerance — measures matching + dispatch) and the legacy
        # small-scale workload.
        converged = _run_workload(
            batch=8, n_map=524288, n_scan=16384, d=384, n_vfm=512,
            max_iterations=1000, iters=8, offset=False,
        )
        small = _run_workload(
            batch=8, n_map=8192, n_scan=1024, d=384, n_vfm=1024,
            max_iterations=1000, iters=10,
        )
        # DRIVER-LEVEL: the complete evaluation-harness method row per scan
        # (GT ICP + vfm correspondences + snap + 50k-hypothesis RANSAC + ICP
        # refine + vanilla ICP), through RegistrationNode._precompute_scene_batched
        # with a fresh map grid per scene — the number comparable to running
        # the reference's registration_node.py end to end.
        harness = _run_harness_workload(
            batch=8, n_map=524288, n_scan=16384, d=384, iters=4
        )
        harness_b16 = _run_harness_workload(
            batch=16, n_map=524288, n_scan=16384, d=384, iters=3
        )
        # MEASURED multi-device driver scaling on the virtual CPU mesh
        # (1 -> 2 -> 4 -> 8 devices; shape-only signal, not TPU-representative).
        scaling = _run_cpu_mesh_scaling()
    else:
        # No TPU reachable (the tunnel drops sometimes): record an honestly
        # labeled scaled-down CPU run rather than grinding the production
        # workload for hours on a host core or hanging the driver.
        real = _run_workload(
            batch=4, n_map=32768, n_scan=2048, d=384, n_vfm=256,
            max_iterations=100, iters=2, scans_per_scene=8,
        )
        unit = (
            "reg/s (CPU FALLBACK - TPU unavailable; reduced workload "
            "map=32768, scan=2048, D=384, B=4, 100-iter budget; "
            "NOT comparable to the TPU baseline)"
        )
        small = converged = harness = harness_b16 = scaling = None

    out = {
        "metric": "scan_to_map_registrations_per_sec",
        "value": round(real, 3),
        "unit": unit,
        # CPU-fallback throughput vs the TPU per-chip target would be a
        # meaningless ratio — null it rather than record a bogus regression.
        "vs_baseline": (
            round(real / BASELINE_REG_PER_SEC_PER_CHIP, 3) if on_tpu else None
        ),
    }
    if small is not None:
        out["secondary"] = {
            "converged_regime_reg_per_sec": round(converged, 3),
            "metric": "small_scale_registrations_per_sec",
            "value": round(small, 3),
            "unit": "reg/s (1 chip, map=8192, scan=1024, D=384, B=8)",
            "harness_reg_per_sec": round(harness, 3),
            "harness_unit": (
                "reg/s (1 chip, COMPLETE evaluation-driver method row per scan: "
                "GT ICP + vfm corr + snap + 50k-hyp RANSAC + ICP refine + "
                "vanilla ICP; map=524288, scan=16384, D=384, B=8, "
                "device-resident tensors, fresh grid build per scene)"
            ),
            "harness_vs_target": round(harness / BASELINE_REG_PER_SEC_PER_CHIP, 3),
            "harness_b16_reg_per_sec": round(harness_b16, 3),
            "cpu_mesh_scaling_scans_per_sec": scaling,
        }
    print(json.dumps(out))


def _probe_tpu_reachable(timeout_s: float = 240.0) -> bool:
    """Initialize the TPU backend in a CHILD process under a timeout.

    When the tunnel is down, `import jax; jax.devices()` hangs indefinitely in
    whatever process first touches the backend — probing in a child keeps this
    process clean so it can fall back to JAX_PLATFORMS=cpu.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.default_backend() == 'tpu'"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--cpu-scaling-child":
        _cpu_mesh_scaling_child(int(sys.argv[2]))
        sys.exit(0)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu" or not _probe_tpu_reachable():
        if os.environ.get("JAX_PLATFORMS", "") != "cpu":
            print("TPU backend unreachable; falling back to CPU", file=sys.stderr)
            os.environ["JAX_PLATFORMS"] = "cpu"  # for child processes
        # Load-bearing EITHER way (probe failure or env-requested cpu): with
        # the axon plugin registered via sitecustomize, this jax build honors
        # only the CONFIG override — env-only JAX_PLATFORMS=cpu still hangs
        # jax.default_backend() when the tunnel is down (measured).
        import jax

        jax.config.update("jax_platforms", "cpu")
    # The shared remote chip's free HBM fluctuates; a transient
    # RESOURCE_EXHAUSTED at a workload that normally fits deserves a retry
    # before failing the recorded benchmark.
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # jax.errors.JaxRuntimeError lacks a stable import path
            if "RESOURCE_EXHAUSTED" in str(e) and attempt < 2:
                print(f"transient RESOURCE_EXHAUSTED, retrying ({attempt + 1}/2)", file=sys.stderr)
                time.sleep(20)
                continue
            raise
