"""Benchmark: scan-to-map VFM registrations per second on the available device.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline (BASELINE.json): >= 50 scan-to-map registrations/sec target on v5e-8;
vs_baseline is reported against that north star normalized to one chip
(50/8 = 6.25 reg/s/chip).

Workload: B=8 scan-map pairs per dispatch (map 8192 pts, scan 1024 pts, 384-d
descriptors), full pipeline per pair: device hash-grid build -> cosine 1-NN VFM
correspondences -> VFM-ICP (MAD-filtered GN phase + geometric phase with
candidate-cached 27-voxel NN) — staged as two jits (the monolithic program
stresses the remote-compile path; the split compiles in seconds and costs one
extra ~20ms dispatch per step).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_REG_PER_SEC_PER_CHIP = 50.0 / 8.0


def _enable_compilation_cache():
    """Persistent compile cache: the axon remote-compile path takes minutes for
    the ICP while-loop programs; the cache brings warm runs to sub-second.
    TPU-only — sharing with CPU runs risks machine-feature-mismatched AOT
    reloads (SIGILL warnings)."""
    import jax

    if jax.default_backend() != "tpu":
        return
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main():
    import jax
    import jax.numpy as jnp

    _enable_compilation_cache()

    from __graft_entry__ import _synthetic_batch
    from vfmreg_tpu.ops.hash_grid import build_hash_grid
    from vfmreg_tpu.ops.matching import get_vfm_correspondences
    from vfmreg_tpu.registration.vfm_icp import register_frame_vfm

    batch, n_map, n_scan, d = 8, 8192, 1024, 384
    args = tuple(jnp.asarray(a) for a in _synthetic_batch(batch, n_map, n_scan, d))
    mp, mf, mm, sp, sf, sm = args

    @jax.jit
    def match(mp, mf, mm, sp, sf, sm):
        def one(mp, mf, mm, sp, sf, sm):
            grid = build_hash_grid(mp, 1.0, mask=mm, feats=mf)
            corr = get_vfm_correspondences(grid.points, grid.feats, grid.valid, sp, sf, sm)
            return grid, corr

        return jax.vmap(one)(mp, mf, mm, sp, sf, sm)

    @jax.jit
    def register(grids, sp, sm, corrs):
        def one(grid, s, m, corr):
            pose, _, _, _ = register_frame_vfm(
                grid, s, m, corr, jnp.eye(4, dtype=jnp.float32), 6.0, 0.667,
                max_iterations=100,
            )
            return pose

        return jax.vmap(one)(grids, sp, sm, corrs)

    # Warmup / compile.
    grids, corrs = match(*args)
    poses = register(grids, sp, sm, corrs)
    poses.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        grids, corrs = match(*args)
        poses = register(grids, sp, sm, corrs)
    poses.block_until_ready()
    dt = time.perf_counter() - t0

    reg_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "scan_to_map_registrations_per_sec",
                "value": round(reg_per_sec, 3),
                "unit": "reg/s (1 chip, B=8, map=8192, scan=1024, D=384, full VFM pipeline)",
                "vs_baseline": round(reg_per_sec / BASELINE_REG_PER_SEC_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
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
