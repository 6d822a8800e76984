"""Benchmark: scan-to-map VFM registrations per second on the available device.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline (BASELINE.json): >= 50 scan-to-map registrations/sec target on v5e-8;
vs_baseline is reported against a 50 reg/s north star normalized to one chip
(50/8 = 6.25 reg/s/chip).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_REG_PER_SEC_PER_CHIP = 50.0 / 8.0


def _enable_compilation_cache():
    """Persistent compile cache: the axon remote-compile path takes minutes for
    the ICP while-loop programs; the cache brings warm runs to sub-second."""
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main():
    import jax
    import jax.numpy as jnp

    _enable_compilation_cache()

    from __graft_entry__ import _synthetic_batch
    from vfmreg_tpu.parallel.mesh import batched_registration_step

    batch = 8
    n_map, n_scan, d = 8192, 1024, 384
    args = tuple(jnp.asarray(a) for a in _synthetic_batch(batch, n_map, n_scan, d))

    step = jax.jit(batched_registration_step)
    # Warmup/compile
    poses, counts = step(*args)
    poses.block_until_ready()

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        poses, counts = step(*args)
    poses.block_until_ready()
    dt = time.perf_counter() - t0

    reg_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "scan_to_map_registrations_per_sec",
                "value": round(reg_per_sec, 3),
                "unit": "reg/s (1 chip, B=8, map=8192, scan=1024, D=384)",
                "vs_baseline": round(reg_per_sec / BASELINE_REG_PER_SEC_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
