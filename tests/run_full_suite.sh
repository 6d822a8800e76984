#!/usr/bin/env bash
# Full test suite as a sequence of SHORT-LIVED pytest processes.
#
# Why not one `pytest tests/ -m ''`: XLA:CPU's in-process compiler has been
# observed to segfault nondeterministically after many dozens of compilations
# in a single long-lived process (Fatal Python error inside
# jax/_src/compiler.py backend_compile_and_load, ~test 49 of 56; every
# affected test passes when run solo). Chunking the run bounds the number of
# compilations per process and has been reliable.
#
# Usage: bash tests/run_full_suite.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."

fail=0
run() {
  echo "=== pytest $* ==="
  python -m pytest "$@" -q -p no:cacheprovider || fail=1
}

# Fast profile (everything not marked slow) in one process.
run tests/

# Slow tests, chunked: the recall-parity matrix is the heaviest compiler load
# and runs per-row; the rest grouped by file.
run tests/test_recall_parity.py::test_recall_parity_vfm_row \
    tests/test_recall_parity.py::test_recall_parity_sparse_retry -m ''
run tests/test_recall_parity.py::test_recall_parity_teaser_row -m ''
run tests/test_recall_parity.py::test_recall_parity_pointdsc_row -m ''
run tests/test_recall_parity.py::test_recall_parity_fpfh_row -m ''
run tests/test_data.py tests/test_dataloaders.py tests/test_fpfh.py \
    tests/test_harness.py tests/test_hash_grid.py tests/test_icp.py -m 'slow'
run tests/test_kdtree.py tests/test_kiss.py tests/test_learned_descriptors.py \
    tests/test_matching.py tests/test_misc.py tests/test_parallel.py -m 'slow'
run tests/test_pointdsc.py tests/test_pose_graph.py tests/test_sparse_conv.py \
    tests/test_trainer.py tests/test_vfm_icp.py tests/test_vit.py -m 'slow'

if [ "$fail" -ne 0 ]; then
  echo "FULL SUITE: failures above" >&2
  exit 1
fi
echo "FULL SUITE: all chunks passed"
