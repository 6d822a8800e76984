"""Device-resident voxel hash grid — the TPU analogue of the reference VoxelHashMap.

The reference keeps a `tsl::robin_map<Voxel, VoxelBlock>` on the host and scans the
27-voxel neighborhood per query with TBB (`core/VoxelHashMap.cpp:76-168`). Here the
map lives on device as sorted, padded arrays:

* points are stable-sorted by 32-bit voxel hash → same-voxel points are contiguous
  ("buckets"), in insertion order (so the first-`max_points_per_voxel` cap keeps the
  same points as the reference's `VoxelBlock::AddPoint`, `VoxelHashMap.hpp:47-54`);
* lookup = a packed open-addressing table ([H/2, 24] rows covering a whole
  7-probe window of (hash, bucket, count) triples) — ONE wide gather per
  lookup, no pointer-chasing, no host round-trips;
* every bucket's points additionally live in ONE bucket-aligned 128-lane
  SLAB row ([x0..x31 | y0..y31 | z0..z31 | rowid0..31], sentinel-padded), so
  the 27-neighborhood NN query is exactly 27 single-row gathers per query —
  no window math, no mask arrays — into a materialized candidate set that the
  ICP loops CACHE across GN iterations.

Everything is fixed-shape; invalid rows carry +inf distances.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfmreg_tpu.ops.voxel import INVALID_HASH, voxel_coords, voxel_hash


# Open-addressing probe budget: table capacity is 4x the bucket budget (load
# <= 0.25), where 7 linear probes virtually never miss; buckets that lose all
# insert rounds are unreachable (points drop out of NN candidates — negligible
# probability at this load). 7 (not 8) because lookups read ONE packed
# stride-2 row of 8 slots, which covers only 7 probe positions when the base
# slot is odd.
_PROBES = 7

# Every bucket owns ONE aligned slab row of exactly 128 lanes
# ([x0..x31 | y0..y31 | z0..z31 | rowid0..31]): the candidate gather is a
# single row per (query, neighbor-voxel) on the row-rate-bound gather unit,
# dead lanes carry the INVALID_COORD sentinel (d2 overflows to +inf, so no
# mask arrays are streamed), and the original point row rides in the spare
# lanes as exact-in-f32 integers. Requires max_points_per_voxel <= 32 (the
# reference uses 20, `config/config.py`).
_SLAB = 32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "table",
        "points",
        "bucket_slab",
        "feats",
        "valid",
        "voxel_size",
    ],
    meta_fields=["max_points_per_voxel"],
)
@dataclasses.dataclass(frozen=True)
class HashGrid:
    """Sorted-bucket voxel grid. All arrays are padded to static capacities.

    Lookups go through a linear-probing open-addressing table (`table`,
    capacity 4x the point budget, packed (hash, start, count) rows) — ONE
    wide gather covers the whole probe window; the sorted arrays remain the
    bucket-grouping backbone and exact export order.
    """

    table: jnp.ndarray  # [H/2, 24] int32: packed (hash, start, count) x 8 slots
    points: jnp.ndarray  # [M, 3] f32, sorted by voxel hash
    bucket_slab: jnp.ndarray  # [M*S+2, 128] f32 aligned slab rows (S=ceil(cap/32))
    feats: Optional[jnp.ndarray]  # [M, D] f32 or None
    valid: jnp.ndarray  # [M] bool (sorted alongside points)
    voxel_size: jnp.ndarray  # f32 scalar
    max_points_per_voxel: int  # static

    @property
    def num_points(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


def build_hash_grid(
    points: jnp.ndarray,
    voxel_size,
    mask: Optional[jnp.ndarray] = None,
    feats: Optional[jnp.ndarray] = None,
    max_points_per_voxel: int = 20,
    evict_origin: Optional[jnp.ndarray] = None,
    max_distance=None,
) -> HashGrid:
    """Construct the grid from a padded point cloud.

    Semantics mirror `VoxelHashMap::AddPoints` (`VoxelHashMap.cpp:733-770`): voxel =
    trunc(p / voxel_size), at most `max_points_per_voxel` points kept per voxel in
    insertion order. When `evict_origin`/`max_distance` are given, whole voxels
    whose FIRST stored point lies farther than `max_distance` from the origin
    are dropped (`RemovePointsFarFromLocation`, `VoxelHashMap.cpp:772-796`) —
    their bucket count is zeroed so they never appear as NN candidates, and
    their rows are marked invalid for exports/compaction.
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)

    h = voxel_hash(voxel_coords(points, voxel_size))
    h = jnp.where(mask, h, INVALID_HASH)

    order = jnp.argsort(h, stable=True)
    h_s = h[order]
    pts_s = points[order]
    mask_s = mask[order]
    feats_s = feats[order] if feats is not None else None

    is_start = jnp.concatenate([jnp.ones((1,), dtype=bool), h_s[1:] != h_s[:-1]]) & mask_s

    # Scatter-free CSR: the construction is all sorts and associative scans —
    # TPU scatters serialize at ~20 ms per 524k-update op, while a 524k sort is
    # ~16 ms and a scan is sub-ms, so the scan form is ~10x faster end to end.
    row = jnp.arange(n, dtype=jnp.int32)
    # Per-point bucket start: carry the last run-start row forward.
    start_pp = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, row, -1))
    # Per-point bucket end (exclusive): the next run start strictly after me.
    nxt = jax.lax.associative_scan(
        jnp.minimum, jnp.where(is_start, row, n), reverse=True
    )
    end_pp = jnp.concatenate([nxt[1:], jnp.full((1,), n, dtype=jnp.int32)])
    count_pp = jnp.minimum(end_pp - start_pp, max_points_per_voxel)

    evict_pt = jnp.zeros((n,), dtype=bool)
    if evict_origin is not None:
        # First stored point of each bucket (one n-row gather; evict-only cost).
        first_pt = pts_s[jnp.clip(start_pp, 0, n - 1)]
        d2 = jnp.sum(
            (first_pt - jnp.asarray(evict_origin, dtype=pts_s.dtype)) ** 2, axis=-1
        )
        evict_pt = (d2 > jnp.square(jnp.asarray(max_distance, pts_s.dtype))) & mask_s
        count_pp = jnp.where(evict_pt, 0, count_pp)

    # Mark rows beyond the per-voxel cap (and evicted voxels) invalid so
    # exports and compaction skip them.
    rank = row - start_pp
    valid = mask_s & (rank < max_points_per_voxel) & ~evict_pt

    # ----- bucket-aligned slab store ---------------------------------------
    # S = ceil(cap/32) 128-lane rows per bucket: coords + original (sorted)
    # row id, dead lanes = sentinel. Two extra all-sentinel rows at the end:
    # n*S is the "empty slab" absent-voxel lookups redirect to; the final row
    # absorbs dropped writes. S=1 for the registration grids (cap 20); FPFH's
    # denser neighborhoods (cap <= 48) get S=2.
    from vfmreg_tpu.ops.nn_kernel import INVALID_COORD

    S = -(-max_points_per_voxel // _SLAB)
    bucket_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    n_rows = n * S + 2
    slab_ok = valid & (bucket_id >= 0)
    flat0 = jnp.where(
        slab_ok,
        (bucket_id * S + rank // _SLAB) * 128 + rank % _SLAB,
        (n_rows - 1) * 128,
    )
    bucket_slab = jnp.full((n_rows * 128,), jnp.float32(INVALID_COORD))
    bucket_slab = bucket_slab.at[flat0].set(pts_s[:, 0], mode="drop")
    bucket_slab = bucket_slab.at[flat0 + 32].set(pts_s[:, 1], mode="drop")
    bucket_slab = bucket_slab.at[flat0 + 64].set(pts_s[:, 2], mode="drop")
    bucket_slab = bucket_slab.at[flat0 + 96].set(row.astype(jnp.float32), mode="drop")
    bucket_slab = bucket_slab.reshape(n_rows, 128)

    # ----- open-addressing table over the bucket set ------------------------
    # Linear-probing placement WITHOUT per-round scatter competition: sort the
    # buckets by base slot, then the classic parking-function identity gives
    # every displacement in one scan — placed_k = k + cummax_k(base_k - k) for
    # base-sorted buckets. Buckets displaced past the probe window or past the
    # table end (no wraparound) are dropped, i.e. unreachable as NN candidates
    # — same failure class as the old bounded-round insert, negligible at
    # load <= 0.25.
    H = 1
    while H < 4 * n:
        H *= 2
    base = (h_s & jnp.uint32(H - 1)).astype(jnp.int32)
    key2 = jnp.where(is_start, base, H)  # non-starts sort last
    # ONE multi-operand sort carries the table values alongside the key —
    # argsort + three [order2] gathers fused ~2x slower than the sort itself.
    bs, hs2, bid2, cnt2 = jax.lax.sort(
        (key2, h_s.astype(jnp.int32), bucket_id, count_pp), num_keys=1, is_stable=True
    )
    placed = row + jax.lax.associative_scan(jnp.maximum, bs - row)
    ok = (bs < H) & (placed - bs < _PROBES) & (placed < H)
    slot = jnp.where(ok, placed, H)  # H = write-off row, never read back

    # Table rows carry (hash, bucket index, count).
    vals = jnp.stack([hs2, bid2, cnt2], axis=1)
    init = jnp.concatenate(
        [
            jnp.full((H + 1, 1), -1, dtype=jnp.int32),  # int32 view of INVALID_HASH
            jnp.zeros((H + 1, 2), dtype=jnp.int32),
        ],
        axis=1,
    )
    table3 = init.at[slot].set(vals)  # the ONE scatter of the build

    # Pack the WHOLE probe window into one row: row r of the [H/2, 24] table
    # holds the (hash, start, count) triples of slots 2r .. 2r+7. A lookup then
    # needs a single wide gather — row (base >> 1) covers >= 7 probe positions
    # from any base slot — instead of one gather per probe round (the gather
    # unit is row-rate-bound, so the 4x fewer rows is a direct 4x on the
    # table-lookup phase of a candidate refresh). Built from contiguous
    # leading-axis slices only (stride-2 lane slices are ~1000x slower on TPU).
    # Tail windows read zero-pad rows instead of wrapping: slots >= H hold no
    # bucket, and hash 0 there cannot false-hit (a query whose window reaches
    # row >= H has low hash bits >= H-8, so its full 32-bit hash is nonzero).
    view = jnp.pad(table3[:H], ((0, 6), (0, 0))).reshape(H // 2 + 3, 6)
    table = jnp.concatenate([view[k : H // 2 + k] for k in range(4)], axis=1)

    return HashGrid(
        table=table,
        points=pts_s,
        bucket_slab=bucket_slab,
        feats=feats_s,
        valid=valid,
        voxel_size=jnp.asarray(voxel_size, dtype=jnp.float32),
        max_points_per_voxel=max_points_per_voxel,
    )


@partial(
    jax.jit,
    static_argnames=("cap", "max_points_per_voxel", "evict"),
)
def extend_hash_grid(
    old_points: jnp.ndarray,  # [M_old, 3]
    old_valid: jnp.ndarray,  # [M_old]
    old_feats: Optional[jnp.ndarray],  # [M_old, D] or None
    new_points: jnp.ndarray,  # [M_new, 3] (already world-frame)
    new_mask: jnp.ndarray,  # [M_new]
    new_feats: Optional[jnp.ndarray],
    voxel_size,
    origin,  # [3] eviction origin (pose translation)
    max_distance,
    cap: int,
    max_points_per_voxel: int = 20,
    evict: bool = True,
) -> HashGrid:
    """Device-resident incremental map update: merge the stored (capped) points
    with a new frame, compact to `cap` rows, rebuild the grid, and evict voxels
    that left `max_distance` of `origin` — all in ONE dispatch with no host
    round-trip of the map. This is what makes odometry TPU-native: per frame
    only the new scan crosses the host-device link (the reference mutates a
    host `tsl::robin_map` instead, `VoxelHashMap.cpp:678-770`).

    Insertion-order semantics are preserved: old rows sort before new rows
    (stable compaction), so the first-`max_points_per_voxel` cap and the
    first-point eviction rule pick identical points to the reference.
    """
    pts = jnp.concatenate([old_points, new_points.astype(jnp.float32)])
    mask = jnp.concatenate([old_valid, new_mask])
    # Stable compaction: valid rows first, old before new.
    order = jnp.argsort(~mask, stable=True)[:cap]
    pts_c = pts[order]
    mask_c = mask[order]
    feats_c = None
    if old_feats is not None:
        feats = jnp.concatenate([old_feats, new_feats.astype(jnp.float32)])
        feats_c = feats[order]
    return build_hash_grid(
        pts_c,
        voxel_size,
        mask=mask_c,
        feats=feats_c,
        max_points_per_voxel=max_points_per_voxel,
        evict_origin=origin if evict else None,
        max_distance=max_distance,
    )


# numpy constant (module-level jnp arrays initialize the backend at import
# time, hanging imports when the remote-TPU tunnel is down); consumed inside
# jit, where it becomes the same program constant.
_NEIGHBOR_OFFSETS = np.array(
    [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    dtype=np.int32,
)  # [27, 3]


def _lookup_buckets(grid: HashGrid, h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """hash -> (bucket index, bucket count); count==0 when the voxel is absent.
    The bucket index addresses the bucket's aligned rows in `bucket_slab`
    (rows index*S .. index*S+S-1).

    Linear-probing table lookup: ONE wide gather of the packed stride-2 row
    (8 slots' (hash, start, count) triples) covers the whole 7-probe window."""
    H = 2 * grid.table.shape[0]
    shape = h.shape
    hf = h.reshape(-1)
    base = (hf & jnp.uint32(H - 1)).astype(jnp.int32)
    h_s32 = hf.astype(jnp.int32)

    row = grid.table[base >> 1]  # [Q, 24]: slots (base & ~1) .. +7
    # Probe priority = ascending slot order. For an odd base the j=0 triple is
    # slot base-1, which can never hold `h` (its displacement would be -1 mod
    # H > probe budget), so scanning all 8 triples in order is safe.
    start = jnp.zeros(hf.shape, dtype=jnp.int32)
    count = jnp.zeros(hf.shape, dtype=jnp.int32)
    found = jnp.zeros(hf.shape, dtype=bool)
    for j in range(8):
        hit = (row[:, 3 * j] == h_s32) & ~found
        start = jnp.where(hit, row[:, 3 * j + 1], start)
        count = jnp.where(hit, row[:, 3 * j + 2], count)
        found = found | hit
    valid = found & (hf != INVALID_HASH)
    return start.reshape(shape), jnp.where(valid, count, 0).reshape(shape)


def nearest_neighbors(
    grid: HashGrid,
    queries: jnp.ndarray,
    query_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest map point within the 27-voxel neighborhood of each query.

    Mirrors `VoxelHashMap::GetCorrespondences`'s `GetClosestNeighbor`
    (`VoxelHashMap.cpp:79-134`): scan the 3x3x3 voxel neighborhood, return the
    closest stored point (unbounded distance — the caller applies the
    `max_correspondence_distance` acceptance gate).

    Returns:
      (neighbor[N,3], dist[N], found[N]) — dist=+inf / found=False where the
      neighborhood is empty or the query is masked out.
    """
    cands = gather_candidate_slabs(grid, queries, query_mask)
    return nn_from_slabs(cands, grid.points, queries, query_mask)


class Candidates(NamedTuple):
    """Gathered 27-voxel candidate set: one bucket-aligned slab row per
    neighbor voxel.

    `slabs` [N, 27, S, 128] rows are [x0..x31 | y0..y31 | z0..z31 | rowid0..31]
    (S = ceil(cap/32) rows per bucket); dead lanes carry the INVALID_COORD
    sentinel (their squared distances overflow to +inf) and a row id of M (out
    of range). No window/mask state exists — validity IS the sentinel.

    Derived views: `ok()` [N, K] candidate validity, `row_global()` [N, K] map
    back to rows of `grid.points`, with K = 27*S*32.
    """

    slabs: jnp.ndarray

    def coords(self):
        """(xs, ys, zs) as [N, 27, S*32] views."""
        n, v, S, _ = self.slabs.shape
        return (
            self.slabs[..., 0:32].reshape(n, v, S * 32),
            self.slabs[..., 32:64].reshape(n, v, S * 32),
            self.slabs[..., 64:96].reshape(n, v, S * 32),
        )

    def rowids(self) -> jnp.ndarray:
        n, v, S, _ = self.slabs.shape
        return self.slabs[..., 96:128].reshape(n, v, S * 32)

    def planes(self, group: int):
        """Transposed coordinate planes ([27*group, N] each) for the
        single-pass champion-rebuild kernel (`ops/champion_kernel`): per-voxel
        candidate groups in sublanes, queries in lanes. `group` is the
        per-voxel candidate count kept (cap rounded up to the 8-sublane tile)
        — trimming the slab's sentinel pad lanes before the transpose cuts
        every later rebuild's HBM traffic. One transpose per slab-gather
        epoch, amortized over all of the epoch's rebuilds."""
        n, v, S, _ = self.slabs.shape
        xs, ys, zs = self.coords()  # [N, V, S*32]
        g = min(group, S * 32)
        out = []
        for a in (xs, ys, zs):
            out.append(jnp.transpose(a[:, :, :g], (1, 2, 0)).reshape(v * g, n))
        return tuple(out)

    def row_global(self) -> jnp.ndarray:
        n = self.slabs.shape[0]
        return self.rowids().astype(jnp.int32).reshape(n, -1)

    def ok(self) -> jnp.ndarray:
        n = self.slabs.shape[0]
        return (self.slabs[..., 0:32] < 1e19).reshape(n, -1)


def gather_candidate_slabs(
    grid: HashGrid, queries: jnp.ndarray, query_mask: Optional[jnp.ndarray] = None
) -> Candidates:
    """27 hash lookups + 27 single-row slab gathers around each query.

    Exactly the 27-voxel / first-cap candidate set of the reference's
    `GetClosestNeighbor` scan. The materialized candidates are CACHED across GN
    iterations by the ICP loops (see `registration.icp`): between cache
    refreshes the NN is computed within this set only — this amortizes the
    (memory-rate-bound) candidate construction over several cheap VPU-only
    iterations.
    """
    n = queries.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((n,), dtype=bool)

    base = voxel_coords(queries, grid.voxel_size)
    h27 = voxel_hash(base[:, None, :] + _NEIGHBOR_OFFSETS[None, :, :])
    h27 = jnp.where(query_mask[:, None], h27, INVALID_HASH)
    slab, count = _lookup_buckets(grid, h27)  # [N, 27] (bucket index, count)
    S = -(-grid.max_points_per_voxel // _SLAB)
    n_buckets = (grid.bucket_slab.shape[0] - 2) // S
    slab = jnp.where(count > 0, slab, n_buckets)  # -> all-sentinel empty rows
    rows27 = slab[..., None] * S + jnp.arange(S, dtype=jnp.int32)
    rows27 = jnp.minimum(rows27, grid.bucket_slab.shape[0] - 2)
    return Candidates(slabs=grid.bucket_slab[rows27])  # [N, 27, S, 128]


def nn_from_slabs(
    cands: Candidates,
    grid_points: jnp.ndarray,  # unused (kept for API compatibility)
    queries: jnp.ndarray,  # [N, 3]
    query_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest cached candidate per query (sentinel-driven, no gathers)."""
    n = queries.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((n,), dtype=bool)
    xs, ys, zs = cands.coords()
    xs = xs.reshape(n, -1)
    ys = ys.reshape(n, -1)
    zs = zs.reshape(n, -1)
    dx = xs - queries[:, 0:1]
    dy = ys - queries[:, 1:2]
    dz = zs - queries[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz  # sentinels overflow to +inf
    best_d2 = jnp.min(d2, axis=-1)
    iota = jnp.arange(d2.shape[-1], dtype=jnp.int32)[None, :]
    k = jnp.min(jnp.where(d2 == best_d2[:, None], iota, jnp.int32(2**30)), axis=-1)
    onehot = iota == k[:, None]
    best_pt = jnp.stack(
        [
            jnp.sum(jnp.where(onehot, xs, 0.0), axis=-1),
            jnp.sum(jnp.where(onehot, ys, 0.0), axis=-1),
            jnp.sum(jnp.where(onehot, zs, 0.0), axis=-1),
        ],
        axis=1,
    )
    found = jnp.isfinite(best_d2) & query_mask
    best_pt = jnp.where(found[:, None], best_pt, 0.0)
    inf = jnp.float32(jnp.inf)
    return best_pt, jnp.sqrt(jnp.where(found, best_d2, inf)), found


class NNCache(NamedTuple):
    """Compact per-voxel-champion candidate cache.

    At refresh time the 27-voxel candidate set is reduced to ONE champion per
    neighbor voxel — the in-voxel nearest point to the query's CURRENT
    position. The global NN is the min over champions, so the first cached-NN
    resolve after a refresh is EXACT; between refreshes the champion set is an
    approximation of the same class as the 27-voxel slack itself (both assume
    sub-voxel inter-refresh motion; `refresh_interval=1` makes every iteration
    exact within the epoch's slab set). This cuts the per-iteration stream from
    [N, 27*32] lanes to [N, 32] — the dominant cost of a GN iteration.

    Coordinates carry the `INVALID_COORD` sentinel in dead lanes (squared
    distances overflow to +inf — no mask array to stream); `rows` maps each
    champion back to its row in `grid.points`.

    Arrays are TRANSPOSED ([K=32, N]: champions in sublanes, queries in
    lanes) so the per-iteration Pallas kernels reduce across sublanes while
    the query axis fills full 128-lane tiles."""

    cx: jnp.ndarray  # [32, N] f32 (27 champions + sentinel pad)
    cy: jnp.ndarray
    cz: jnp.ndarray
    rows: jnp.ndarray  # [32, N] i32


def _argmin_first(metric: jnp.ndarray, axis: int):
    """`(min, one-hot-of-first-min)` along `axis` — the champion-reduce
    contract every NN flavor shares: ties resolve to the LOWEST candidate
    index (insertion order, like the reference's sequential scan), and +inf
    sentinel lanes (INVALID_COORD squares overflow) can never win while any
    real candidate exists. Selection happens by one-hot sums at the call
    sites — no gathers on these paths."""
    best = jnp.min(metric, axis=axis)
    k = metric.shape[axis]
    shape = [1] * metric.ndim
    shape[axis % metric.ndim] = k
    iota = jnp.arange(k, dtype=jnp.int32).reshape(shape)
    ksel = jnp.min(
        jnp.where(metric == jnp.expand_dims(best, axis), iota, jnp.int32(2**30)),
        axis=axis,
    )
    onehot = iota == jnp.expand_dims(ksel, axis)
    return best, onehot


def _select(onehot: jnp.ndarray, arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """One-hot champion selection sum (gather-free)."""
    return jnp.sum(jnp.where(onehot, arr, 0.0), axis=axis)


def build_nn_cache(
    cands: Candidates,
    queries: jnp.ndarray,
    query_mask: Optional[jnp.ndarray] = None,
) -> NNCache:
    """Reduce gathered slab candidates to per-voxel champions (see NNCache)."""
    from vfmreg_tpu.ops.nn_kernel import INVALID_COORD

    n = cands.slabs.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((n,), dtype=bool)

    xs, ys, zs = cands.coords()  # [N, 27, S*32]
    dx = xs - queries[:, None, 0:1]
    dy = ys - queries[:, None, 1:2]
    dz = zs - queries[:, None, 2:3]
    d2 = dx * dx + dy * dy + dz * dz  # sentinels overflow to +inf

    best_d2, onehot = _argmin_first(d2, axis=-1)  # [N, 27], [N, 27, S*32]
    bx = _select(onehot, xs, -1)
    by = _select(onehot, ys, -1)
    bz = _select(onehot, zs, -1)
    brow = _select(onehot, cands.rowids(), -1).astype(jnp.int32)

    alive = jnp.isfinite(best_d2) & query_mask[:, None]
    bad = jnp.float32(INVALID_COORD)
    pad = jnp.full((32 - 27, n), bad)
    ipad = jnp.zeros((32 - 27, n), dtype=jnp.int32)

    return NNCache(
        cx=jnp.concatenate([jnp.where(alive, bx, bad).T, pad], axis=0),
        cy=jnp.concatenate([jnp.where(alive, by, bad).T, pad], axis=0),
        cz=jnp.concatenate([jnp.where(alive, bz, bad).T, pad], axis=0),
        rows=jnp.concatenate([brow.T, ipad], axis=0),
    )


def nn_from_cache(
    cache: NNCache,
    grid_points: jnp.ndarray,
    queries: jnp.ndarray,
    query_mask: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest cached champion per query. Same contract as `nn_from_slabs`;
    exact at the refresh position, champion-approximate after motion.

    On TPU the distance/arg-min runs through the fused Pallas kernel
    (`ops/nn_kernel.nn_argmin`); the winning coordinates are then selected
    with one-hot sums — no gathers anywhere on this per-GN-iteration path."""
    n = queries.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((n,), dtype=bool)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from vfmreg_tpu.ops.nn_kernel import nn_argmin

        best_d2, best_k = nn_argmin(cache.cx, cache.cy, cache.cz, queries)
        onehot = (
            jnp.arange(cache.cx.shape[0], dtype=jnp.int32)[:, None] == best_k[None, :]
        )
    else:
        qx, qy, qz = queries[:, 0], queries[:, 1], queries[:, 2]
        d2 = (cache.cx - qx[None, :]) ** 2 + (cache.cy - qy[None, :]) ** 2 + (
            cache.cz - qz[None, :]
        ) ** 2
        best_d2, onehot = _argmin_first(d2, axis=0)
    best_pt = jnp.stack(
        [
            _select(onehot, cache.cx, 0),
            _select(onehot, cache.cy, 0),
            _select(onehot, cache.cz, 0),
        ],
        axis=1,
    )
    found = jnp.isfinite(best_d2) & query_mask
    best_pt = jnp.where(found[:, None], best_pt, 0.0)
    inf = jnp.float32(jnp.inf)
    return best_pt, jnp.sqrt(jnp.where(found, best_d2, inf)), found


def candidate_weights(
    cands: Candidates,
    grid_feats: jnp.ndarray,  # [M, D]
    qfeats: jnp.ndarray,  # [N, D]
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Per-candidate XD distance weights, `clamp(0.5*(1-cos), 0.01, 1.0)`.

    Mirrors the reference's *XD* `GetClosestNeighbor`
    (`VoxelHashMap.cpp:360-384`): when BOTH the query and the candidate carry
    a nonzero descriptor sum, the squared Euclidean distance used for champion
    selection is multiplied by `clamp(0.5*(1-cos), 0.01, 1.0)` with
    `cos = <n, q> / (|n| |q| + 1e-5)`; either side descriptor-less means
    weight 1.0 (plain Euclidean). Note this weighting is LIVE in the XD path
    but disabled in the fixed-size Nd/VFM path (`VoxelHashMap.cpp:246`,
    `if (n_features > 0 && false)`).

    The weight depends only on candidate identity, not on the query position,
    so the ICP loops compute it ONCE per slab-gather epoch and reuse it across
    GN iterations. Memory is bounded by chunking the descriptor gather over
    the 27 neighbor voxels (peak [N, S*32, D]).

    Returns [N, 27*S*32] f32 weights aligned with the flattened candidate axis.
    """
    n, v, S, _ = cands.slabs.shape
    rows = cands.rowids().astype(jnp.int32)  # [N, 27, S*32]; dead lanes huge
    M = grid_feats.shape[0]
    rows_c = jnp.clip(rows, 0, M - 1)
    qfeats = qfeats.astype(jnp.float32)
    q_has = jnp.sum(qfeats, axis=-1) != 0.0  # [N] (sum, not norm: cpp :367)
    qn = jnp.linalg.norm(qfeats, axis=-1)  # [N]

    def per_voxel(r):  # r: [N, S*32] candidate rows of ONE neighbor voxel
        f = grid_feats[r]  # [N, S*32, D]
        dot = jnp.einsum("nkd,nd->nk", f, qfeats)
        fn = jnp.linalg.norm(f, axis=-1)
        fsum = jnp.sum(f, axis=-1)
        cos = dot / (fn * qn[:, None] + eps)
        w = jnp.clip(0.5 * (1.0 - cos), 0.01, 1.0)
        both = q_has[:, None] & (fsum != 0.0)
        return jnp.where(both, w, 1.0)

    w = jax.lax.map(per_voxel, jnp.swapaxes(rows_c, 0, 1))  # [27, N, S*32]
    return jnp.swapaxes(w, 0, 1).reshape(n, v * S * 32)


class WeightedNNCache(NamedTuple):
    """Champion cache for the XD weighted metric (see `candidate_weights`).

    Same per-voxel-champion scheme as `NNCache`, but champions minimize the
    WEIGHTED squared distance `d2 * w`, and each champion carries its weight
    (`cw`) so the cross-voxel resolve between refreshes stays in the weighted
    metric. Acceptance remains plain Euclidean (`VoxelHashMap.cpp:425-433`,
    only the cosine accept-gate is commented out there)."""

    cx: jnp.ndarray  # [32, N] f32 (27 champions + sentinel pad)
    cy: jnp.ndarray
    cz: jnp.ndarray
    cw: jnp.ndarray  # [32, N] f32 champion weights (1.0 pad)


def build_weighted_nn_cache(
    cands: Candidates,
    weights: jnp.ndarray,  # [N, 27*S*32] from candidate_weights
    queries: jnp.ndarray,
    query_mask: Optional[jnp.ndarray] = None,
) -> WeightedNNCache:
    """Per-voxel champions under the weighted metric (XD path)."""
    from vfmreg_tpu.ops.nn_kernel import INVALID_COORD

    n = cands.slabs.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((n,), dtype=bool)

    xs, ys, zs = cands.coords()  # [N, 27, S*32]
    dx = xs - queries[:, None, 0:1]
    dy = ys - queries[:, None, 1:2]
    dz = zs - queries[:, None, 2:3]
    d2 = dx * dx + dy * dy + dz * dz  # sentinels overflow to +inf
    w = weights.reshape(d2.shape)
    wd2 = d2 * w  # inf * [0.01, 1] stays inf

    best, onehot = _argmin_first(wd2, axis=-1)  # [N, 27], [N, 27, S*32]
    bx = _select(onehot, xs, -1)
    by = _select(onehot, ys, -1)
    bz = _select(onehot, zs, -1)
    bw = _select(onehot, w, -1)

    alive = jnp.isfinite(best) & query_mask[:, None]
    bad = jnp.float32(INVALID_COORD)
    pad = jnp.full((32 - 27, n), bad)
    wpad = jnp.ones((32 - 27, n), dtype=jnp.float32)
    return WeightedNNCache(
        cx=jnp.concatenate([jnp.where(alive, bx, bad).T, pad], axis=0),
        cy=jnp.concatenate([jnp.where(alive, by, bad).T, pad], axis=0),
        cz=jnp.concatenate([jnp.where(alive, bz, bad).T, pad], axis=0),
        cw=jnp.concatenate([jnp.where(alive, bw, 1.0).T, wpad], axis=0),
    )


def nn_from_weighted_cache(
    cache: WeightedNNCache,
    queries: jnp.ndarray,
    query_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted-metric champion resolve; returns the champion's plain
    EUCLIDEAN distance for the acceptance gate (`VoxelHashMap.cpp:425-433`)."""
    n = queries.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((n,), dtype=bool)
    qx, qy, qz = queries[:, 0], queries[:, 1], queries[:, 2]
    d2 = (
        (cache.cx - qx[None, :]) ** 2
        + (cache.cy - qy[None, :]) ** 2
        + (cache.cz - qz[None, :]) ** 2
    )
    wd2 = d2 * cache.cw
    best, onehot = _argmin_first(wd2, axis=0)
    best_pt = jnp.stack(
        [
            _select(onehot, cache.cx, 0),
            _select(onehot, cache.cy, 0),
            _select(onehot, cache.cz, 0),
        ],
        axis=1,
    )
    d2_eucl = _select(onehot, d2, 0)
    found = jnp.isfinite(best) & query_mask
    best_pt = jnp.where(found[:, None], best_pt, 0.0)
    inf = jnp.float32(jnp.inf)
    return best_pt, jnp.sqrt(jnp.where(found, d2_eucl, inf)), found


def nearest_neighbors_xd(
    grid: HashGrid,
    queries: jnp.ndarray,  # [N, 3]
    qfeats: jnp.ndarray,  # [N, D] (D == grid descriptor dim)
    query_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact XD weighted NN over the full 27-voxel candidate set.

    Behavioral clone of the XD `GetClosestNeighbor` (`VoxelHashMap.cpp:360-404`):
    champion = argmin of `d2 * clamp(0.5*(1-cos), 0.01, 1.0)`; the returned
    distance is the champion's plain EUCLIDEAN distance (the caller's
    acceptance gate, `:425-433`).
    """
    n = queries.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((n,), dtype=bool)
    cands = gather_candidate_slabs(grid, queries, query_mask)
    w = candidate_weights(cands, grid.feats, qfeats)  # [N, K]
    xs, ys, zs = cands.coords()
    xs = xs.reshape(n, -1)
    ys = ys.reshape(n, -1)
    zs = zs.reshape(n, -1)
    dx = xs - queries[:, 0:1]
    dy = ys - queries[:, 1:2]
    dz = zs - queries[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    wd2 = d2 * w
    best, onehot = _argmin_first(wd2, axis=-1)
    best_pt = jnp.stack(
        [
            _select(onehot, xs, -1),
            _select(onehot, ys, -1),
            _select(onehot, zs, -1),
        ],
        axis=1,
    )
    d2_eucl = _select(onehot, d2, -1)
    found = jnp.isfinite(best) & query_mask
    best_pt = jnp.where(found[:, None], best_pt, 0.0)
    inf = jnp.float32(jnp.inf)
    return best_pt, jnp.sqrt(jnp.where(found, d2_eucl, inf)), found


def gather_candidates(
    grid: HashGrid, queries: jnp.ndarray, query_mask: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N, K, 3] candidate map points around each query + validity.

    AoS convenience view over `gather_candidate_slabs` (pays one transpose —
    the hot ICP path uses the slab form directly)."""
    c = gather_candidate_slabs(grid, queries, query_mask)
    n = c.slabs.shape[0]
    xs, ys, zs = c.coords()
    cand = jnp.stack([xs, ys, zs], axis=-1).reshape(n, -1, 3)
    return cand, c.ok()


def nn_from_candidates(
    cand_pts: jnp.ndarray,  # [N, K, 3]
    cand_ok: jnp.ndarray,  # [N, K]
    queries: jnp.ndarray,  # [N, 3]
    query_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest candidate per query (pure VPU compute, no gathers)."""
    n = queries.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((n,), dtype=bool)
    inf = jnp.float32(jnp.inf)
    d2 = jnp.sum((cand_pts - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_ok, d2, inf)
    j = jnp.argmin(d2, axis=-1)
    best_d2 = jnp.take_along_axis(d2, j[:, None], axis=-1)[:, 0]
    best_pt = jnp.take_along_axis(cand_pts, j[:, None, None], axis=-2)[:, 0, :]
    found = jnp.isfinite(best_d2) & query_mask
    return best_pt, jnp.sqrt(jnp.where(found, best_d2, inf)), found


def export_pointcloud(grid: HashGrid) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """All stored (capped) points, mirror of `VoxelHashMap::Pointcloud[N]`
    (`VoxelHashMap.cpp:628-676`). Returns padded (points, feats, valid)."""
    return grid.points, grid.feats, grid.valid
