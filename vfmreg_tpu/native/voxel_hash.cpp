// Native voxel hash map — the host-side runtime component of vfmreg_tpu.
//
// C++ re-implementation of the capability of the reference's
// `cpp/kiss_icp/core/VoxelHashMap.{hpp,cpp}` (robin_map + TBB) for ragged
// host-side map maintenance: insertion-ordered per-voxel point caps, pose
// updates with far-voxel eviction, padded exports feeding the TPU kernels, and
// an OpenMP-parallel 27-neighborhood correspondence search for host-only
// callers. Exposed through a plain C ABI for ctypes (no pybind11 in this
// toolchain).
//
// Design notes (not a translation): voxel keys pack 21-bit biased coordinates
// into one uint64 (exact for |coord| < 2^20); blocks store indices into a
// single growing point arena (SoA floats), which makes the padded device
// export a straight memcpy sweep instead of per-voxel copies.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int64_t kBias = 1 << 20;

inline int64_t pack_key(int32_t x, int32_t y, int32_t z) {
    return (int64_t(x) + kBias) | ((int64_t(y) + kBias) << 21) | ((int64_t(z) + kBias) << 42);
}

inline int32_t trunc_div(float v, float inv_voxel) {
    // C-style truncation toward zero, matching `static_cast<int>(p / voxel)`.
    return int32_t(v * inv_voxel);
}

struct Block {
    std::vector<int32_t> rows;  // indices into the arena, insertion order, capped
};

struct VoxelHash {
    float voxel_size;
    float max_distance;
    int max_points_per_voxel;
    int dim;  // descriptor dim (0 for plain 3D maps)

    // Point arena (SoA): xyz + optional descriptors; rows never move, eviction
    // flips `alive` and compaction happens on demand.
    std::vector<float> xyz;     // 3 * n
    std::vector<float> feats;   // dim * n
    std::vector<uint8_t> alive;
    std::unordered_map<int64_t, Block> map;
    int64_t n_alive = 0;

    inline int64_t key_of(const float* p) const {
        const float inv = 1.0f / voxel_size;
        return pack_key(trunc_div(p[0], inv), trunc_div(p[1], inv), trunc_div(p[2], inv));
    }
};

}  // namespace

extern "C" {

void* vh_create(float voxel_size, float max_distance, int max_points_per_voxel, int dim) {
    auto* m = new VoxelHash();
    m->voxel_size = voxel_size;
    m->max_distance = max_distance;
    m->max_points_per_voxel = max_points_per_voxel;
    m->dim = dim;
    return m;
}

void vh_destroy(void* h) { delete static_cast<VoxelHash*>(h); }

void vh_clear(void* h) {
    auto* m = static_cast<VoxelHash*>(h);
    m->xyz.clear();
    m->feats.clear();
    m->alive.clear();
    m->map.clear();
    m->n_alive = 0;
}

int64_t vh_size(void* h) { return static_cast<VoxelHash*>(h)->n_alive; }

// Add n points (xyz: n*3, feats: n*dim or nullptr). First-`cap` per voxel in
// insertion order (`VoxelBlock::AddPoint` semantics).
void vh_add_points(void* h, const float* pts, const float* feats, int64_t n) {
    auto* m = static_cast<VoxelHash*>(h);
    m->map.reserve(m->map.size() + size_t(n));
    for (int64_t i = 0; i < n; ++i) {
        const float* p = pts + 3 * i;
        Block& blk = m->map[m->key_of(p)];
        if (int(blk.rows.size()) >= m->max_points_per_voxel) continue;
        int32_t row = int32_t(m->xyz.size() / 3);
        m->xyz.insert(m->xyz.end(), p, p + 3);
        if (m->dim > 0) {
            if (feats != nullptr) {
                m->feats.insert(m->feats.end(), feats + int64_t(m->dim) * i,
                                feats + int64_t(m->dim) * (i + 1));
            } else {
                m->feats.resize(m->feats.size() + m->dim, 0.0f);
            }
        }
        m->alive.push_back(1);
        blk.rows.push_back(row);
        ++m->n_alive;
    }
}

// Transform points by pose (row-major 4x4) then add.
void vh_add_points_posed(void* h, const float* pts, const float* feats, int64_t n,
                         const double* pose) {
    auto* m = static_cast<VoxelHash*>(h);
    std::vector<float> moved(size_t(n) * 3);
    for (int64_t i = 0; i < n; ++i) {
        const float* p = pts + 3 * i;
        for (int r = 0; r < 3; ++r) {
            moved[3 * i + r] = float(pose[4 * r + 0] * p[0] + pose[4 * r + 1] * p[1] +
                                     pose[4 * r + 2] * p[2] + pose[4 * r + 3]);
        }
    }
    vh_add_points(m, moved.data(), feats, n);
}

// Evict whole voxels whose FIRST live point is farther than max_distance from
// origin (`RemovePointsFarFromLocation` semantics).
void vh_remove_far(void* h, const double* origin) {
    auto* m = static_cast<VoxelHash*>(h);
    const float ox = float(origin[0]), oy = float(origin[1]), oz = float(origin[2]);
    const float r2 = m->max_distance * m->max_distance;
    for (auto it = m->map.begin(); it != m->map.end();) {
        const Block& blk = it->second;
        bool far = false;
        if (!blk.rows.empty()) {
            const float* p = m->xyz.data() + 3 * size_t(blk.rows.front());
            const float dx = p[0] - ox, dy = p[1] - oy, dz = p[2] - oz;
            far = dx * dx + dy * dy + dz * dz > r2;
        }
        if (far) {
            for (int32_t row : blk.rows) {
                if (m->alive[row]) {
                    m->alive[row] = 0;
                    --m->n_alive;
                }
            }
            it = m->map.erase(it);
        } else {
            ++it;
        }
    }
}

// Export all live points (insertion order) into caller buffers sized n_alive.
// Returns the number written.
int64_t vh_export(void* h, float* pts_out, float* feats_out) {
    auto* m = static_cast<VoxelHash*>(h);
    int64_t k = 0;
    const int64_t n = int64_t(m->alive.size());
    for (int64_t i = 0; i < n; ++i) {
        if (!m->alive[i]) continue;
        std::memcpy(pts_out + 3 * k, m->xyz.data() + 3 * i, 3 * sizeof(float));
        if (feats_out != nullptr && m->dim > 0) {
            std::memcpy(feats_out + int64_t(m->dim) * k, m->feats.data() + int64_t(m->dim) * i,
                        size_t(m->dim) * sizeof(float));
        }
        ++k;
    }
    return k;
}

// 27-voxel-neighborhood nearest neighbor per query within max_dist.
// Writes matched query/target pairs compacted to the front; returns the count.
int64_t vh_get_correspondences(void* h, const float* queries, int64_t n, double max_dist,
                               float* src_out, float* tgt_out) {
    auto* m = static_cast<VoxelHash*>(h);
    const float inv = 1.0f / m->voxel_size;
    const float md2 = float(max_dist * max_dist);

    std::vector<int8_t> hit(size_t(n), 0);
    std::vector<float> best(size_t(n) * 3);

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; ++i) {
        const float* q = queries + 3 * i;
        const int32_t kx = trunc_div(q[0], inv), ky = trunc_div(q[1], inv),
                      kz = trunc_div(q[2], inv);
        float best_d2 = md2;
        const float* best_p = nullptr;
        for (int dx = -1; dx <= 1; ++dx)
            for (int dy = -1; dy <= 1; ++dy)
                for (int dz = -1; dz <= 1; ++dz) {
                    auto it = m->map.find(pack_key(kx + dx, ky + dy, kz + dz));
                    if (it == m->map.end()) continue;
                    for (int32_t row : it->second.rows) {
                        if (!m->alive[row]) continue;
                        const float* p = m->xyz.data() + 3 * size_t(row);
                        const float ddx = p[0] - q[0], ddy = p[1] - q[1], ddz = p[2] - q[2];
                        const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                        if (d2 < best_d2) {
                            best_d2 = d2;
                            best_p = p;
                        }
                    }
                }
        if (best_p != nullptr) {
            hit[i] = 1;
            std::memcpy(best.data() + 3 * i, best_p, 3 * sizeof(float));
        }
    }

    int64_t k = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (!hit[i]) continue;
        std::memcpy(src_out + 3 * k, queries + 3 * i, 3 * sizeof(float));
        std::memcpy(tgt_out + 3 * k, best.data() + 3 * i, 3 * sizeof(float));
        ++k;
    }
    return k;
}

}  // extern "C"
