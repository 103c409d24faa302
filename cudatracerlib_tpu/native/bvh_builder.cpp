// Native binned-SAH BVH builder.
//
// TPU-native framework's counterpart of the reference's CPU SBVH builder
// (Engine/SpatialStructures/BVH/SplitBVHBuilder.cpp — Stich et al. binned SAH;
// spatial splits omitted, object splits with 16-bin SAH match its object-split
// path). Emits exactly the flat layout accel/bvh.py defines:
//   nodes: (M, 16) float32 — [c0.min, c0.max, c1.min, c1.max,
//                             bitcast(int32 c0_code), bitcast(int32 c1_code), pad, pad]
//   child code >= 0: inner node index; < 0: leaf, first = -(code+1),
//   every leaf holds exactly LEAF_SIZE triangles (padded by duplication).
//
// Built as a plain shared object, loaded via ctypes (no pybind11 in the image).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
    float x, y, z;
    Vec3() : x(0), y(0), z(0) {}
    Vec3(float a, float b, float c) : x(a), y(b), z(c) {}
};

static inline Vec3 vmin(const Vec3& a, const Vec3& b) {
    return Vec3(std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z));
}
static inline Vec3 vmax(const Vec3& a, const Vec3& b) {
    return Vec3(std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z));
}

struct AABB {
    Vec3 lo{1e30f, 1e30f, 1e30f};
    Vec3 hi{-1e30f, -1e30f, -1e30f};
    void grow(const AABB& o) { lo = vmin(lo, o.lo); hi = vmax(hi, o.hi); }
    void grow(const Vec3& p) { lo = vmin(lo, p); hi = vmax(hi, p); }
    float area() const {
        float dx = std::max(hi.x - lo.x, 0.f);
        float dy = std::max(hi.y - lo.y, 0.f);
        float dz = std::max(hi.z - lo.z, 0.f);
        return dx * dy + dy * dz + dz * dx;
    }
    Vec3 centroid() const {
        return Vec3(0.5f * (lo.x + hi.x), 0.5f * (lo.y + hi.y), 0.5f * (lo.z + hi.z));
    }
};

struct Builder {
    const float* tris;  // (T, 9)
    int T;
    int leaf_size;
    int n_bins;
    int max_depth;
    std::vector<AABB> boxes;
    std::vector<Vec3> cents;
    std::vector<int> ids;
    std::vector<float> nodes;   // flat (M, 16)
    std::vector<int> order;     // padded leaf-order triangle ids

    int make_leaf(int begin, int end) {
        int first = (int)order.size();
        int count = end - begin;
        for (int i = begin; i < end; ++i) order.push_back(ids[i]);
        for (int i = count; i < leaf_size; ++i) order.push_back(ids[begin]);
        return -(first + 1);
    }

    int emit_node() {
        int idx = (int)nodes.size() / 16;
        nodes.resize(nodes.size() + 16, 0.f);
        return idx;
    }

    void write_node(int idx, const AABB& l, const AABB& r, int c0, int c1) {
        float* n = &nodes[idx * 16];
        n[0] = l.lo.x; n[1] = l.lo.y; n[2] = l.lo.z;
        n[3] = l.hi.x; n[4] = l.hi.y; n[5] = l.hi.z;
        n[6] = r.lo.x; n[7] = r.lo.y; n[8] = r.lo.z;
        n[9] = r.hi.x; n[10] = r.hi.y; n[11] = r.hi.z;
        std::memcpy(&n[12], &c0, 4);
        std::memcpy(&n[13], &c1, 4);
    }

    AABB range_box(int begin, int end) const {
        AABB b;
        for (int i = begin; i < end; ++i) b.grow(boxes[ids[i]]);
        return b;
    }

    // balanced subtree of leaf chunks for unsplittable ranges
    int leaf_subtree(int begin, int end) {
        int count = end - begin;
        if (count <= leaf_size) return make_leaf(begin, end);
        int half = (count / (2 * leaf_size)) * leaf_size;
        if (half == 0) half = leaf_size;
        int idx = emit_node();
        int c0 = leaf_subtree(begin, begin + half);
        int c1 = leaf_subtree(begin + half, end);
        write_node(idx, range_box(begin, begin + half), range_box(begin + half, end), c0, c1);
        return idx;
    }

    int build(int begin, int end, int depth) {
        int count = end - begin;
        if (count <= leaf_size || depth >= max_depth) return leaf_subtree(begin, end);

        // centroid bounds
        AABB cb;
        for (int i = begin; i < end; ++i) cb.grow(cents[ids[i]]);
        float ext[3] = {cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};
        int axis = 0;
        if (ext[1] > ext[0]) axis = 1;
        if (ext[2] > ext[axis]) axis = 2;
        if (ext[axis] < 1e-12f) return leaf_subtree(begin, end);

        const float cb_lo = axis == 0 ? cb.lo.x : (axis == 1 ? cb.lo.y : cb.lo.z);
        const float scale = n_bins * (1.0f - 1e-6f) / ext[axis];

        // binned SAH
        std::vector<AABB> bin_box(n_bins);
        std::vector<int> bin_n(n_bins, 0);
        auto bin_of = [&](int tid) {
            float c = axis == 0 ? cents[tid].x : (axis == 1 ? cents[tid].y : cents[tid].z);
            int b = (int)((c - cb_lo) * scale);
            return std::min(std::max(b, 0), n_bins - 1);
        };
        for (int i = begin; i < end; ++i) {
            int b = bin_of(ids[i]);
            bin_box[b].grow(boxes[ids[i]]);
            bin_n[b]++;
        }
        std::vector<float> r_area(n_bins + 1, 0.f);
        std::vector<int> r_cnt(n_bins + 1, 0);
        AABB acc;
        for (int b = n_bins - 1; b >= 0; --b) {
            if (bin_n[b]) acc.grow(bin_box[b]);
            r_area[b] = bin_n[b] || r_cnt[b + 1] ? acc.area() : 0.f;
            r_cnt[b] = r_cnt[b + 1] + bin_n[b];
        }
        float best_cost = 1e30f;
        int best_bin = -1;
        AABB lacc;
        int lcnt = 0;
        AABB best_l;
        for (int b = 0; b < n_bins - 1; ++b) {
            if (bin_n[b]) lacc.grow(bin_box[b]);
            lcnt += bin_n[b];
            if (lcnt == 0 || r_cnt[b + 1] == 0) continue;
            float cost = lacc.area() * lcnt + r_area[b + 1] * r_cnt[b + 1];
            if (cost < best_cost) { best_cost = cost; best_bin = b; best_l = lacc; }
        }

        int mid;
        if (best_bin < 0) {
            // median split fallback
            mid = begin + count / 2;
            std::nth_element(ids.begin() + begin, ids.begin() + mid, ids.begin() + end,
                             [&](int a, int b2) {
                                 float ca = axis == 0 ? cents[a].x : (axis == 1 ? cents[a].y : cents[a].z);
                                 float cb2 = axis == 0 ? cents[b2].x : (axis == 1 ? cents[b2].y : cents[b2].z);
                                 return ca < cb2;
                             });
        } else {
            mid = (int)(std::partition(ids.begin() + begin, ids.begin() + end,
                                       [&](int t) { return bin_of(t) <= best_bin; }) -
                        ids.begin());
            if (mid == begin || mid == end) mid = begin + count / 2;
        }

        int idx = emit_node();
        int c0 = build(begin, mid, depth + 1);
        int c1 = build(mid, end, depth + 1);
        write_node(idx, range_box(begin, mid), range_box(mid, end), c0, c1);
        return idx;
    }
};

}  // namespace

extern "C" {

// Returns root code; fills caller-queried buffers via the getters below.
// Workflow: build_bvh() -> n_nodes()/n_order() -> copy_nodes()/copy_order() -> release().
static thread_local Builder* g_builder = nullptr;
static thread_local int g_root = 0;

int bvh_build(const float* tris, int T, int leaf_size, int n_bins, int max_depth) {
    if (g_builder) { delete g_builder; g_builder = nullptr; }
    g_builder = new Builder();
    Builder& B = *g_builder;
    B.tris = tris;
    B.T = T;
    B.leaf_size = leaf_size;
    B.n_bins = n_bins;
    B.max_depth = max_depth;
    B.boxes.resize(T);
    B.cents.resize(T);
    B.ids.resize(T);
    for (int t = 0; t < T; ++t) {
        AABB b;
        for (int v = 0; v < 3; ++v)
            b.grow(Vec3(tris[t * 9 + v * 3], tris[t * 9 + v * 3 + 1], tris[t * 9 + v * 3 + 2]));
        B.boxes[t] = b;
        B.cents[t] = b.centroid();
        B.ids[t] = t;
    }
    B.nodes.reserve((size_t)T * 8);
    B.order.reserve((size_t)T * 2);
    g_root = B.build(0, T, 0);
    if (B.nodes.empty()) {
        // single-leaf scene: wrap in a dummy inner node
        int idx = B.emit_node();
        AABB all = B.range_box(0, T);
        B.write_node(idx, all, all, g_root, -(1000000000 + 1));
        g_root = idx;
    }
    return g_root;
}

int bvh_n_nodes() { return g_builder ? (int)(g_builder->nodes.size() / 16) : 0; }
int bvh_n_order() { return g_builder ? (int)g_builder->order.size() : 0; }

void bvh_copy(float* nodes_out, int* order_out) {
    if (!g_builder) return;
    std::memcpy(nodes_out, g_builder->nodes.data(), g_builder->nodes.size() * sizeof(float));
    std::memcpy(order_out, g_builder->order.data(), g_builder->order.size() * sizeof(int));
}

void bvh_release() {
    delete g_builder;
    g_builder = nullptr;
}

}  // extern "C"
