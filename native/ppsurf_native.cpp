// ppsurf_tpu native host library.
//
// First-party C++ for the host-side hot paths that the reference delegated
// to third-party native wheels (SURVEY.md §2.3): marching cubes
// (skimage.measure.marching_cubes), kd-tree k-NN queries (pykdtree), and
// face-adjacency connected components (trimesh). Exposed through a plain C
// ABI consumed via ctypes (no pybind11 in this image).
//
// Marching cubes uses the same generated-table construction as the Python
// reference implementation (ppsurf_tpu/recon/marching_cubes.py): cut-edge
// pairing per face with the "separate inside corners" rule, cycle tracing,
// fan triangulation. Both implementations are cross-checked in tests.

#include <cstdint>
#include <cstring>
#include <functional>
#include <cmath>
#include <algorithm>
#include <limits>
#include <map>
#include <queue>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Marching cubes
// ---------------------------------------------------------------------------

namespace {

const int kCorners[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};
const int kEdges[12][2] = {
    {0, 1}, {1, 2}, {2, 3}, {3, 0},
    {4, 5}, {5, 6}, {6, 7}, {7, 4},
    {0, 4}, {1, 5}, {2, 6}, {3, 7},
};
// faces as cyclic corner loops, CCW viewed from outside
const int kFaces[6][4] = {
    {0, 3, 2, 1}, {4, 5, 6, 7}, {0, 1, 5, 4},
    {2, 3, 7, 6}, {0, 4, 7, 3}, {1, 2, 6, 5},
};

struct McTables {
  int8_t tri[256][16];   // up to 5 triangles, -1 terminated
  int8_t ntri[256];
  int edge_axis[12];
  int edge_base[12][3];

  McTables() {
    int edge_of[8][8];
    for (auto& row : edge_of) std::fill(row, row + 8, -1);
    for (int e = 0; e < 12; ++e) {
      edge_of[kEdges[e][0]][kEdges[e][1]] = e;
      edge_of[kEdges[e][1]][kEdges[e][0]] = e;
      const int* a = kCorners[kEdges[e][0]];
      const int* b = kCorners[kEdges[e][1]];
      for (int d = 0; d < 3; ++d) {
        edge_base[e][d] = std::min(a[d], b[d]);
        if (a[d] != b[d]) edge_axis[e] = d;
      }
    }
    for (int config = 0; config < 256; ++config) {
      bool inside[8];
      for (int i = 0; i < 8; ++i) inside[i] = (config >> i) & 1;
      int nxt[12];
      std::fill(nxt, nxt + 12, -1);
      for (const auto& face : kFaces) {
        for (int s = 0; s < 4; ++s) {
          int a = face[s], b = face[(s + 1) % 4];
          if (inside[a] && !inside[b]) {
            int exit_edge = edge_of[a][b];
            int t = s;
            while (inside[face[((t % 4) + 4) % 4]]) --t;
            int entry_edge =
                edge_of[face[((t % 4) + 4) % 4]][face[(((t + 1) % 4) + 4) % 4]];
            nxt[entry_edge] = exit_edge;
          }
        }
      }
      int count = 0;
      std::fill(tri[config], tri[config] + 16, -1);
      bool used[12] = {false};
      for (int start = 0; start < 12; ++start) {
        if (nxt[start] < 0 || used[start]) continue;
        int cycle[12], len = 0;
        int cur = start;
        do {
          cycle[len++] = cur;
          used[cur] = true;
          cur = nxt[cur];
        } while (cur != start && len < 12);
        for (int i = 1; i + 1 < len; ++i) {
          tri[config][3 * count] = static_cast<int8_t>(cycle[0]);
          tri[config][3 * count + 1] = static_cast<int8_t>(cycle[i]);
          tri[config][3 * count + 2] = static_cast<int8_t>(cycle[i + 1]);
          ++count;
        }
      }
      ntri[config] = static_cast<int8_t>(count);
    }
  }
};

const McTables& mc_tables() {
  static McTables tables;
  return tables;
}

}  // namespace

// Extract the iso-surface of a (nx, ny, nz) float64 volume. NaN cells are
// outside; cells touching a NaN corner emit no geometry (matches the Python
// implementation). Returns number of vertices/faces written; call first with
// verts=faces=nullptr to query sizes (two-pass API for simple ctypes use).
int64_t mc_extract(const double* volume, int64_t nx, int64_t ny, int64_t nz,
                   double level, float* verts_out, int64_t* faces_out,
                   int64_t* n_verts_out, int64_t* n_faces_out,
                   int64_t max_verts, int64_t max_faces) {
  const McTables& T = mc_tables();
  auto at = [&](int64_t x, int64_t y, int64_t z) {
    return volume[(x * ny + y) * nz + z];
  };

  std::unordered_map<int64_t, int64_t> edge_vertex;
  edge_vertex.reserve(1 << 16);
  int64_t n_verts = 0, n_faces = 0;
  bool counting = (verts_out == nullptr);

  for (int64_t x = 0; x + 1 < nx; ++x) {
    for (int64_t y = 0; y + 1 < ny; ++y) {
      for (int64_t z = 0; z + 1 < nz; ++z) {
        int config = 0;
        bool valid = true;
        double vals[8];
        for (int i = 0; i < 8; ++i) {
          double v = at(x + kCorners[i][0], y + kCorners[i][1],
                        z + kCorners[i][2]);
          if (std::isnan(v)) {
            valid = false;
            break;
          }
          vals[i] = v;
          if (v < level) config |= 1 << i;
        }
        if (!valid || config == 0 || config == 255) continue;

        int64_t vert_ids[12];
        for (int e = 0; e < 12; ++e) vert_ids[e] = -1;
        int nt = T.ntri[config];
        for (int t = 0; t < 3 * nt; ++t) {
          int e = T.tri[config][t];
          if (vert_ids[e] >= 0) continue;
          int64_t bx = x + T.edge_base[e][0];
          int64_t by = y + T.edge_base[e][1];
          int64_t bz = z + T.edge_base[e][2];
          int ax = T.edge_axis[e];
          int64_t geid = (((bx * ny + by) * nz + bz) * 3) + ax;
          auto it = edge_vertex.find(geid);
          if (it != edge_vertex.end()) {
            vert_ids[e] = it->second;
            continue;
          }
          int64_t vid = n_verts++;
          edge_vertex.emplace(geid, vid);
          vert_ids[e] = vid;
          if (!counting) {
            if (vid >= max_verts) return -1;
            double v0 = at(bx, by, bz);
            int64_t cx = bx + (ax == 0), cy = by + (ax == 1),
                    cz = bz + (ax == 2);
            double v1 = at(cx, cy, cz);
            double denom = v1 - v0;
            double tt = (std::abs(denom) > 1e-300) ? (level - v0) / denom : 0.5;
            tt = std::min(1.0, std::max(0.0, tt));
            verts_out[3 * vid + 0] = static_cast<float>(bx + (ax == 0) * tt);
            verts_out[3 * vid + 1] = static_cast<float>(by + (ax == 1) * tt);
            verts_out[3 * vid + 2] = static_cast<float>(bz + (ax == 2) * tt);
          }
        }
        for (int t = 0; t < nt; ++t) {
          int64_t fid = n_faces++;
          if (!counting) {
            if (fid >= max_faces) return -1;
            faces_out[3 * fid + 0] = vert_ids[T.tri[config][3 * t]];
            faces_out[3 * fid + 1] = vert_ids[T.tri[config][3 * t + 1]];
            faces_out[3 * fid + 2] = vert_ids[T.tri[config][3 * t + 2]];
          }
        }
      }
    }
  }
  *n_verts_out = n_verts;
  *n_faces_out = n_faces;
  return 0;
}

// ---------------------------------------------------------------------------
// kd-tree (median-split, static) for host-side metric paths
// ---------------------------------------------------------------------------

namespace {

struct KdTree {
  std::vector<float> pts;  // (n, 3)
  std::vector<int64_t> idx;
  std::vector<int64_t> left, right;
  std::vector<int64_t> node_pt;
  std::vector<int> axis;
  int64_t root = -1;

  int64_t build(int64_t lo, int64_t hi, int depth) {
    if (lo >= hi) return -1;
    int ax = depth % 3;
    int64_t mid = (lo + hi) / 2;
    std::nth_element(
        idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
        [&](int64_t a, int64_t b) { return pts[3 * a + ax] < pts[3 * b + ax]; });
    int64_t node = node_pt.size();
    node_pt.push_back(idx[mid]);
    axis.push_back(ax);
    left.push_back(-1);
    right.push_back(-1);
    int64_t l = build(lo, mid, depth + 1);
    int64_t r = build(mid + 1, hi, depth + 1);
    left[node] = l;
    right[node] = r;
    return node;
  }

  void query(const float* q, int k, std::vector<std::pair<float, int64_t>>& heap,
             int64_t node) const {
    if (node < 0) return;
    int64_t p = node_pt[node];
    float d2 = 0;
    for (int d = 0; d < 3; ++d) {
      float diff = q[d] - pts[3 * p + d];
      d2 += diff * diff;
    }
    if (static_cast<int>(heap.size()) < k) {
      heap.emplace_back(d2, p);
      std::push_heap(heap.begin(), heap.end());
    } else if (d2 < heap.front().first) {
      std::pop_heap(heap.begin(), heap.end());
      heap.back() = {d2, p};
      std::push_heap(heap.begin(), heap.end());
    }
    int ax = axis[node];
    float delta = q[ax] - pts[3 * p + ax];
    int64_t near = delta < 0 ? left[node] : right[node];
    int64_t far = delta < 0 ? right[node] : left[node];
    query(q, k, heap, near);
    if (static_cast<int>(heap.size()) < k || delta * delta < heap.front().first)
      query(q, k, heap, far);
  }
};

}  // namespace

void* kdtree_build(const float* pts, int64_t n) {
  auto* tree = new KdTree();
  tree->pts.assign(pts, pts + 3 * n);
  tree->idx.resize(n);
  for (int64_t i = 0; i < n; ++i) tree->idx[i] = i;
  tree->node_pt.reserve(n);
  tree->root = tree->build(0, n, 0);
  return tree;
}

void kdtree_free(void* handle) { delete static_cast<KdTree*>(handle); }

// dists (squared), ids: (nq, k) preallocated
void kdtree_query(void* handle, const float* queries, int64_t nq, int k,
                  float* dists, int64_t* ids) {
  auto* tree = static_cast<KdTree*>(handle);
  std::vector<std::pair<float, int64_t>> heap;
  for (int64_t i = 0; i < nq; ++i) {
    heap.clear();
    tree->query(queries + 3 * i, k, heap, tree->root);
    std::sort_heap(heap.begin(), heap.end());
    for (int j = 0; j < k; ++j) {
      if (j < static_cast<int>(heap.size())) {
        dists[i * k + j] = heap[j].first;
        ids[i * k + j] = heap[j].second;
      } else {
        dists[i * k + j] = std::numeric_limits<float>::infinity();
        ids[i * k + j] = -1;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// face-adjacency connected components
// ---------------------------------------------------------------------------

// labels: (n_faces,) preallocated; returns number of components.
//
// Sort-based: (edge_key, face) pairs sorted once, runs of equal keys
// union their faces. Replaces an unordered_map edge registry — hashing
// 3F keys does cache/TLB-hostile random access, which on the sandboxed
// kernels this runs under (see utils/alloc.py) was measured at up to 8x
// the standalone cost inside a large-heap process; std::sort's mostly
// sequential passes are robust to that. ~0.4 s at 966k faces vs 2-16 s
// for the scipy coo/csr/BFS pipeline in-process.
int64_t face_components(const int64_t* faces, int64_t n_faces, int64_t* labels) {
  std::vector<int64_t> parent(n_faces);
  for (int64_t i = 0; i < n_faces; ++i) parent[i] = i;
  auto find = [&parent](int64_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  };

  std::vector<std::pair<uint64_t, int64_t>> ef(3 * n_faces);
  for (int64_t f = 0; f < n_faces; ++f) {
    for (int e = 0; e < 3; ++e) {
      int64_t a = faces[3 * f + e];
      int64_t b = faces[3 * f + (e + 1) % 3];
      if (a > b) std::swap(a, b);
      ef[3 * f + e] = {(static_cast<uint64_t>(a) << 32) |
                           static_cast<uint64_t>(static_cast<uint32_t>(b)),
                       f};
    }
  }
  std::sort(ef.begin(), ef.end());
  for (int64_t i = 1; i < 3 * n_faces; ++i) {
    if (ef[i].first == ef[i - 1].first) {
      int64_t ra = find(ef[i - 1].second), rb = find(ef[i].second);
      if (ra != rb) parent[ra] = rb;
    }
  }
  // compact labels in first-occurrence order (matches the hash-map
  // version's deterministic relabeling)
  std::vector<int64_t> remap(n_faces, -1);
  int64_t n_comp = 0;
  for (int64_t f = 0; f < n_faces; ++f) {
    int64_t r = find(f);
    if (remap[r] < 0) remap[r] = n_comp++;
    labels[f] = remap[r];
  }
  return n_comp;
}

// ---------------------------------------------------------------------------
// mesh cleanup primitives (recon/mesh_ops.py fast path)
// ---------------------------------------------------------------------------

// Row-unique over (n, 3) double keys. Semantics match the numpy lexsort
// path in recon/mesh_ops.py _unique_rows: `inverse` numbers groups in
// lexicographic value order, `first` (only the first n_unique entries
// valid) is each group's smallest original index. Replaces np.lexsort +
// boolean-diff numpy passes whose allocations intermittently cost seconds
// inside the reconstruction process (single shared host core).
int64_t unique_rows_f64(const double* keys, int64_t n, int64_t* first,
                        int64_t* inverse) {
  if (n == 0) return 0;
  struct Row {
    double a, b, c;
    int64_t i;
  };
  std::vector<Row> rows(n);
  for (int64_t i = 0; i < n; ++i)
    rows[i] = {keys[3 * i], keys[3 * i + 1], keys[3 * i + 2], i};
  std::sort(rows.begin(), rows.end(), [](const Row& x, const Row& y) {
    if (x.a != y.a) return x.a < y.a;
    if (x.b != y.b) return x.b < y.b;
    if (x.c != y.c) return x.c < y.c;
    return x.i < y.i;  // stable within equal keys -> leader = min index
  });
  int64_t g = -1;
  for (int64_t j = 0; j < n; ++j) {
    if (j == 0 || rows[j].a != rows[j - 1].a || rows[j].b != rows[j - 1].b ||
        rows[j].c != rows[j - 1].c) {
      ++g;
      first[g] = rows[j].i;
    }
    inverse[rows[j].i] = g;
  }
  return g + 1;
}

// Degenerate + duplicate-face removal matching remove_degenerate_faces:
// drop faces with a repeated vertex, keep the first occurrence of every
// sorted-vertex-set, preserve original face order. Writes kept original
// face indices (ascending) into keep (preallocated n_faces); returns count.
int64_t dedup_faces(const int64_t* faces, int64_t n_faces, int64_t* keep) {
  struct KF {
    int64_t a, b, c, i;
  };
  std::vector<KF> kf;
  kf.reserve(n_faces);
  for (int64_t i = 0; i < n_faces; ++i) {
    int64_t a = faces[3 * i], b = faces[3 * i + 1], c = faces[3 * i + 2];
    if (a == b || b == c || a == c) continue;
    int64_t lo = std::min(a, std::min(b, c));
    int64_t hi = std::max(a, std::max(b, c));
    kf.push_back({lo, a + b + c - lo - hi, hi, i});
  }
  std::sort(kf.begin(), kf.end(), [](const KF& x, const KF& y) {
    if (x.a != y.a) return x.a < y.a;
    if (x.b != y.b) return x.b < y.b;
    if (x.c != y.c) return x.c < y.c;
    return x.i < y.i;
  });
  int64_t m = 0;
  for (size_t j = 0; j < kf.size(); ++j) {
    if (j == 0 || kf[j].a != kf[j - 1].a || kf[j].b != kf[j - 1].b ||
        kf[j].c != kf[j - 1].c)
      keep[m++] = kf[j].i;
  }
  std::sort(keep, keep + m);
  return m;
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------------
// region-growing step kernels (reconstruction host loop)
// ---------------------------------------------------------------------------
//
// The reconstruction frontier loop (ppsurf_tpu/recon/engine.py, after
// reference poco_utils.py:178-254) needs two dense-grid operations per
// round; in numpy they cost ~1.2 s/round on a 259^3 grid, dominating
// high-resolution runs. Both walk the frontier point list directly instead
// of materializing full-grid boolean masks.

// Collect unevaluated voxels (volume NaN) within the +-dil cube of any
// frontier point. coords_out must hold up to n_frontier*(2*dil+1)^3 rows
// (call with max_out to cap). Marks visited cells in scratch 'stamp'
// (uint8, grid-sized, caller-zeroed once and reused via epoch counter).
int64_t rg_dilate_unevaluated(
    const double* volume, int64_t nx, int64_t ny, int64_t nz,
    const int32_t* frontier, int64_t n_frontier, int64_t dil,
    uint8_t* stamp, uint8_t epoch, int32_t* coords_out, int64_t max_out) {
  int64_t count = 0;
  for (int64_t i = 0; i < n_frontier; ++i) {
    int64_t fx = frontier[3 * i], fy = frontier[3 * i + 1],
            fz = frontier[3 * i + 2];
    int64_t x0 = std::max<int64_t>(0, fx - dil),
            x1 = std::min<int64_t>(nx - 1, fx + dil);
    int64_t y0 = std::max<int64_t>(0, fy - dil),
            y1 = std::min<int64_t>(ny - 1, fy + dil);
    int64_t z0 = std::max<int64_t>(0, fz - dil),
            z1 = std::min<int64_t>(nz - 1, fz + dil);
    for (int64_t x = x0; x <= x1; ++x)
      for (int64_t y = y0; y <= y1; ++y)
        for (int64_t z = z0; z <= z1; ++z) {
          int64_t idx = (x * ny + y) * nz + z;
          if (stamp[idx] == epoch) continue;
          stamp[idx] = epoch;
          if (std::isnan(volume[idx])) {
            if (count >= max_out) return -1;
            coords_out[3 * count] = static_cast<int32_t>(x);
            coords_out[3 * count + 1] = static_cast<int32_t>(y);
            coords_out[3 * count + 2] = static_cast<int32_t>(z);
            ++count;
          }
        }
  }
  return count;
}

// Next frontier: evaluated cells within +-dil of a frontier point whose
// value has the opposite (loose) sign, excluding already-seen cells.
// 'seen' is updated with the current frontier. Two stamps avoid duplicate
// emission.
int64_t rg_next_frontier(
    const double* volume, int64_t nx, int64_t ny, int64_t nz,
    const int32_t* frontier, int64_t n_frontier, int64_t dil,
    uint8_t* seen, uint8_t* stamp, uint8_t epoch,
    int32_t* coords_out, int64_t max_out) {
  for (int64_t i = 0; i < n_frontier; ++i) {
    int64_t idx = (static_cast<int64_t>(frontier[3 * i]) * ny +
                   frontier[3 * i + 1]) * nz + frontier[3 * i + 2];
    seen[idx] = 1;
  }
  int64_t count = 0;
  for (int64_t i = 0; i < n_frontier; ++i) {
    int64_t fx = frontier[3 * i], fy = frontier[3 * i + 1],
            fz = frontier[3 * i + 2];
    double fv = volume[(fx * ny + fy) * nz + fz];
    bool grow_pos = fv <= 0.0;  // nonpos frontier grows into nonneg cells
    bool grow_neg = fv >= 0.0;
    int64_t x0 = std::max<int64_t>(0, fx - dil),
            x1 = std::min<int64_t>(nx - 1, fx + dil);
    int64_t y0 = std::max<int64_t>(0, fy - dil),
            y1 = std::min<int64_t>(ny - 1, fy + dil);
    int64_t z0 = std::max<int64_t>(0, fz - dil),
            z1 = std::min<int64_t>(nz - 1, fz + dil);
    for (int64_t x = x0; x <= x1; ++x)
      for (int64_t y = y0; y <= y1; ++y)
        for (int64_t z = z0; z <= z1; ++z) {
          int64_t idx2 = (x * ny + y) * nz + z;
          if (stamp[idx2] == epoch || seen[idx2]) continue;
          double v = volume[idx2];
          if (std::isnan(v)) continue;
          bool take = (grow_pos && v >= 0.0) || (grow_neg && v <= 0.0);
          if (!take) continue;
          stamp[idx2] = epoch;
          if (count >= max_out) return -1;
          coords_out[3 * count] = static_cast<int32_t>(x);
          coords_out[3 * count + 1] = static_cast<int32_t>(y);
          coords_out[3 * count + 2] = static_cast<int32_t>(z);
          ++count;
        }
  }
  return count;
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------------
// software mesh renderer (figure tooling)
// ---------------------------------------------------------------------------
//
// Replaces the reference's pyglet offscreen render
// (source/base/visualization.py:25-63) with a headless z-buffer
// rasterizer: perspective camera, barycentric-interpolated vertex colors
// (or Lambert-shaded face normals when colors are absent). Deterministic,
// display-free, ~50 ms for a 600k-face mesh at 1024^2.

// verts (nv,3) f32 world; faces (nf,3) i32; colors (nv,3) u8 or null;
// view: row-major 4x4 world->camera; fov_deg vertical field of view;
// out_rgb (h,w,3) u8 pre-filled with the background color.
void render_mesh(const float* verts, int64_t nv, const int32_t* faces,
                 int64_t nf, const uint8_t* colors, const double* view,
                 int64_t width, int64_t height, double fov_deg,
                 uint8_t* out_rgb) {
  if (nv == 0 || nf == 0 || width <= 0 || height <= 0) return;
  std::vector<float> cam(nv * 3);       // camera-space positions
  std::vector<float> scr(nv * 2);       // screen positions
  const double f = 0.5 * (double)height / std::tan(0.5 * fov_deg * M_PI / 180.0);
  for (int64_t i = 0; i < nv; ++i) {
    double x = verts[3 * i], y = verts[3 * i + 1], z = verts[3 * i + 2];
    double cx = view[0] * x + view[1] * y + view[2] * z + view[3];
    double cy = view[4] * x + view[5] * y + view[6] * z + view[7];
    double cz = view[8] * x + view[9] * y + view[10] * z + view[11];
    cam[3 * i] = (float)cx;
    cam[3 * i + 1] = (float)cy;
    cam[3 * i + 2] = (float)cz;
    // camera looks down -z; guard near plane
    double zc = std::max(1e-6, -cz);
    scr[2 * i] = (float)(0.5 * width + f * cx / zc);
    scr[2 * i + 1] = (float)(0.5 * height - f * cy / zc);
  }
  std::vector<float> zbuf((size_t)(width * height),
                          std::numeric_limits<float>::infinity());
  const double light[3] = {0.3585, 0.3585, 0.8616};  // over-the-shoulder key
  for (int64_t t = 0; t < nf; ++t) {
    int32_t a = faces[3 * t], b = faces[3 * t + 1], c = faces[3 * t + 2];
    if (a < 0 || b < 0 || c < 0 || a >= nv || b >= nv || c >= nv) continue;
    float za = -cam[3 * a + 2], zb = -cam[3 * b + 2], zc2 = -cam[3 * c + 2];
    if (za <= 1e-6f || zb <= 1e-6f || zc2 <= 1e-6f) continue;  // behind camera
    float ax = scr[2 * a], ay = scr[2 * a + 1];
    float bx = scr[2 * b], by = scr[2 * b + 1];
    float cx = scr[2 * c], cy = scr[2 * c + 1];
    float area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
    if (std::fabs(area) < 1e-12f) continue;
    int64_t x0 = std::max<int64_t>(0, (int64_t)std::floor(std::min({ax, bx, cx})));
    int64_t x1 = std::min<int64_t>(width - 1, (int64_t)std::ceil(std::max({ax, bx, cx})));
    int64_t y0 = std::max<int64_t>(0, (int64_t)std::floor(std::min({ay, by, cy})));
    int64_t y1 = std::min<int64_t>(height - 1, (int64_t)std::ceil(std::max({ay, by, cy})));
    if (x0 > x1 || y0 > y1) continue;

    // per-vertex shade/color
    float shade[3][3];
    if (colors != nullptr) {
      const int32_t ids[3] = {a, b, c};
      for (int k = 0; k < 3; ++k)
        for (int ch = 0; ch < 3; ++ch)
          shade[k][ch] = (float)colors[3 * ids[k] + ch];
    } else {
      // camera-space face normal, double-sided Lambert + ambient
      double ux = cam[3 * b] - cam[3 * a], uy = cam[3 * b + 1] - cam[3 * a + 1],
             uz = cam[3 * b + 2] - cam[3 * a + 2];
      double vx = cam[3 * c] - cam[3 * a], vy = cam[3 * c + 1] - cam[3 * a + 1],
             vz = cam[3 * c + 2] - cam[3 * a + 2];
      double nx2 = uy * vz - uz * vy, ny2 = uz * vx - ux * vz,
             nz2 = ux * vy - uy * vx;
      double nn = std::sqrt(nx2 * nx2 + ny2 * ny2 + nz2 * nz2) + 1e-12;
      double lam = std::fabs((nx2 * light[0] + ny2 * light[1] + nz2 * light[2]) / nn);
      double v = 255.0 * (0.25 + 0.75 * lam);
      for (int k = 0; k < 3; ++k) {
        shade[k][0] = (float)(v * 0.82);
        shade[k][1] = (float)(v * 0.85);
        shade[k][2] = (float)(v * 0.90);
      }
    }

    float inv_area = 1.0f / area;
    float iza = 1.0f / za, izb = 1.0f / zb, izc = 1.0f / zc2;
    for (int64_t py = y0; py <= y1; ++py) {
      for (int64_t px = x0; px <= x1; ++px) {
        float fx2 = (float)px + 0.5f, fy2 = (float)py + 0.5f;
        float w0 = ((bx - fx2) * (cy - fy2) - (by - fy2) * (cx - fx2)) * inv_area;
        float w1 = ((cx - fx2) * (ay - fy2) - (cy - fy2) * (ax - fx2)) * inv_area;
        float w2 = 1.0f - w0 - w1;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        // perspective-correct depth (1/z interpolates linearly in screen)
        float iz = w0 * iza + w1 * izb + w2 * izc;
        float depth = 1.0f / std::max(1e-12f, iz);
        size_t pix = (size_t)(py * width + px);
        if (depth >= zbuf[pix]) continue;
        zbuf[pix] = depth;
        float c0 = (w0 * shade[0][0] * iza + w1 * shade[1][0] * izb +
                    w2 * shade[2][0] * izc) * depth;
        float c1 = (w0 * shade[0][1] * iza + w1 * shade[1][1] * izb +
                    w2 * shade[2][1] * izc) * depth;
        float c2 = (w0 * shade[0][2] * iza + w1 * shade[1][2] * izb +
                    w2 * shade[2][2] * izc) * depth;
        out_rgb[3 * pix] = (uint8_t)std::min(255.0f, std::max(0.0f, c0));
        out_rgb[3 * pix + 1] = (uint8_t)std::min(255.0f, std::max(0.0f, c1));
        out_rgb[3 * pix + 2] = (uint8_t)std::min(255.0f, std::max(0.0f, c2));
      }
    }
  }
}

// point-cloud variant: splats each point as a small screen-space square
// (reference renders .npy files as trimesh.PointCloud scenes)
void render_points(const float* verts, int64_t nv, const uint8_t* colors,
                   const double* view, int64_t width, int64_t height,
                   double fov_deg, int64_t splat, uint8_t* out_rgb) {
  if (nv == 0 || width <= 0 || height <= 0) return;
  const double f = 0.5 * (double)height / std::tan(0.5 * fov_deg * M_PI / 180.0);
  std::vector<float> zbuf((size_t)(width * height),
                          std::numeric_limits<float>::infinity());
  for (int64_t i = 0; i < nv; ++i) {
    double x = verts[3 * i], y = verts[3 * i + 1], z = verts[3 * i + 2];
    double cx = view[0] * x + view[1] * y + view[2] * z + view[3];
    double cy = view[4] * x + view[5] * y + view[6] * z + view[7];
    double cz = view[8] * x + view[9] * y + view[10] * z + view[11];
    double zc = -cz;
    if (zc <= 1e-6) continue;
    int64_t px = (int64_t)(0.5 * width + f * cx / zc);
    int64_t py = (int64_t)(0.5 * height - f * cy / zc);
    uint8_t r = 60, g = 90, b2 = 180;
    if (colors != nullptr) {
      r = colors[3 * i];
      g = colors[3 * i + 1];
      b2 = colors[3 * i + 2];
    }
    for (int64_t dy = -splat; dy <= splat; ++dy)
      for (int64_t dx = -splat; dx <= splat; ++dx) {
        int64_t qx = px + dx, qy = py + dy;
        if (qx < 0 || qy < 0 || qx >= width || qy >= height) continue;
        size_t pix = (size_t)(qy * width + qx);
        if ((float)zc >= zbuf[pix]) continue;
        zbuf[pix] = (float)zc;
        out_rgb[3 * pix] = r;
        out_rgb[3 * pix + 1] = g;
        out_rgb[3 * pix + 2] = b2;
      }
  }
}

}  // extern "C"
