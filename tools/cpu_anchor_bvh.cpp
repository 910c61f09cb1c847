// CPU anchor for the accelerated-scene bench (VERDICT r3 task 3): a
// multithreaded C++ path tracer over the SAME 327k-triangle blob scene as
// bench.py's bvh sub-bench, with a binned-SAH BVH — the reference
// (ekarpp/lumo) cost profile for bunny/bistro-class scenes.
//
// Deliberately favourable to the CPU (same doctrine as cpu_anchor.cpp):
//   - double precision like the reference (Float = f64, lib.rs:55)
//   - binned SAH BVH (16 bins, leaf <= 4, reference bvh/node.rs:74-143
//     class), Moller-Trumbore instead of the costlier Woop watertight
//   - Lambertian-only shading (no microfacet/Fresnel work at all; the
//     TPU bench shades a rough conductor)
//   - path trace, NEE with power-2 MIS per bounce, RR after depth 5,
//     hard cap 64 — the bench integrator's control flow
//   - one occlusion query per shadow ray
//   - std::thread over rows, 4 threads (reference default)
//
// Ray accounting matches bench.py: 2 rays per traced bounce.
// Input: scene binary from tools/export_bvh_scene.py.
// Build:  g++ -O3 -march=native -std=c++17 -o /tmp/cpu_anchor_bvh \
//             tools/cpu_anchor_bvh.cpp -lpthread
// Run:    /tmp/cpu_anchor_bvh /tmp/blob_scene.bin [threads]
#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

typedef double F;

struct V3 {
  F x, y, z;
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator*(F s) const { return {x * s, y * s, z * s}; }
};
static inline F dot(const V3& a, const V3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
static inline V3 norm(const V3& a) { return a * (1.0 / std::sqrt(dot(a, a))); }
static inline V3 vmin(const V3& a, const V3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(const V3& a, const V3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Rng {  // xorshiftr128+ (reference rng.rs:51-63)
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    s0 = seed ^ 0x9e3779b97f4a7c15ull;
    s1 = (seed << 1) | 1;
    for (int i = 0; i < 8; i++) next();
  }
  uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    x ^= x >> 17;
    x ^= y;
    s1 = x + y;
    return x;
  }
  F uf() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

// ----- scene -----
static int NT = 0, NL = 0;
static std::vector<V3> A, B, C, Ng;
static std::vector<uint8_t> Emit;
static std::vector<int> Lights;
static F LightArea = 0;

// ----- BVH: binned SAH, leaf <= 4, flattened, left = self+1 -----
struct Node {
  V3 lo, hi;
  int right;   // interior: right child index
  int first;   // leaf: first prim
  int count;   // leaf: prim count (0 = interior)
};
static std::vector<Node> Nodes;
static std::vector<int> PrimIdx;

struct BRef {
  V3 lo, hi, cen;
  int id;
};

static int build_rec(std::vector<BRef>& refs, int lo, int hi,
                     std::vector<Node>& out) {
  Node n;
  n.lo = {1e30, 1e30, 1e30};
  n.hi = {-1e30, -1e30, -1e30};
  for (int i = lo; i < hi; i++) {
    n.lo = vmin(n.lo, refs[i].lo);
    n.hi = vmax(n.hi, refs[i].hi);
  }
  int slot = (int)out.size();
  out.push_back(n);
  int cnt = hi - lo;
  if (cnt <= 4) {
    out[slot].count = cnt;
    out[slot].first = lo;
    out[slot].right = 0;
    return slot;
  }
  // binned SAH over the widest centroid axis (16 bins)
  V3 clo = {1e30, 1e30, 1e30}, chi = {-1e30, -1e30, -1e30};
  for (int i = lo; i < hi; i++) {
    clo = vmin(clo, refs[i].cen);
    chi = vmax(chi, refs[i].cen);
  }
  V3 ext = chi - clo;
  int ax = ext.x > ext.y ? (ext.x > ext.z ? 0 : 2) : (ext.y > ext.z ? 1 : 2);
  F cmin = ax == 0 ? clo.x : ax == 1 ? clo.y : clo.z;
  F cext = ax == 0 ? ext.x : ax == 1 ? ext.y : ext.z;
  int mid;
  if (cext < 1e-12) {
    mid = (lo + hi) / 2;
  } else {
    const int NB = 16;
    int bc[NB] = {0};
    V3 blo[NB], bhi[NB];
    for (int b = 0; b < NB; b++) {
      blo[b] = {1e30, 1e30, 1e30};
      bhi[b] = {-1e30, -1e30, -1e30};
    }
    auto bin_of = [&](const BRef& r) {
      F c = ax == 0 ? r.cen.x : ax == 1 ? r.cen.y : r.cen.z;
      int b = (int)((c - cmin) / cext * NB);
      return std::min(std::max(b, 0), NB - 1);
    };
    for (int i = lo; i < hi; i++) {
      int b = bin_of(refs[i]);
      bc[b]++;
      blo[b] = vmin(blo[b], refs[i].lo);
      bhi[b] = vmax(bhi[b], refs[i].hi);
    }
    auto area = [](const V3& l, const V3& h) {
      V3 d = h - l;
      if (d.x < 0) return (F)0;
      return 2.0 * (d.x * d.y + d.y * d.z + d.z * d.x);
    };
    F best = 1e30;
    int bsplit = -1;
    for (int s = 1; s < NB; s++) {
      V3 llo = {1e30, 1e30, 1e30}, lhi = {-1e30, -1e30, -1e30};
      V3 rlo = {1e30, 1e30, 1e30}, rhi = {-1e30, -1e30, -1e30};
      int lc = 0, rc = 0;
      for (int b = 0; b < s; b++)
        if (bc[b]) {
          llo = vmin(llo, blo[b]);
          lhi = vmax(lhi, bhi[b]);
          lc += bc[b];
        }
      for (int b = s; b < NB; b++)
        if (bc[b]) {
          rlo = vmin(rlo, blo[b]);
          rhi = vmax(rhi, bhi[b]);
          rc += bc[b];
        }
      if (!lc || !rc) continue;
      F cost = area(llo, lhi) * lc + area(rlo, rhi) * rc;
      if (cost < best) {
        best = cost;
        bsplit = s;
      }
    }
    if (bsplit < 0) {
      mid = (lo + hi) / 2;
    } else {
      auto it = std::partition(refs.begin() + lo, refs.begin() + hi,
                               [&](const BRef& r) {
                                 return bin_of(r) < bsplit;
                               });
      mid = (int)(it - refs.begin());
      if (mid == lo || mid == hi) mid = (lo + hi) / 2;
    }
  }
  out[slot].count = 0;
  build_rec(refs, lo, mid, out);           // left = slot + 1
  out[slot].right = build_rec(refs, mid, hi, out);
  return slot;
}

static void build_bvh() {
  std::vector<BRef> refs(NT);
  for (int i = 0; i < NT; i++) {
    BRef r;
    r.lo = vmin(vmin(A[i], B[i]), C[i]);
    r.hi = vmax(vmax(A[i], B[i]), C[i]);
    r.cen = (r.lo + r.hi) * 0.5;
    r.id = i;
    refs[i] = r;
  }
  Nodes.reserve(2 * NT);
  build_rec(refs, 0, NT, Nodes);
  PrimIdx.resize(NT);
  for (int i = 0; i < NT; i++) PrimIdx[i] = refs[i].id;
}

// Moller-Trumbore
static inline bool tri_hit(int id, const V3& o, const V3& d, F tmax, F& t) {
  V3 e1 = B[id] - A[id], e2 = C[id] - A[id];
  V3 p = cross(d, e2);
  F det = dot(e1, p);
  if (std::fabs(det) < 1e-12) return false;
  F inv = 1.0 / det;
  V3 tv = o - A[id];
  F u = dot(tv, p) * inv;
  if (u < 0 || u > 1) return false;
  V3 q = cross(tv, e1);
  F v = dot(d, q) * inv;
  if (v < 0 || u + v > 1) return false;
  F tt = dot(e2, q) * inv;
  if (tt <= 1e-7 || tt >= tmax) return false;
  t = tt;
  return true;
}

template <bool ANY>
static inline int bvh_hit(const V3& o, const V3& d, F tmax, F& t_out) {
  V3 inv = {1.0 / (std::fabs(d.x) < 1e-30 ? 1e-30 : d.x),
            1.0 / (std::fabs(d.y) < 1e-30 ? 1e-30 : d.y),
            1.0 / (std::fabs(d.z) < 1e-30 ? 1e-30 : d.z)};
  int stack[64];
  int sp = 0;
  stack[sp++] = 0;
  F best = tmax;
  int hit = -1;
  while (sp) {
    const Node& n = Nodes[stack[--sp]];
    F t0x = (n.lo.x - o.x) * inv.x, t1x = (n.hi.x - o.x) * inv.x;
    F t0y = (n.lo.y - o.y) * inv.y, t1y = (n.hi.y - o.y) * inv.y;
    F t0z = (n.lo.z - o.z) * inv.z, t1z = (n.hi.z - o.z) * inv.z;
    F tn = std::max(std::max(std::min(t0x, t1x), std::min(t0y, t1y)),
                    std::min(t0z, t1z));
    F tf = std::min(std::min(std::max(t0x, t1x), std::max(t0y, t1y)),
                    std::max(t0z, t1z));
    if (tn > tf || tf <= 0 || tn >= best) continue;
    if (n.count) {
      for (int i = 0; i < n.count; i++) {
        int id = PrimIdx[n.first + i];
        F t;
        if (tri_hit(id, o, d, best, t)) {
          best = t;
          hit = id;
          if (ANY) return id;
        }
      }
    } else {
      int slot = (int)(&n - Nodes.data());
      stack[sp++] = n.right;
      stack[sp++] = slot + 1;
    }
  }
  t_out = best;
  return hit;
}

static const int W = 256, H = 256, SPP = 8;
static const int RR_DEPTH = 5, MAX_DEPTH = 64;

struct Result {
  uint64_t rays = 0;
  F sum = 0;
};

static void render_rows(int y0, int y1, uint64_t seed, Result* res) {
  Rng rng(seed);
  // camera matching lumo_tpu.camera.build_camera(resolution=(256,256)):
  // origin, looking -z, 90deg vfov, raster y down (unit-scale box scene)
  V3 cam = {0, 0, 0};
  uint64_t rays = 0;
  F acc = 0;
  for (int y = y0; y < y1; y++) {
    for (int x = 0; x < W; x++) {
      for (int s = 0; s < SPP; s++) {
        F u = 2.0 * (x + rng.uf()) / W - 1.0;
        F v = 2.0 * (y + rng.uf()) / H - 1.0;
        V3 d = norm({u, -v, -1.0});
        V3 o = cam;
        F throughput = 1.0, radiance = 0.0;
        bool last_spec = true;
        for (int depth = 0; depth < MAX_DEPTH; depth++) {
          F t;
          int id = bvh_hit<false>(o, d, 1e30, t);
          rays++;
          if (id < 0) break;
          V3 p = o + d * t;
          V3 n = Ng[id];
          if (dot(n, d) > 0) n = n * -1.0;
          if (Emit[id]) {
            if (last_spec) radiance += throughput * 15.0;
            break;
          }
          // NEE: sample a light triangle point
          int li = Lights[(int)(rng.uf() * NL) % NL];
          F su = rng.uf(), sv = rng.uf();
          if (su + sv > 1) {
            su = 1 - su;
            sv = 1 - sv;
          }
          V3 lp = A[li] + (B[li] - A[li]) * su + (C[li] - A[li]) * sv;
          V3 ln = Ng[li];
          V3 wi = lp - p;
          F d2 = dot(wi, wi);
          F dist = std::sqrt(d2);
          wi = wi * (1.0 / dist);
          F cos_s = dot(n, wi), cos_l = -dot(ln, wi);
          if (cos_l < 0) cos_l = dot(ln, wi);
          if (cos_s > 0 && cos_l > 1e-6) {
            F tocc;
            int occ = bvh_hit<true>(p + wi * 1e-3, wi, dist - 2e-3, tocc);
            rays++;
            if (occ < 0) {
              F pdf_a = d2 / (cos_l * LightArea);
              F pdf_b = cos_s / M_PI;
              F w = pdf_a * pdf_a / (pdf_a * pdf_a + pdf_b * pdf_b);
              radiance += throughput * 0.7 / M_PI * cos_s * 15.0 * w / pdf_a;
            }
          }
          // cosine bounce
          F u1 = rng.uf(), u2 = rng.uf();
          F r = std::sqrt(u1), phi = 2 * M_PI * u2;
          V3 tx = norm(std::fabs(n.x) > 0.9 ? cross(n, {0, 1, 0})
                                            : cross(n, {1, 0, 0}));
          V3 ty = cross(n, tx);
          V3 nd = norm(tx * (r * std::cos(phi)) + ty * (r * std::sin(phi)) +
                       n * std::sqrt(1 - u1));
          throughput *= 0.7;
          last_spec = false;
          o = p + nd * 1e-3;
          d = nd;
          if (depth >= RR_DEPTH) {
            F q = std::min(throughput, 0.95);
            if (rng.uf() > q) break;
            throughput /= q;
          }
        }
        acc += radiance;
      }
    }
  }
  res->rays = rays;
  res->sum = acc;
}

int main(int argc, char** argv) {
  const char* path = argc > 1 ? argv[1] : "/tmp/blob_scene.bin";
  int threads = argc > 2 ? std::atoi(argv[2]) : 4;
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    return 1;
  }
  int hdr[2];
  if (std::fread(hdr, 4, 2, f) != 2) return 1;
  NT = hdr[0];
  std::vector<float> raw((size_t)NT * 9);
  if (std::fread(raw.data(), 4, raw.size(), f) != raw.size()) return 1;
  Emit.resize(NT);
  if (std::fread(Emit.data(), 1, NT, f) != (size_t)NT) return 1;
  std::fclose(f);
  A.resize(NT);
  B.resize(NT);
  C.resize(NT);
  Ng.resize(NT);
  for (int i = 0; i < NT; i++) {
    A[i] = {raw[i * 9 + 0], raw[i * 9 + 1], raw[i * 9 + 2]};
    B[i] = {raw[i * 9 + 3], raw[i * 9 + 4], raw[i * 9 + 5]};
    C[i] = {raw[i * 9 + 6], raw[i * 9 + 7], raw[i * 9 + 8]};
    Ng[i] = norm(cross(B[i] - A[i], C[i] - A[i]));
    if (Emit[i]) {
      Lights.push_back(i);
      V3 cr = cross(B[i] - A[i], C[i] - A[i]);
      LightArea += 0.5 * std::sqrt(dot(cr, cr));
    }
  }
  NL = (int)Lights.size();
  auto tb0 = std::chrono::steady_clock::now();
  build_bvh();
  F build_s = std::chrono::duration<F>(std::chrono::steady_clock::now() - tb0)
                  .count();

  auto t0 = std::chrono::steady_clock::now();
  std::vector<std::thread> pool;
  std::vector<Result> res(threads);
  int rows = (H + threads - 1) / threads;
  for (int i = 0; i < threads; i++) {
    int y0 = i * rows, y1 = std::min(H, (i + 1) * rows);
    pool.emplace_back(render_rows, y0, y1, 0x1234u + i, &res[i]);
  }
  for (auto& t : pool) t.join();
  F dt = std::chrono::duration<F>(std::chrono::steady_clock::now() - t0)
             .count();
  uint64_t rays = 0;
  F sum = 0;
  for (auto& r : res) {
    rays += r.rays;
    sum += r.sum;
  }
  std::printf(
      "{\"rays_per_s\": %.1f, \"rays\": %llu, \"secs\": %.3f, "
      "\"bvh_build_s\": %.3f, \"tris\": %d, \"nodes\": %zu, "
      "\"threads\": %d, \"checksum\": %.3f}\n",
      rays / dt, (unsigned long long)rays, dt, build_s, NT, Nodes.size(),
      threads, sum);
  return 0;
}
