// CPU anchor for vs_baseline (VERDICT r2 task 3).
//
// The reference (ekarpp/lumo) is Rust and this image has no rustc, so the
// anchor is a minimal C++ path tracer of the *same workload class* as the
// driver bench's flagship config, mirroring the reference's cost profile:
//   - double precision everywhere (reference Float = f64, lib.rs:55)
//   - Cornell box, the same published measurement spectra as the bench
//     scene (scene/cornell.py), 36 triangles
//   - 4-wavelength hero sampling (color.rs SPECTRUM_SAMPLES=4), spectra
//     evaluated by linear interpolation (DenseSpectrum semantics)
//   - path tracing, fixed depth 6 (same as bench.py DEPTH), NEE with
//     power-2 MIS at every diffuse bounce (integrator.rs:139-184)
//   - xorshiftr128+ RNG (rng.rs:51-63)
//   - brute-force triangle loop: at 36 triangles the reference's BVH is
//     2 levels deep; a flat loop is the same work without the pointer
//     chasing, i.e. a *favourable* anchor
//   - std::thread pool over image rows, default 4 threads (the
//     reference's default thread count, renderer.rs:20-21)
//
// Ray accounting matches bench.py: 2 rays per traced bounce
// (extension + shadow).  Prints one JSON line {"rays_per_s": ...}.
//
// Build + run:  g++ -O3 -march=native -std=c++17 -o /tmp/cpu_anchor \
//                   tools/cpu_anchor.cpp -lpthread && /tmp/cpu_anchor
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <atomic>
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

// xorshiftr128+ (reference rng.rs:51-63)
struct Rng {
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

// ----- measured Cornell spectra, 4nm steps 400-700 (same data as
// lumo_tpu/scene/cornell.py; Cornell UPCG published measurements)
static const int NS = 76;
static const F WHITE_S[NS] = {
    .343, .445, .551, .624, .665, .687, .708, .723, .715, .710, .745, .758,
    .739, .767, .777, .765, .751, .745, .748, .729, .745, .757, .753, .750,
    .746, .747, .735, .732, .739, .734, .725, .721, .733, .725, .732, .743,
    .744, .748, .728, .716, .733, .726, .713, .740, .754, .764, .752, .736,
    .734, .741, .740, .732, .745, .755, .751, .744, .731, .733, .744, .731,
    .712, .708, .729, .730, .727, .707, .703, .729, .750, .760, .751, .739,
    .724, .730, .740, .737};
static const F GREEN_S[NS] = {
    .092, .096, .098, .097, .098, .095, .095, .097, .095, .094, .097, .098,
    .096, .101, .103, .104, .107, .109, .112, .115, .125, .140, .160, .187,
    .229, .285, .343, .390, .435, .464, .472, .476, .481, .462, .447, .441,
    .426, .406, .373, .347, .337, .314, .285, .277, .266, .250, .230, .207,
    .186, .171, .160, .148, .141, .136, .130, .126, .123, .121, .122, .119,
    .114, .115, .117, .117, .118, .120, .122, .128, .132, .139, .144, .146,
    .150, .152, .157, .159};
static const F RED_S[NS] = {
    .040, .046, .048, .053, .049, .050, .053, .055, .057, .056, .059, .057,
    .061, .061, .060, .062, .062, .062, .061, .062, .060, .059, .057, .058,
    .058, .058, .056, .055, .056, .059, .057, .055, .059, .059, .058, .059,
    .061, .061, .063, .063, .067, .068, .072, .080, .090, .099, .124, .154,
    .192, .255, .287, .349, .402, .443, .487, .513, .558, .584, .620, .606,
    .609, .651, .612, .610, .650, .638, .627, .620, .630, .628, .642, .639,
    .657, .639, .635, .642};

static inline F eval_spec(const F* s, F lam) {
  F t = (lam - 400.0) * (1.0 / 4.0);
  if (t <= 0) return s[0];
  if (t >= NS - 1) return s[NS - 1];
  int i = (int)t;
  F f = t - i;
  return s[i] * (1 - f) + s[i + 1] * f;
}
// light: "400:0 500:8 600:15.6 700:18.4" linear interp
static inline F eval_light(F lam) {
  if (lam <= 400) return 0;
  if (lam <= 500) return (lam - 400) * 0.08;
  if (lam <= 600) return 8 + (lam - 500) * 0.076;
  if (lam <= 700) return 15.6 + (lam - 600) * 0.028;
  return 18.4;
}
// CIE Y (luminance weight) — coarse gaussian fit, used only for tone of
// RR-free loss accumulation; not perf relevant
static inline F cie_y(F lam) {
  F t = (lam - 556.1) / 46.14;
  return std::exp(-0.5 * t * t);
}

struct Tri {
  V3 a, e1, e2, n;
  int mat;  // 0 white 1 red 2 green 3 light
};
static std::vector<Tri> g_tris;

static void quad(V3 v0, V3 v1, V3 v2, V3 v3, int mat) {
  Tri t1{v0, v1 - v0, v2 - v0, norm(cross(v1 - v0, v2 - v0)), mat};
  Tri t2{v0, v2 - v0, v3 - v0, norm(cross(v2 - v0, v3 - v0)), mat};
  g_tris.push_back(t1);
  g_tris.push_back(t2);
}

static void build_scene() {
  // same vertices as scene/cornell.py (original Cornell measurement)
  quad({343, 548.8, 227}, {343, 548.8, 332}, {213, 548.8, 332},
       {213, 548.8, 227}, 3);                                      // light
  quad({552.8, 0, 0}, {0, 0, 0}, {0, 0, 559.2}, {549.6, 0, 559.2}, 0);
  quad({556, 548.8, 0}, {556, 548.8, 559.2}, {0, 548.8, 559.2},
       {0, 548.8, 0}, 0);                                          // ceil
  quad({549.6, 0, 559.2}, {0, 0, 559.2}, {0, 548.8, 559.2},
       {556, 548.8, 559.2}, 0);                                    // back
  quad({0, 0, 559.2}, {0, 0, 0}, {0, 548.8, 0}, {0, 548.8, 559.2}, 2);
  quad({552.8, 0, 0}, {549.6, 0, 559.2}, {556, 548.8, 559.2},
       {556, 548.8, 0}, 1);                                        // red
  // small box
  quad({130, 165, 65}, {82, 165, 225}, {240, 165, 272}, {290, 165, 114}, 0);
  quad({290, 0, 114}, {290, 165, 114}, {240, 165, 272}, {240, 0, 272}, 0);
  quad({130, 0, 65}, {130, 165, 65}, {290, 165, 114}, {290, 0, 114}, 0);
  quad({82, 0, 225}, {82, 165, 225}, {130, 165, 65}, {130, 0, 65}, 0);
  quad({240, 0, 272}, {240, 165, 272}, {82, 165, 225}, {82, 0, 225}, 0);
  // big box
  quad({423, 330, 247}, {265, 330, 296}, {314, 330, 456}, {472, 330, 406}, 0);
  quad({423, 0, 247}, {423, 330, 247}, {472, 330, 406}, {472, 0, 406}, 0);
  quad({472, 0, 406}, {472, 330, 406}, {314, 330, 456}, {314, 0, 456}, 0);
  quad({314, 0, 456}, {314, 330, 456}, {265, 330, 296}, {265, 0, 296}, 0);
  quad({265, 0, 296}, {265, 330, 296}, {423, 330, 247}, {423, 0, 247}, 0);
}

// Moller-Trumbore closest hit over the flat triangle list
static inline int intersect(const V3& o, const V3& d, F tmax, F* t_out) {
  int best = -1;
  F best_t = tmax;
  for (size_t i = 0; i < g_tris.size(); i++) {
    const Tri& tr = g_tris[i];
    V3 p = cross(d, tr.e2);
    F det = dot(tr.e1, p);
    if (std::fabs(det) < 1e-12) continue;
    F inv = 1.0 / det;
    V3 tv = o - tr.a;
    F u = dot(tv, p) * inv;
    if (u < 0 || u > 1) continue;
    V3 q = cross(tv, tr.e1);
    F v = dot(d, q) * inv;
    if (v < 0 || u + v > 1) continue;
    F t = dot(tr.e2, q) * inv;
    if (t > 1e-6 && t < best_t) {
      best_t = t;
      best = (int)i;
    }
  }
  *t_out = best_t;
  return best;
}

static inline bool occluded(const V3& o, const V3& d, F tmax) {
  for (size_t i = 0; i < g_tris.size(); i++) {
    const Tri& tr = g_tris[i];
    V3 p = cross(d, tr.e2);
    F det = dot(tr.e1, p);
    if (std::fabs(det) < 1e-12) continue;
    F inv = 1.0 / det;
    V3 tv = o - tr.a;
    F u = dot(tv, p) * inv;
    if (u < 0 || u > 1) continue;
    V3 q = cross(tv, tr.e1);
    F v = dot(d, q) * inv;
    if (v < 0 || u + v > 1) continue;
    F t = dot(tr.e2, q) * inv;
    if (t > 1e-6 && t < tmax) return true;
  }
  return false;
}

// light quad geometry for NEE
static const V3 L0{213, 548.79, 227};
static const F LX = 130.0, LZ = 105.0, LAREA = LX * LZ;

static inline void onb(const V3& n, V3* t, V3* b) {
  F s = n.z >= 0 ? 1.0 : -1.0;
  F a = -1.0 / (s + n.z);
  *t = {1 + s * n.x * n.x * a, s * n.x * n.y * a, -s * n.x};
  *b = {n.x * n.y * a, s + n.y * n.y * a, -n.y};
}

struct Result {
  double rays = 0, lum = 0;
};

static void render_rows(int y0, int y1, int W, int H, int spp, uint64_t seed,
                        Result* res) {
  const int DEPTH = 6;
  // camera: reference cornell preset (camera.rs:139-148): at the box
  // mouth looking +z
  V3 cam_o{278, 273, -800};
  F focal = 0.035, sw = 0.025;  // 35mm lens on 25mm sensor
  double rays = 0, lum = 0;
  for (int y = y0; y < y1; y++) {
    Rng rng(seed ^ (uint64_t)(y * 0x9e3779b9u + 1));
    for (int x = 0; x < W; x++) {
      for (int s = 0; s < spp; s++) {
        F px = (x + rng.uf()) / W - 0.5, py = (y + rng.uf()) / H - 0.5;
        V3 d = norm(V3{px * sw / focal, -py * sw / focal, 1.0});
        V3 o = cam_o;
        // 4 stratified hero wavelengths (wavelength.rs:35-53 class)
        F lam[4];
        F u0 = rng.uf();
        for (int k = 0; k < 4; k++) {
          F u = u0 + k * 0.25;
          u -= std::floor(u);
          lam[k] = 400.0 + 300.0 * u;
        }
        F thr[4] = {1, 1, 1, 1}, rad[4] = {0, 0, 0, 0};
        bool spec_last = true;
        F prev_pdf_b = 0;
        for (int depth = 0; depth < DEPTH; depth++) {
          F t;
          int hi = intersect(o, d, 1e30, &t);
          rays += 1;
          if (hi < 0) break;
          const Tri& tr = g_tris[hi];
          V3 p = o + d * t;
          V3 n = dot(tr.n, d) < 0 ? tr.n : tr.n * -1.0;
          if (tr.mat == 3) {  // light: emitter-hit MIS vs prev NEE pdf
            F w = 1.0;
            if (!spec_last) {
              F cos_l = d.y > 0 ? d.y : -d.y;
              F pdf_l = (t * t) / (cos_l * LAREA);
              w = prev_pdf_b * prev_pdf_b /
                  (prev_pdf_b * prev_pdf_b + pdf_l * pdf_l);
            }
            for (int k = 0; k < 4; k++)
              rad[k] += thr[k] * eval_light(lam[k]) * w;
            break;
          }
          const F* spec = tr.mat == 0 ? WHITE_S : (tr.mat == 1 ? RED_S
                                                               : GREEN_S);
          // --- NEE with power-2 MIS (integrator.rs:139-184)
          {
            F lu = rng.uf(), lv = rng.uf();
            V3 lp{L0.x + lu * LX, L0.y, L0.z + lv * LZ};
            V3 wl = lp - p;
            F d2 = dot(wl, wl), dist = std::sqrt(d2);
            wl = wl * (1.0 / dist);
            F cos_s = dot(n, wl), cos_l = -wl.y;  // light faces -y
            rays += 1;
            if (cos_s > 0 && cos_l > 0 &&
                !occluded(p + n * 1e-3, wl, dist - 2e-3)) {
              F pdf_l = d2 / (cos_l * LAREA);
              F pdf_b = cos_s * (1.0 / M_PI);
              F w = pdf_l * pdf_l / (pdf_l * pdf_l + pdf_b * pdf_b);
              for (int k = 0; k < 4; k++)
                rad[k] += thr[k] * eval_spec(spec, lam[k]) * (1.0 / M_PI) *
                          cos_s * eval_light(lam[k]) * w / pdf_l;
            }
          }
          // --- cosine-hemisphere bounce
          V3 tb, bb;
          onb(n, &tb, &bb);
          F r1 = rng.uf(), r2 = rng.uf();
          F rr = std::sqrt(r1), phi = 2 * M_PI * r2;
          V3 loc{rr * std::cos(phi), rr * std::sin(phi),
                 std::sqrt(std::fmax(0.0, 1 - r1))};
          V3 nd = norm(tb * loc.x + bb * loc.y + n * loc.z);
          F cos_b = dot(n, nd);
          if (cos_b <= 0) break;
          // f/pdf = albedo (cosine cancels with the cosine pdf)
          for (int k = 0; k < 4; k++) thr[k] *= eval_spec(spec, lam[k]);
          prev_pdf_b = cos_b * (1.0 / M_PI);
          o = p + n * 1e-3;
          d = nd;
          spec_last = false;
        }
        for (int k = 0; k < 4; k++) lum += rad[k] * cie_y(lam[k]) * 0.25;
      }
    }
  }
  res->rays = rays;
  res->lum = lum;
}

int main(int argc, char** argv) {
  int W = 256, H = 256, spp = 64;
  int threads = argc > 1 ? std::atoi(argv[1]) : 4;
  build_scene();
  std::vector<std::thread> pool;
  std::vector<Result> res(threads);
  auto t0 = std::chrono::steady_clock::now();
  int rows = (H + threads - 1) / threads;
  for (int i = 0; i < threads; i++) {
    int y0 = i * rows, y1 = std::min(H, y0 + rows);
    pool.emplace_back(render_rows, y0, y1, W, H, spp, 42ull, &res[i]);
  }
  double rays = 0, lum = 0;
  for (int i = 0; i < threads; i++) {
    pool[i].join();
    rays += res[i].rays;
    lum += res[i].lum;
  }
  auto t1 = std::chrono::steady_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count();
  std::printf(
      "{\"rays_per_s\": %.1f, \"rays\": %.0f, \"seconds\": %.3f, "
      "\"threads\": %d, \"mean_lum\": %.4f}\n",
      rays / dt, rays, dt, threads, lum / (W * H * spp));
  return 0;
}
