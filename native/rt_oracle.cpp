// Native strict-semantics oracle renderer.
//
// An independent C++ implementation of the reference tracer's observable
// semantics (raytracer.h:410-636 and callees, including its quirks — see
// raytpu/oracle.py's module docstring for the full derivation), written as a
// recursion with a stack budget rather than the reference's explicit stack
// machine.  It exists to cross-validate the Python oracles from a second
// toolchain and to serve as the fast CPU golden-renderer (the role
// raytracer.h's CPU path plays in the reference's own test strategy,
// README.md:4).
//
// Scene layout matches raytpu/kernels/trace_pallas.py's packed tables:
//   spheres: 12 rows * n  [px py pz rad mr mg mb gr gg gb opacity ior]
//   lights:   6 rows * l  [px py pz cr cg cb]
//   bg:       5 floats    [matte_r matte_g matte_b ior opacity]
//
// Build: g++ -O2 -shared -fPIC -o libraytpu_oracle.so rt_oracle.cpp
// (no -ffast-math: NaN propagation and rounding are part of the contract).

#include <cmath>
#include <cstdint>

namespace {

constexpr float kRayEps = 1e-5f;       // raytracer.h:86
constexpr float kContainEps = 1e-6f;   // raytracer.h:252
constexpr float kFresnelEps = 1e-6f;   // raytracer.h:376
constexpr float kMaxDist = 1000.0f;    // raytracer.h:156
constexpr float kBigT = 10000.0f;      // raytracer.h:119
constexpr float kMinSig = 1e-3f;       // raytracer.h:236
constexpr float kShift = 0.01f;        // raytracer.h:688/:831
constexpr float kTol = 1e-3f;          // algebra.h:10

struct V3 {
  float x, y, z;
};

inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 operator*(float s, V3 a) { return {s * a.x, s * a.y, s * a.z}; }
inline V3 hadamard(V3 a, V3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }

// FMA-contraction experiment (BASELINE.md golden-residual study): a GPU
// compiler may contract mul+add chains in raytrace_kernel.cl into fused
// multiply-adds.  g_fma_mask switches the plausible contraction sites on so
// the byte-exact fraction vs testPPM.ppm can be measured per hypothesis:
//   bit 0: dot products fma-chained (vdot, raytrace_kernel.cl:96-100)
//   bit 1: quadratic radicands b*b - 4ac as fma (raytrace_kernel.cl:170)
//   bit 2: c = |disp|^2 - r^2 as fma (raytrace_kernel.cl:167)
//   bit 3: Fresnel numerator n1 c1 - n2 c2 as fma (:409-411)
//   bit 4: point = origin + t*dir / probe shifts as per-component fma
static int g_fma_mask = 0;

// Division/sqrt-precision experiment (the residual study's second half):
// OpenCL on pre-IEEE-strict consumer GPUs only guarantees <= 2.5/3 ulp for
// float '/' and sqrt, and the common lowerings are reciprocal-multiply and
// rsqrt-multiply.  g_approx_mask switches those lowerings (and 1-ulp
// sensitivity probes) on at the per-bounce division/sqrt sites: unit(),
// sphereRoot's sqrt + two quotients, the matte 1/dist^2, the float Fresnel
// quotient, refractAt's ratio / 1-1/ratio^2 / both sqrts (the double-sqrt
// s1 keeps its pinned semantics but its float result takes the nudges).
// Deliberately excluded: the camera-plane constants (xstep/ystep/aspect/
// sub) — per-frame constants every work-item computes identically, so a
// nudge there shifts all primary rays uniformly and probes nothing about
// per-pixel rounding.
//   bit 0: a/b      -> a * (1.0f/b)        (reciprocal-multiply)
//   bit 1: sqrt(x)  -> x * (1.0f/sqrt(x))  (rsqrt-multiply; 0 stays 0)
//   bit 2: quotients nudged 1 ulp up      (sensitivity probe)
//   bit 3: quotients nudged 1 ulp down
//   bit 4: sqrts nudged 1 ulp up
//   bit 5: sqrts nudged 1 ulp down
static int g_approx_mask = 0;

inline float fdiv(float a, float b) {
  float q = (g_approx_mask & 1) ? a * (1.0f / b) : a / b;
  if (g_approx_mask & 4) q = std::nextafterf(q, INFINITY);
  if (g_approx_mask & 8) q = std::nextafterf(q, -INFINITY);
  return q;
}

inline float nudgeSqrt(float r) {
  if (g_approx_mask & 16) r = std::nextafterf(r, INFINITY);
  if (g_approx_mask & 32) r = std::nextafterf(r, -INFINITY);
  return r;
}

inline float fsqrt(float x) {
  float r = ((g_approx_mask & 2) && x > 0.0f) ? x * (1.0f / std::sqrt(x))
                                              : std::sqrt(x);
  return nudgeSqrt(r);
}

inline float dot(V3 a, V3 b) {
  if (g_fma_mask & 1)
    return std::fma(a.z, b.z, std::fma(a.y, b.y, a.x * b.x));
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

inline V3 madd(float t, V3 d, V3 o) {  // o + t*d, optionally contracted
  if (g_fma_mask & 16)
    return {std::fma(t, d.x, o.x), std::fma(t, d.y, o.y),
            std::fma(t, d.z, o.z)};
  return o + t * d;
}
inline V3 unit(V3 a) {
  float inv = fdiv(1.0f, fsqrt(dot(a, a)));
  return inv * a;
}

struct Medium {
  V3 matte;
  float ior;
  float opacity;
};

struct SceneView {
  const float* sph;  // 12 * n
  int n;
  const float* lgt;  // 6 * l
  int l;
  Medium bg;

  V3 centre(int i) const { return {sph[i], sph[n + i], sph[2 * n + i]}; }
  float radius(int i) const { return sph[3 * n + i]; }
  V3 matte(int i) const { return {sph[4 * n + i], sph[5 * n + i], sph[6 * n + i]}; }
  V3 gloss(int i) const { return {sph[7 * n + i], sph[8 * n + i], sph[9 * n + i]}; }
  float opacity(int i) const { return sph[10 * n + i]; }
  float ior(int i) const { return sph[11 * n + i]; }
  V3 lightPos(int k) const { return {lgt[k], lgt[l + k], lgt[2 * l + k]}; }
  V3 lightCol(int k) const { return {lgt[3 * l + k], lgt[4 * l + k], lgt[5 * l + k]}; }
};

bool significant(V3 c) {
  // NaN channels compare false, exactly like the C >= (raytracer.h:238-240).
  return c.x >= kMinSig || c.y >= kMinSig || c.z >= kMinSig;
}

// Smallest quadratic root > kRayEps for |o + t d - c| = r, else kBigT.
float sphereRoot(V3 o, V3 d, V3 c, float r, bool* ok) {
  V3 disp = o - c;
  float a = dot(d, d);
  float b = 2.0f * dot(d, disp);
  float cc = (g_fma_mask & 4) ? std::fma(-r, r, dot(disp, disp))
                              : dot(disp, disp) - r * r;
  float radicand = (g_fma_mask & 2) ? std::fma(b, b, -(4.0f * a * cc))
                                    : b * b - 4.0f * a * cc;
  float best = kBigT;
  if (radicand >= 0.0f) {
    float root = fsqrt(radicand);
    float den = 2.0f * a;
    float u0 = fdiv(-b + root, den);
    float u1 = fdiv(-b - root, den);
    if (u0 > kRayEps && u0 < best) best = u0;
    if (u1 > kRayEps && u1 < best) best = u1;
  }
  *ok = best < kBigT;
  return best;
}

struct HitInfo {
  bool found = false;
  int index = -1;
  float t = kMaxDist;
  V3 point{}, normal{};
  float sqDist = 0.0f;
};

HitInfo closestHit(const SceneView& s, V3 o, V3 d) {
  HitInfo h;
  float minT = kMaxDist;
  for (int i = 0; i < s.n; ++i) {
    bool ok;
    float t = sphereRoot(o, d, s.centre(i), s.radius(i), &ok);
    if (ok && t < minT) {
      minT = t;
      h.found = true;
      h.index = i;
    }
  }
  if (h.found) {
    h.t = minT;
    h.point = madd(minT, d, o);
    h.normal = unit(h.point - s.centre(h.index));
    V3 seg = minT * d;
    h.sqDist = dot(seg, seg);
  }
  return h;
}

bool lineOfSightClear(const SceneView& s, V3 a, V3 b) {
  V3 gapVec = b - a;
  float gap = dot(gapVec, gapVec);
  HitInfo h = closestHit(s, a, unit(gapVec));
  return !(h.found && h.sqDist < gap);
}

V3 matteLightSum(const SceneView& s, V3 point, V3 normal) {
  V3 total{0, 0, 0};
  for (int k = 0; k < s.l; ++k) {
    V3 lp = s.lightPos(k);
    if (!lineOfSightClear(s, point, lp)) continue;
    V3 toLight = lp - point;
    float incidence = dot(normal, unit(toLight));
    if (incidence > 0.0f) {
      float w = fdiv(incidence, dot(toLight, toLight));
      total = total + w * s.lightCol(k);
    }
  }
  return total;
}

int containerOf(const SceneView& s, V3 p) {
  for (int i = 0; i < s.n; ++i) {
    float r = s.radius(i) + kContainEps;
    V3 d = p - s.centre(i);
    if (dot(d, d) <= r * r) return i;
  }
  return -1;
}

float fresnelTerm(float n1, float n2, float c1, float c2, bool wide) {
  float left = n1 * c1;
  float right = n2 * c2;
  if (wide) {
    // CPU-build semantics: double intermediates (raytracer.h:380-384).
    double num = static_cast<double>(left - right);
    double den = static_cast<double>(left + right);
    den *= den;
    if (den < kFresnelEps) return 1.0f;
    float refl = static_cast<float>(num * num / den);
    return refl > 1.0f ? 1.0f : refl;
  }
  float num = (g_fma_mask & 8) ? std::fma(n1, c1, -right) : left - right;
  float den = (left + right) * (left + right);
  if (den < kFresnelEps) return 1.0f;
  float refl = fdiv(num * num, den);
  return refl > 1.0f ? 1.0f : refl;  // NaN stays NaN, as in the C cap
}

struct Refraction {
  V3 dir;
  float factor;  // NaN under TIR — the reference's fall-through bug
  Medium target;
};

Refraction refractAt(const SceneView& s, V3 point, V3 normal, V3 d,
                     float mediumIor, bool wideFresnel) {
  float c1raw = dot(d, normal);
  float c1 = c1raw, s1;
  if (c1raw <= -1.0f) {
    c1 = -1.0f;
    s1 = 0.0f;
  } else if (c1raw >= 1.0f) {
    c1 = 1.0f;
    s1 = 0.0f;
  } else {
    // Double-sqrt semantics pinned (raytracer.h:663-684); the float
    // result still responds to the 1-ulp sensitivity probes.
    s1 = nudgeSqrt(static_cast<float>(
        std::sqrt(1.0 - static_cast<double>(c1 * c1))));
  }

  V3 probe = madd(kShift, d, point);
  int inside = containerOf(s, probe);
  Refraction r;
  if (inside >= 0) {
    r.target = {s.matte(inside), s.ior(inside), s.opacity(inside)};
  } else {
    r.target = {{0, 0, 0}, 1.0f, s.bg.opacity};
  }

  float ratio = fdiv(mediumIor, r.target.ior);
  float s2 = ratio * s1;

  // Direction k solving k^2 + 2 c1 k + (1 - 1/ratio^2) = 0, picking the
  // root whose bent direction best aligns with the incident one; the
  // radicand's |.| < 1e-3 collapse and the -0.1 alignment floor are the
  // reference's (algebra.h:45, raytracer.h:750-771).  A negative radicand
  // (TIR) gives NaN roots that never beat the floor, leaving dir = 0.
  float qb = 2.0f * c1;
  float qc = 1.0f - fdiv(1.0f, ratio * ratio);
  float radicand = (g_fma_mask & 2) ? std::fma(qb, qb, -(4.0f * qc))
                                    : qb * qb - 4.0f * qc;
  float roots[2];
  int nroots;
  if (std::fabs(radicand) < kTol) {
    roots[0] = -qb * 0.5f;
    nroots = 1;
  } else {
    float root = fsqrt(radicand);
    roots[0] = (-qb + root) * 0.5f;
    roots[1] = (-qb - root) * 0.5f;
    nroots = 2;
  }
  float bestAlign = -0.1f;
  r.dir = {0, 0, 0};
  for (int i = 0; i < nroots; ++i) {
    V3 cand = d + roots[i] * normal;
    float align = dot(d, cand);
    if (align > bestAlign) {
      bestAlign = align;
      r.dir = cand;
    }
  }

  float c2 = fsqrt(1.0f - s2 * s2);  // NaN when |s2| > 1
  if (c1 < 0.0f) c2 = -c2;
  float rs = fresnelTerm(mediumIor, r.target.ior, c1, c2, wideFresnel);
  float rp = fresnelTerm(mediumIor, r.target.ior, c2, c1, wideFresnel);
  r.factor = static_cast<float>((rs + rp) * 0.5);
  return r;
}

// The stack machine as recursion with a budget: `anc` is the number of
// ancestor resume-frames the reference would have on its stack.  At
// anc == cap-1 both child pushes are silently dropped and the colourSum
// protocol double-counts the node's own emission (2m, or 4m when its
// reflection colour passes the significance test); a hit with insignificant
// intensity returns the caller's running partial colour.
V3 trace(const SceneView& s, V3 o, V3 d, V3 intensity, const Medium& medium,
         int anc, V3 parentPartial, int cap, bool wideFresnel) {
  HitInfo hit = closestHit(s, o, d);
  if (!hit.found) return hadamard(intensity, medium.matte);
  if (!significant(intensity)) return parentPartial;

  float opacity = s.opacity(hit.index);
  float transparency = 1.0f - opacity;

  V3 m{0, 0, 0};
  if (opacity > 0.0f) {
    V3 term = hadamard(intensity, s.matte(hit.index));
    term = opacity * term;
    m = hadamard(matteLightSum(s, hit.point, hit.normal), term);
  }
  if (!(transparency > 0.0f)) return m;

  V3 refrIntensity = transparency * intensity;
  Refraction rf = refractAt(s, hit.point, hit.normal, d, medium.ior,
                            wideFresnel);

  float prod = transparency * rf.factor;
  V3 reflCol = {prod, prod, prod};
  reflCol = reflCol + medium.opacity * s.gloss(hit.index);
  reflCol = hadamard(intensity, reflCol);
  bool reflSig = significant(reflCol);

  if (anc >= cap - 1) {
    V3 twoM = m + m;
    return reflSig ? twoM + twoM : twoM;
  }

  V3 childI = (1.0f - rf.factor) * refrIntensity;
  V3 c = m + trace(s, hit.point, rf.dir, childI, rf.target, anc + 1, m, cap,
                   wideFresnel);

  if (reflSig) {
    float perp = 2.0f * dot(d, hit.normal);
    V3 rd = unit(d - perp * hit.normal);
    V3 ro = madd(kShift, rd, hit.point);
    c = c + trace(s, ro, rd, reflCol, medium, anc + 1, c, cap, wideFresnel);
  }
  return c;
}

}  // namespace

extern "C" {

// Select the FMA-contraction sites for the golden-residual experiment.
void rt_set_fma_mask(int mask) { g_fma_mask = mask; }
void rt_set_approx_mask(int mask) { g_approx_mask = mask; }

// Render `count` pixels starting at flat id `offset` of a width x height
// frame with the reference camera model (raytrace_kernel.cl:908-952).
// world_w/world_h are the image-plane world dimensions (the reference
// hard-codes 16x12 in-kernel, raytrace_kernel.cl:910-911; configurable here
// to match RenderConfig.image_world_width/height).
void rt_render(const float* spheres, int n_spheres, const float* lights,
               int n_lights, const float* bg, int width, int height,
               float zoom, float world_w, float world_h, int alias,
               int stack_cap, int wide_fresnel,
               int64_t offset, int64_t count, float* out) {
  SceneView s{spheres, n_spheres, lights, n_lights,
              {{bg[0], bg[1], bg[2]}, bg[3], bg[4]}};

  const float xstep = world_w / static_cast<float>(width);
  const float ystep = world_h / static_cast<float>(height);
  const float aspect = world_w / world_h;
  const float sub = xstep / static_cast<float>(alias);
  const float weight = 1.0f / static_cast<float>(alias * alias);

#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t idx = 0; idx < count; ++idx) {
    int64_t gid = offset + idx;
    float px = (static_cast<float>(gid % width) -
                static_cast<float>(width) * 0.5f) * xstep;
    float py = (static_cast<float>(height) * 0.5f -
                static_cast<float>(gid / width)) * ystep;
    V3 colour{0, 0, 0};
    for (int i = 0; i < alias; ++i) {
      for (int j = 0; j < alias; ++j) {
        float x = (px + static_cast<float>(j) * sub) * aspect;
        float y = py + static_cast<float>(i) * sub;
        V3 dir = unit({x, y, zoom});
        V3 sample = trace(s, {0, 0, 0}, dir, {1, 1, 1},
                          s.bg, 0, {0, 0, 0}, stack_cap, wide_fresnel != 0);
        colour = colour + weight * sample;
      }
    }
    out[3 * idx] = colour.x;
    out[3 * idx + 1] = colour.y;
    out[3 * idx + 2] = colour.z;
  }
}

}  // extern "C"
