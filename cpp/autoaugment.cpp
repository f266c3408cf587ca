// AutoAugment for the native loader — the 16 reference ops + v0/imagenet
// policy tables, applied per record inside the decode thread pool.
//
// Parity target: axcnn/data/autoaugment.py is the semantics reference (it
// mirrors the upstream reference's preprocessing/autoaugment.py running
// inside tf.data's C++ map — SURVEY.md §2 item 5 / §2.9). Semantics here
// follow Pillow's C implementations so the LUT/enhance ops are BIT-EXACT
// against the PIL path (tests/test_cpp_loader.py compares both); the
// geometry ops use Pillow's half-pixel bilinear affine convention and match
// to ≤1 LSB except at fill boundaries. RNG draws happen in the same order
// as the Python reference (sub-policy index → per-op probability →
// sign/position), from the loader's per-record xoshiro stream — so a record
// is deterministic per (seed, epoch, index), like every other loader path.
//
// The policy tables are published data from Cubuk et al. (AutoAugment) —
// the same constants every implementation carries.

#include "autoaugment.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace axcnn {
namespace {

constexpr float kMaxLevel = 10.0f;
constexpr uint8_t kFill = 128;

inline uint8_t clip8(int v) { return uint8_t(std::clamp(v, 0, 255)); }

// ---------------------------------------------------------------------------
// geometry: PIL Image.transform(AFFINE, BILINEAR, fillcolor) convention.
// For output pixel (x, y): source point (sx, sy) =
//   (a*(x+.5) + b*(y+.5) + c, d*(x+.5) + e*(y+.5) + f)
// sampled bilinearly at (sx-.5, sy-.5); points outside the source box get
// the fill color (Pillow fills when the *point* leaves [0, w]x[0, h]).
// ---------------------------------------------------------------------------
void affine(uint8_t* img, int w, int h,
            double a, double b, double c, double d, double e, double f) {
  std::vector<uint8_t> src(img, img + size_t(w) * h * 3);
  for (int y = 0; y < h; ++y) {
    uint8_t* row = img + size_t(y) * w * 3;
    // source point steps by (a, d) per output column — incremental walk
    // instead of 4 multiplies per pixel (this is the AA hot loop)
    double sx = a * 0.5 + b * (y + 0.5) + c;
    double sy = d * 0.5 + e * (y + 0.5) + f;
    for (int x = 0; x < w; ++x, sx += a, sy += d) {
      uint8_t* px = row + x * 3;
      if (sx < 0.0 || sx > w || sy < 0.0 || sy > h) {
        px[0] = px[1] = px[2] = kFill;
        continue;
      }
      float fx = float(sx) - 0.5f, fy = float(sy) - 0.5f;
      int x0 = int(std::floor(fx)), y0 = int(std::floor(fy));
      float wx = fx - x0, wy = fy - y0;
      int x1 = x0 + 1, y1 = y0 + 1;
      const bool interior = x0 >= 0 && x1 < w && y0 >= 0 && y1 < h;
      if (interior) {
        const uint8_t* r0 = &src[(size_t(y0) * w + x0) * 3];
        const uint8_t* r1 = &src[(size_t(y1) * w + x0) * 3];
        for (int ch = 0; ch < 3; ++ch) {
          float top = r0[ch] * (1 - wx) + r0[3 + ch] * wx;
          float bot = r1[ch] * (1 - wx) + r1[3 + ch] * wx;
          px[ch] = clip8(int(std::lround(top * (1 - wy) + bot * wy)));
        }
      } else {
        for (int ch = 0; ch < 3; ++ch) {
          // out-of-range taps take the fill color (the sampled point is in
          // range, but its 2x2 neighborhood can stick out by one pixel)
          auto tap = [&](int xx, int yy) -> float {
            if (xx < 0 || xx >= w || yy < 0 || yy >= h) return float(kFill);
            return float(src[(size_t(yy) * w + xx) * 3 + ch]);
          };
          float top = tap(x0, y0) * (1 - wx) + tap(x1, y0) * wx;
          float bot = tap(x0, y1) * (1 - wx) + tap(x1, y1) * wx;
          px[ch] = clip8(int(std::lround(top * (1 - wy) + bot * wy)));
        }
      }
    }
  }
}

void shear_x(uint8_t* img, int w, int h, int mag, int sign) {
  double v = sign * (mag / kMaxLevel * 0.3);
  affine(img, w, h, 1, v, 0, 0, 1, 0);
}

void shear_y(uint8_t* img, int w, int h, int mag, int sign) {
  double v = sign * (mag / kMaxLevel * 0.3);
  affine(img, w, h, 1, 0, 0, v, 1, 0);
}

void translate_x(uint8_t* img, int w, int h, int mag, int sign) {
  double v = sign * (mag / kMaxLevel * 100.0);
  affine(img, w, h, 1, 0, v, 0, 1, 0);
}

void translate_y(uint8_t* img, int w, int h, int mag, int sign) {
  double v = sign * (mag / kMaxLevel * 100.0);
  affine(img, w, h, 1, 0, 0, 0, 1, v);
}

void rotate(uint8_t* img, int w, int h, int mag, int sign) {
  // PIL Image.rotate(deg): rotate about the center by `deg` CCW; implemented
  // (as in Pillow) as an affine with phi = -radians(deg % 360)
  double deg = sign * (mag / kMaxLevel * 30.0);
  deg = std::fmod(deg, 360.0);
  if (deg < 0) deg += 360.0;
  double phi = -deg * M_PI / 180.0;
  double a = std::cos(phi), b = std::sin(phi);
  double cx = w / 2.0, cy = h / 2.0;
  double c = a * (-cx) + b * (-cy) + cx;
  double f = -b * (-cx) + a * (-cy) + cy;
  affine(img, w, h, a, b, c, -b, a, f);
}

// ---------------------------------------------------------------------------
// enhance ops: out = blend(degenerate, img, factor), Pillow Blend.c semantics
// (linear interpolation for factor in [0,1]; extrapolation CLIPPED and
// TRUNCATED — (uint8)(float) cast — outside).
// ---------------------------------------------------------------------------
inline float enhance_factor(int mag) { return mag / kMaxLevel * 1.8f + 0.1f; }

void blend_from(uint8_t* img, const uint8_t* degenerate, size_t n, float alpha) {
  // Pillow Blend.c: float lerp, TRUNCATED to uint8; clipped only where
  // extrapolation (factor outside [0,1]) can leave the range — clipping
  // unconditionally is equivalent and branch-free
  for (size_t i = 0; i < n; ++i) {
    float t = float(degenerate[i]) + alpha * (float(img[i]) - float(degenerate[i]));
    img[i] = t <= 0.0f ? 0 : t >= 255.0f ? 255 : uint8_t(t);
  }
}

// PIL convert("L"): L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16
inline uint8_t lum(const uint8_t* px) {
  return uint8_t((px[0] * 19595u + px[1] * 38470u + px[2] * 7471u + 0x8000u) >> 16);
}

void op_color(uint8_t* img, int w, int h, int mag) {
  size_t npx = size_t(w) * h;
  std::vector<uint8_t> degen(npx * 3);
  for (size_t i = 0; i < npx; ++i) {
    uint8_t l = lum(img + i * 3);
    degen[i * 3] = degen[i * 3 + 1] = degen[i * 3 + 2] = l;
  }
  blend_from(img, degen.data(), npx * 3, enhance_factor(mag));
}

void op_contrast(uint8_t* img, int w, int h, int mag) {
  size_t npx = size_t(w) * h;
  // PIL: mean of the L image (float mean), rounded half-up to int
  double sum = 0;
  for (size_t i = 0; i < npx; ++i) sum += lum(img + i * 3);
  uint8_t mean = clip8(int(sum / double(npx) + 0.5));
  std::vector<uint8_t> degen(npx * 3, mean);
  blend_from(img, degen.data(), npx * 3, enhance_factor(mag));
}

void op_brightness(uint8_t* img, int w, int h, int mag) {
  size_t n = size_t(w) * h * 3;
  std::vector<uint8_t> degen(n, 0);
  blend_from(img, degen.data(), n, enhance_factor(mag));
}

void op_sharpness(uint8_t* img, int w, int h, int mag) {
  // degenerate = PIL ImageFilter.SMOOTH: 3x3 kernel [1 1 1; 1 5 1; 1 1 1]/13,
  // 1-pixel border copied from the source (Pillow leaves edges unfiltered);
  // rounding half-away-from-zero like Pillow's filter kernel
  size_t npx = size_t(w) * h;
  std::vector<uint8_t> degen(img, img + npx * 3);
  for (int y = 1; y < h - 1; ++y) {
    for (int x = 1; x < w - 1; ++x) {
      for (int ch = 0; ch < 3; ++ch) {
        int s = 0;
        for (int dy = -1; dy <= 1; ++dy)
          for (int dx = -1; dx <= 1; ++dx)
            s += img[(size_t(y + dy) * w + (x + dx)) * 3 + ch] *
                 ((dx == 0 && dy == 0) ? 5 : 1);
        degen[(size_t(y) * w + x) * 3 + ch] = clip8(int(s / 13.0f + 0.5f));
      }
    }
  }
  blend_from(img, degen.data(), npx * 3, enhance_factor(mag));
}

// ---------------------------------------------------------------------------
// LUT / pointwise ops (bit-exact vs PIL)
// ---------------------------------------------------------------------------
void op_posterize(uint8_t* img, size_t n, int mag) {
  int bits = 8 - int(mag / kMaxLevel * 4);
  uint8_t mask = uint8_t(0xFF << (8 - bits));
  for (size_t i = 0; i < n; ++i) img[i] &= mask;
}

void op_solarize(uint8_t* img, size_t n, int mag) {
  int threshold = 256 - int(mag / kMaxLevel * 256);
  for (size_t i = 0; i < n; ++i)
    if (img[i] >= threshold) img[i] = uint8_t(255 - img[i]);
}

void op_solarize_add(uint8_t* img, size_t n, int mag) {
  int add = int(mag / kMaxLevel * 110);
  for (size_t i = 0; i < n; ++i)
    if (img[i] < 128) img[i] = clip8(img[i] + add);
}

void op_invert(uint8_t* img, size_t n) {
  for (size_t i = 0; i < n; ++i) img[i] = uint8_t(255 - img[i]);
}

void op_autocontrast(uint8_t* img, int w, int h) {
  // PIL ImageOps.autocontrast(cutoff=0): per channel, stretch [lo, hi] to
  // [0, 255] with lut[i] = int(i*scale + offset) (C truncation)
  size_t npx = size_t(w) * h;
  for (int ch = 0; ch < 3; ++ch) {
    int lo = 255, hi = 0;
    for (size_t i = 0; i < npx; ++i) {
      int v = img[i * 3 + ch];
      lo = std::min(lo, v);
      hi = std::max(hi, v);
    }
    if (hi <= lo) continue;
    double scale = 255.0 / (hi - lo);
    double offset = -lo * scale;
    uint8_t lut[256];
    for (int i = 0; i < 256; ++i)
      lut[i] = clip8(int(i * scale + offset));
    for (size_t i = 0; i < npx; ++i) img[i * 3 + ch] = lut[img[i * 3 + ch]];
  }
}

void op_equalize(uint8_t* img, int w, int h) {
  // PIL ImageOps.equalize: per channel; step = (pixels - count of the
  // LAST NON-EMPTY bin) // 255; lut[i] = (step//2 + cumsum(h[:i])) // step
  size_t npx = size_t(w) * h;
  for (int ch = 0; ch < 3; ++ch) {
    int64_t hist[256] = {0};
    for (size_t i = 0; i < npx; ++i) hist[img[i * 3 + ch]]++;
    int nonzero = 0;
    int64_t last_nonzero = 0, total = 0;
    for (int i = 0; i < 256; ++i) {
      if (hist[i]) {
        nonzero++;
        last_nonzero = hist[i];
        total += hist[i];
      }
    }
    if (nonzero <= 1) continue;
    int64_t step = (total - last_nonzero) / 255;
    if (!step) continue;
    uint8_t lut[256];
    int64_t n = step / 2;
    for (int i = 0; i < 256; ++i) {
      lut[i] = clip8(int(n / step));
      n += hist[i];
    }
    for (size_t i = 0; i < npx; ++i) img[i * 3 + ch] = lut[img[i * 3 + ch]];
  }
}

void op_cutout(uint8_t* img, int w, int h, int mag, int cx, int cy) {
  int size = int(mag / kMaxLevel * 40);
  if (size <= 0) return;
  int x0 = std::max(cx - size, 0), y0 = std::max(cy - size, 0);
  int x1 = std::min(cx + size, w), y1 = std::min(cy + size, h);
  for (int y = y0; y < y1; ++y) {
    uint8_t* row = img + (size_t(y) * w + x0) * 3;
    std::memset(row, kFill, size_t(x1 - x0) * 3);
  }
}

// ---------------------------------------------------------------------------
// policy tables — published AutoAugment constants (same as the Python tables)
// ---------------------------------------------------------------------------
struct OpSpec { int op; float prob; int mag; };
using SubPolicy = OpSpec[2];

constexpr SubPolicy kPolicyV0[] = {
    {{kEqualize, 0.8f, 1}, {kShearY, 0.8f, 4}},
    {{kColor, 0.4f, 9}, {kEqualize, 0.6f, 3}},
    {{kColor, 0.4f, 1}, {kRotate, 0.6f, 8}},
    {{kSolarize, 0.8f, 3}, {kEqualize, 0.4f, 7}},
    {{kSolarize, 0.4f, 2}, {kSolarize, 0.6f, 2}},
    {{kColor, 0.2f, 0}, {kEqualize, 0.8f, 8}},
    {{kEqualize, 0.4f, 8}, {kSolarizeAdd, 0.8f, 3}},
    {{kShearX, 0.2f, 9}, {kRotate, 0.6f, 8}},
    {{kColor, 0.6f, 1}, {kEqualize, 1.0f, 2}},
    {{kInvert, 0.4f, 9}, {kRotate, 0.6f, 0}},
    {{kEqualize, 1.0f, 9}, {kShearY, 0.6f, 3}},
    {{kColor, 0.4f, 7}, {kEqualize, 0.6f, 0}},
    {{kPosterize, 0.4f, 6}, {kAutoContrast, 0.4f, 7}},
    {{kSolarize, 0.6f, 8}, {kColor, 0.6f, 9}},
    {{kSolarize, 0.2f, 4}, {kRotate, 0.8f, 9}},
    {{kRotate, 1.0f, 7}, {kTranslateY, 0.8f, 9}},
    {{kShearX, 0.0f, 0}, {kSolarize, 0.8f, 4}},
    {{kShearY, 0.8f, 0}, {kColor, 0.6f, 4}},
    {{kColor, 1.0f, 0}, {kRotate, 0.6f, 2}},
    {{kEqualize, 0.8f, 4}, {kEqualize, 0.0f, 8}},
    {{kEqualize, 1.0f, 4}, {kAutoContrast, 0.6f, 2}},
    {{kShearY, 0.4f, 7}, {kSolarizeAdd, 0.6f, 7}},
    {{kPosterize, 0.8f, 2}, {kSolarize, 0.6f, 10}},
    {{kSolarize, 0.6f, 8}, {kEqualize, 0.6f, 1}},
    {{kColor, 0.8f, 6}, {kRotate, 0.4f, 5}},
};

constexpr SubPolicy kPolicyImagenet[] = {
    {{kPosterize, 0.4f, 8}, {kRotate, 0.6f, 9}},
    {{kSolarize, 0.6f, 5}, {kAutoContrast, 0.6f, 5}},
    {{kEqualize, 0.8f, 8}, {kEqualize, 0.6f, 3}},
    {{kPosterize, 0.6f, 7}, {kPosterize, 0.6f, 6}},
    {{kEqualize, 0.4f, 7}, {kSolarize, 0.2f, 4}},
    {{kEqualize, 0.4f, 4}, {kRotate, 0.8f, 8}},
    {{kSolarize, 0.6f, 3}, {kEqualize, 0.6f, 7}},
    {{kPosterize, 0.8f, 5}, {kEqualize, 1.0f, 2}},
    {{kRotate, 0.2f, 3}, {kSolarize, 0.6f, 8}},
    {{kEqualize, 0.6f, 8}, {kPosterize, 0.4f, 6}},
    {{kRotate, 0.8f, 8}, {kColor, 0.4f, 0}},
    {{kRotate, 0.4f, 9}, {kEqualize, 0.6f, 2}},
    {{kEqualize, 0.0f, 7}, {kEqualize, 0.8f, 8}},
    {{kInvert, 0.6f, 4}, {kEqualize, 1.0f, 8}},
    {{kColor, 0.6f, 4}, {kContrast, 1.0f, 8}},
    {{kRotate, 0.8f, 8}, {kColor, 1.0f, 2}},
    {{kColor, 0.8f, 8}, {kSolarize, 0.8f, 7}},
    {{kSharpness, 0.4f, 7}, {kInvert, 0.6f, 8}},
    {{kShearX, 0.6f, 5}, {kEqualize, 1.0f, 9}},
    {{kColor, 0.4f, 0}, {kEqualize, 0.6f, 3}},
    {{kEqualize, 0.4f, 7}, {kSolarize, 0.2f, 4}},
    {{kSolarize, 0.6f, 5}, {kAutoContrast, 0.6f, 5}},
    {{kInvert, 0.6f, 4}, {kEqualize, 1.0f, 8}},
    {{kColor, 0.6f, 4}, {kContrast, 1.0f, 8}},
    {{kEqualize, 0.8f, 8}, {kEqualize, 0.6f, 3}},
};

}  // namespace

void aa_apply_op(uint8_t* img, int w, int h, int op, int mag,
                 int sign, int cutout_x, int cutout_y) {
  size_t n = size_t(w) * h * 3;
  switch (op) {
    case kShearX: shear_x(img, w, h, mag, sign); break;
    case kShearY: shear_y(img, w, h, mag, sign); break;
    case kTranslateX: translate_x(img, w, h, mag, sign); break;
    case kTranslateY: translate_y(img, w, h, mag, sign); break;
    case kRotate: rotate(img, w, h, mag, sign); break;
    case kColor: op_color(img, w, h, mag); break;
    case kContrast: op_contrast(img, w, h, mag); break;
    case kBrightness: op_brightness(img, w, h, mag); break;
    case kSharpness: op_sharpness(img, w, h, mag); break;
    case kPosterize: op_posterize(img, n, mag); break;
    case kSolarize: op_solarize(img, n, mag); break;
    case kSolarizeAdd: op_solarize_add(img, n, mag); break;
    case kAutoContrast: op_autocontrast(img, w, h); break;
    case kEqualize: op_equalize(img, w, h); break;
    case kInvert: op_invert(img, n); break;
    case kCutout: op_cutout(img, w, h, mag, cutout_x, cutout_y); break;
    default: break;
  }
}

void aa_apply_policy(uint8_t* img, int w, int h, int policy_id, AaRngIface& rng) {
  const SubPolicy* policy;
  size_t count;
  if (policy_id == 0) {
    policy = kPolicyV0;
    count = sizeof(kPolicyV0) / sizeof(SubPolicy);
  } else if (policy_id == 1) {
    policy = kPolicyImagenet;
    count = sizeof(kPolicyImagenet) / sizeof(SubPolicy);
  } else {
    return;
  }
  const OpSpec* sub = policy[rng.below(count)];
  for (int k = 0; k < 2; ++k) {
    const OpSpec& s = sub[k];
    if (rng.uniform() >= s.prob) continue;
    int sign = 1, cx = 0, cy = 0;
    switch (s.op) {  // draw order matches the Python reference op bodies
      case kShearX: case kShearY: case kTranslateX: case kTranslateY:
      case kRotate:
        sign = rng.uniform() < 0.5 ? -1 : 1;
        break;
      case kCutout:
        cx = int(rng.below(uint64_t(w)));
        cy = int(rng.below(uint64_t(h)));
        break;
      default:
        break;
    }
    aa_apply_op(img, w, h, s.op, s.mag, sign, cx, cy);
  }
}

}  // namespace axcnn
