// AutoAugment for the native loader — C++ mirror of the PIL semantics
// reference (axcnn/data/autoaugment.py). See autoaugment.cpp.
#pragma once

#include <cstdint>

namespace axcnn {

struct AaRngIface {
  virtual double uniform() = 0;              // [0, 1)
  virtual uint64_t below(uint64_t n) = 0;    // [0, n)
  virtual ~AaRngIface() = default;
};

// Op ids (order matches kAaOpNames in autoaugment.cpp and the Python
// NAME_TO_OP table).
enum AaOp : int {
  kShearX = 0, kShearY, kTranslateX, kTranslateY, kRotate,
  kColor, kContrast, kBrightness, kSharpness,
  kPosterize, kSolarize, kSolarizeAdd, kAutoContrast, kEqualize, kInvert,
  kCutout, kAaOpCount,
};

// Apply one op in place on an RGB HWC uint8 image. Deterministic variant:
// the caller supplies what the stochastic path would draw (sign for the
// geometry ops, cutout center). Used by apply_policy and the test C API.
void aa_apply_op(uint8_t* img, int w, int h, int op, int mag,
                 int sign, int cutout_x, int cutout_y);

// Apply one randomly-drawn sub-policy of `policy_id` (0 = v0, 1 = imagenet)
// in place, drawing from `rng` in the same order as the Python reference
// (sub-policy index, then per-op probability, then per-op sign/position).
void aa_apply_policy(uint8_t* img, int w, int h, int policy_id, AaRngIface& rng);

}  // namespace axcnn
