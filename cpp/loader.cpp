// axcnn native data loader: TFRecord Example parse + JPEG decode + crop /
// bilinear resize / flip, multithreaded, exposed as a C API for ctypes.
//
// Parity target (SURVEY.md §2.9): the reference inherits its input-pipeline
// performance from tf.data's C++ runtime (parallel map + libjpeg-turbo
// decode). This library is the axcnn equivalent: the Python loader
// (axcnn/data/pipeline.py) keeps file IO, shuffling and checkpointable
// ordering — all cheap and already golden-tested — and hands each batch's
// raw record payloads here for the CPU-heavy work.
//
// Semantics match axcnn/data/preprocessing.py:
//   train: distorted bbox crop (area 8-100%, log-uniform aspect 3/4..4/3,
//          10 attempts, center fallback) -> bilinear resize from the crop
//          box -> 50% horizontal flip
//   eval : resize shorter side to resize_min -> central crop
// RNG is a per-record splitmix/xoshiro seeded by (seed, epoch, record_idx) —
// deterministic and order-independent, like the Python path (exact bitwise
// parity with numpy's Generator is not attempted; distributions match).
//
// Build: cpp/build.sh  (g++ -O3 -shared -fPIC loader.cpp -ljpeg -lpthread)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>

#include "autoaugment.h"

namespace {

// ---------------------------------------------------------------------------
// RNG: splitmix64 seeding + xoshiro256** core
// ---------------------------------------------------------------------------
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    uint64_t x = seed;
    for (int i = 0; i < 4; i++) {
      x += 0x9E3779B97F4A7C15ULL;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      s[i] = z ^ (z >> 31);
    }
  }
  static uint64_t rotl(uint64_t v, int k) { return (v << k) | (v >> (64 - k)); }
  uint64_t next() {
    uint64_t result = rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3]; s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  double uniform() { return (next() >> 11) * 0x1.0p-53; }
  double uniform(double lo, double hi) { return lo + uniform() * (hi - lo); }
  // integer in [0, n)
  uint64_t below(uint64_t n) { return n ? next() % n : 0; }
};

// ---------------------------------------------------------------------------
// minimal tf.train.Example wire parse: find image/encoded + image/class/label
// ---------------------------------------------------------------------------
struct Slice { const uint8_t* p; size_t n; };

bool read_varint(const uint8_t*& p, const uint8_t* end, uint64_t* out) {
  uint64_t r = 0; int shift = 0;
  while (p < end) {
    uint8_t b = *p++;
    r |= uint64_t(b & 0x7F) << shift;
    if (!(b & 0x80)) { *out = r; return true; }
    shift += 7;
    if (shift > 63) return false;
  }
  return false;
}

// iterate fields of a message [p, end); cb(field, wire, payload-slice/varint)
template <typename F>
bool for_fields(const uint8_t* p, const uint8_t* end, F&& cb) {
  while (p < end) {
    uint64_t tag;
    if (!read_varint(p, end, &tag)) return false;
    uint32_t field = uint32_t(tag >> 3), wire = uint32_t(tag & 7);
    if (wire == 2) {
      uint64_t len;
      if (!read_varint(p, end, &len) || p + len > end) return false;
      if (!cb(field, wire, Slice{p, size_t(len)}, 0)) return true;
      p += len;
    } else if (wire == 0) {
      uint64_t v;
      if (!read_varint(p, end, &v)) return false;
      if (!cb(field, wire, Slice{nullptr, 0}, v)) return true;
    } else if (wire == 5) {
      if (p + 4 > end) return false;
      if (!cb(field, wire, Slice{p, 4}, 0)) return true;
      p += 4;
    } else if (wire == 1) {
      if (p + 8 > end) return false;
      if (!cb(field, wire, Slice{p, 8}, 0)) return true;
      p += 8;
    } else {
      return false;
    }
  }
  return true;
}

struct Parsed { Slice jpeg{nullptr, 0}; int64_t label = -1; bool ok = false; };

Parsed parse_example(const uint8_t* data, size_t size) {
  Parsed out;
  for_fields(data, data + size, [&](uint32_t f, uint32_t w, Slice s, uint64_t) {
    if (f != 1 || w != 2) return true;  // Features
    for_fields(s.p, s.p + s.n, [&](uint32_t f2, uint32_t w2, Slice entry, uint64_t) {
      if (f2 != 1 || w2 != 2) return true;  // map entry
      Slice key{nullptr, 0}, feat{nullptr, 0};
      for_fields(entry.p, entry.p + entry.n,
                 [&](uint32_t f3, uint32_t w3, Slice v, uint64_t) {
        if (f3 == 1 && w3 == 2) key = v;
        else if (f3 == 2 && w3 == 2) feat = v;
        return true;
      });
      if (!key.p || !feat.p) return true;
      std::string k(reinterpret_cast<const char*>(key.p), key.n);
      if (k == "image/encoded") {
        for_fields(feat.p, feat.p + feat.n,
                   [&](uint32_t fk, uint32_t wk, Slice list, uint64_t) {
          if (fk == 1 && wk == 2) {  // BytesList
            for_fields(list.p, list.p + list.n,
                       [&](uint32_t fb, uint32_t wb, Slice bytes, uint64_t) {
              if (fb == 1 && wb == 2 && !out.jpeg.p) out.jpeg = bytes;
              return true;
            });
          }
          return true;
        });
      } else if (k == "image/class/label") {
        for_fields(feat.p, feat.p + feat.n,
                   [&](uint32_t fk, uint32_t wk, Slice list, uint64_t) {
          if (fk == 3 && wk == 2) {  // Int64List
            for_fields(list.p, list.p + list.n,
                       [&](uint32_t fi, uint32_t wi, Slice, uint64_t v) {
              if (fi == 1 && wi == 0 && out.label < 0) out.label = int64_t(v);
              return true;
            });
          }
          return true;
        });
      }
      return true;
    });
    return true;
  });
  out.ok = out.jpeg.p != nullptr && out.label >= 0;
  return out;
}

// ---------------------------------------------------------------------------
// JPEG decode via libjpeg(-turbo)
// ---------------------------------------------------------------------------
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// decode full RGB image; returns false on corrupt data.
// dct_fast selects libjpeg's JDCT_IFAST (the reference's
// --dct_method=INTEGER_FAST knob); default JDCT_ISLOW == INTEGER_ACCURATE,
// matching PIL bit-for-bit.
bool decode_jpeg(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
                 int* w, int* h, bool dct_fast = false) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) { jpeg_destroy_decompress(&cinfo); return false; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = dct_fast ? JDCT_IFAST : JDCT_ISLOW;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width; *h = cinfo.output_height;
  out->resize(size_t(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Crop-during-decode via libjpeg-turbo's jpeg_crop_scanline /
// jpeg_skip_scanlines — the native equivalent of tf.data's
// decode_and_crop_jpeg (the reference's train-path fast decode). Decodes
// ONLY the iMCU rows/columns covering the crop box: pixel-IDENTICAL to a
// full decode + crop (IDCT is per 8x8 block), but skipped rows pay only
// Huffman parsing, not IDCT/color conversion.
//
// `geom` receives the image dims (known after the header parse, before any
// pixel work) and returns the desired box — one decompress object, one
// header parse. On success: *out holds (out_w x out_h) RGB where the
// returned box starts at column (*bx - *x0) and row 0.
template <typename GeomFn>
bool decode_jpeg_cropped(const uint8_t* data, size_t size, bool dct_fast,
                         GeomFn&& geom,
                         std::vector<uint8_t>* out, int* out_w, int* out_h,
                         int* bx, int* by, int* bw, int* bh, int* x0,
                         int* img_w, int* img_h) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) { jpeg_destroy_decompress(&cinfo); return false; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = dct_fast ? JDCT_IFAST : JDCT_ISLOW;
  const int w = int(cinfo.image_width), h = int(cinfo.image_height);
  if (w <= 0 || h <= 0) { jpeg_destroy_decompress(&cinfo); return false; }
  *img_w = w; *img_h = h;
  geom(w, h, bx, by, bw, bh);
  *bx = std::clamp(*bx, 0, w - 1); *by = std::clamp(*by, 0, h - 1);
  *bw = std::clamp(*bw, 1, w - *bx); *bh = std::clamp(*bh, 1, h - *by);

  // full-frame request → plain decode (crop bookkeeping is pure overhead)
  const bool whole = *bx == 0 && *by == 0 && *bw == w && *bh == h;
  jpeg_start_decompress(&cinfo);
  JDIMENSION xoff = JDIMENSION(*bx), xw = JDIMENSION(*bw);
  if (!whole) jpeg_crop_scanline(&cinfo, &xoff, &xw);  // aligns to iMCU grid
  if (*by > 0) jpeg_skip_scanlines(&cinfo, JDIMENSION(*by));
  *out_w = int(xw); *out_h = *bh; *x0 = int(xoff);
  out->resize(size_t(xw) * *bh * 3);
  while (int(cinfo.output_scanline) < *by + *bh) {
    uint8_t* row = out->data() + size_t(int(cinfo.output_scanline) - *by) * xw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  // remaining rows are never needed: abort instead of skip+finish
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// bilinear resize from a source crop box to (ow, oh), optional h-flip
// (PIL-style half-pixel sampling)
// ---------------------------------------------------------------------------
void resize_bilinear_box(const uint8_t* src, int sw, int sh,
                         int bx, int by, int bw, int bh,
                         uint8_t* dst, int ow, int oh, bool flip) {
  const double sx = double(bw) / ow, sy = double(bh) / oh;
  std::vector<int> x0s(ow), x1s(ow);
  std::vector<float> fxs(ow);
  for (int ox = 0; ox < ow; ++ox) {
    double cx = bx + (ox + 0.5) * sx - 0.5;
    int x0 = int(std::floor(cx));
    fxs[ox] = float(cx - x0);
    x0s[ox] = std::clamp(x0, 0, sw - 1);
    x1s[ox] = std::clamp(x0 + 1, 0, sw - 1);
  }
  for (int oy = 0; oy < oh; ++oy) {
    double cy = by + (oy + 0.5) * sy - 0.5;
    int y0 = int(std::floor(cy));
    float fy = float(cy - y0);
    int y0c = std::clamp(y0, 0, sh - 1), y1c = std::clamp(y0 + 1, 0, sh - 1);
    const uint8_t* r0 = src + size_t(y0c) * sw * 3;
    const uint8_t* r1 = src + size_t(y1c) * sw * 3;
    uint8_t* drow = dst + size_t(oy) * ow * 3;
    for (int ox = 0; ox < ow; ++ox) {
      int x0 = x0s[ox], x1 = x1s[ox];
      float fx = fxs[ox];
      int out_x = flip ? (ow - 1 - ox) : ox;
      for (int c = 0; c < 3; ++c) {
        float top = r0[x0 * 3 + c] * (1 - fx) + r0[x1 * 3 + c] * fx;
        float bot = r1[x0 * 3 + c] * (1 - fx) + r1[x1 * 3 + c] * fx;
        float v = top * (1 - fy) + bot * fy;
        drow[out_x * 3 + c] = uint8_t(std::lround(std::clamp(v, 0.f, 255.f)));
      }
    }
  }
}

// distorted bbox crop — same sampler as preprocessing.distorted_bbox_crop
void sample_crop(Rng& rng, int w, int h, int* bx, int* by, int* bw, int* bh) {
  const double amin = 0.08, amax = 1.0;
  const double lmin = std::log(3.0 / 4.0), lmax = std::log(4.0 / 3.0);
  double area = double(w) * h;
  for (int i = 0; i < 10; ++i) {
    double target = rng.uniform(amin, amax) * area;
    double aspect = std::exp(rng.uniform(lmin, lmax));
    int cw = int(std::lround(std::sqrt(target * aspect)));
    int ch = int(std::lround(std::sqrt(target / aspect)));
    if (cw > 0 && cw <= w && ch > 0 && ch <= h) {
      *bx = int(rng.below(uint64_t(w - cw + 1)));
      *by = int(rng.below(uint64_t(h - ch + 1)));
      *bw = cw; *bh = ch;
      return;
    }
  }
  double in_ratio = double(w) / h;
  int cw, ch;
  if (in_ratio < 3.0 / 4.0) { cw = w; ch = int(std::lround(w / (3.0 / 4.0))); }
  else if (in_ratio > 4.0 / 3.0) { cw = int(std::lround(h * (4.0 / 3.0))); ch = h; }
  else { cw = w; ch = h; }
  *bx = (w - cw) / 2; *by = (h - ch) / 2; *bw = cw; *bh = ch;
}

// adapter: the loader's per-record xoshiro stream drives AutoAugment's draws
struct RngAdapter final : axcnn::AaRngIface {
  Rng& r;
  explicit RngAdapter(Rng& rr) : r(rr) {}
  double uniform() override { return r.uniform(); }
  uint64_t below(uint64_t n) override { return r.below(n); }
};

bool process_one(const uint8_t* payload, size_t payload_size,
                 int image_size, int resize_min, bool train, bool dct_fast,
                 int aa_policy, uint64_t seed,
                 uint8_t* out_img, int32_t* out_label) {
  Parsed ex = parse_example(payload, payload_size);
  if (!ex.ok) return false;

  // crop geometry is computed from the header dims (inside the single
  // decompress pass), and the decode is restricted to the crop box plus 1px
  // of context — so the bilinear taps that straddle the box edge see the
  // same pixels as a full decode; bit-identical to full-decode + crop
  Rng rng(seed);
  int bx = 0, by = 0, bw = 0, bh = 0;  // the actual (unexpanded) crop box
  auto geom = [&](int w, int h, int* ebx, int* eby, int* ebw, int* ebh) {
    if (train) {
      sample_crop(rng, w, h, &bx, &by, &bw, &bh);
    } else {
      double scale = double(resize_min) / std::min(w, h);
      int nw = int(std::lround(w * scale)), nh = int(std::lround(h * scale));
      // resize-then-centercrop == resize from the back-projected center box
      double inv = 1.0 / scale;
      double left = ((nw - image_size) / 2) * inv;
      double top = ((nh - image_size) / 2) * inv;
      bw = int(std::lround(image_size * inv));
      bh = bw;
      bx = int(std::lround(left));
      by = int(std::lround(top));
      bx = std::clamp(bx, 0, std::max(w - bw, 0));
      by = std::clamp(by, 0, std::max(h - bh, 0));
      bw = std::min(bw, w); bh = std::min(bh, h);
    }
    *ebx = std::max(bx - 1, 0);
    *eby = std::max(by - 1, 0);
    *ebw = std::min(bx + bw + 1, w) - *ebx;
    *ebh = std::min(by + bh + 1, h) - *eby;
  };
  std::vector<uint8_t> rgb;
  int cw = 0, ch = 0, x0 = 0, ebx = 0, eby = 0, ebw = 0, ebh = 0, w = 0, h = 0;
  if (!decode_jpeg_cropped(ex.jpeg.p, ex.jpeg.n, dct_fast, geom, &rgb,
                           &cw, &ch, &ebx, &eby, &ebw, &ebh, &x0, &w, &h)) {
    return false;
  }
  bool flip = train && rng.uniform() < 0.5;
  resize_bilinear_box(rgb.data(), cw, ch, bx - x0, by - eby, bw, bh,
                      out_img, image_size, image_size, flip);
  if (train && aa_policy >= 0) {
    // same order as the Python path: crop → flip → AutoAugment
    RngAdapter adapter(rng);
    axcnn::aa_apply_policy(out_img, image_size, image_size, aa_policy, adapter);
  }
  *out_label = int32_t(ex.label);
  return true;
}

}  // namespace

extern "C" {

// Decode a batch of serialized Examples in parallel.
//   payloads/sizes : n record payloads
//   aa_policy      : AutoAugment policy applied after crop/flip on the train
//                    path (-1 = none, 0 = v0, 1 = imagenet)
//   seeds          : n per-record RNG seeds (caller derives from
//                    (seed, epoch, record_idx) — keeps Python in charge of
//                    determinism/checkpointing)
//   out_images     : n * image_size * image_size * 3 uint8, HWC
//   out_labels     : n int32
// Returns number of successfully decoded records; failures leave zeros and
// label -1 at their slot.
int axcnn_decode_batch(const uint8_t** payloads, const int64_t* sizes, int n,
                       int image_size, int resize_min, int train, int dct_fast,
                       int aa_policy, const uint64_t* seeds,
                       uint8_t* out_images, int32_t* out_labels,
                       int num_threads) {
  std::atomic<int> next(0), ok(0);
  const size_t img_bytes = size_t(image_size) * image_size * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      bool good = process_one(payloads[i], size_t(sizes[i]), image_size,
                              resize_min, train != 0, dct_fast != 0,
                              aa_policy, seeds[i],
                              out_images + size_t(i) * img_bytes,
                              out_labels + i);
      if (good) ok.fetch_add(1);
      else {
        std::memset(out_images + size_t(i) * img_bytes, 0, img_bytes);
        out_labels[i] = -1;
      }
    }
  };
  int nt = std::max(1, std::min(num_threads, n));
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return ok.load();
}

// Decode one JPEG to RGB at native size (for tools/tests).
// Returns 0 on success; out must hold max_bytes.
int axcnn_decode_jpeg(const uint8_t* data, int64_t size, uint8_t* out,
                      int64_t max_bytes, int* w, int* h) {
  std::vector<uint8_t> rgb;
  if (!decode_jpeg(data, size_t(size), &rgb, w, h)) return 1;
  if (int64_t(rgb.size()) > max_bytes) return 2;
  std::memcpy(out, rgb.data(), rgb.size());
  return 0;
}

// Apply one AutoAugment op in place on an RGB HWC uint8 image (test/tool
// API — lets Python compare each C++ op against the PIL reference
// implementation directly, with the stochastic draws pinned).
int axcnn_aa_op(uint8_t* img, int w, int h, int op, int mag, int sign,
                int cutout_x, int cutout_y) {
  if (op < 0 || op >= axcnn::kAaOpCount || w <= 0 || h <= 0) return 1;
  axcnn::aa_apply_op(img, w, h, op, mag, sign, cutout_x, cutout_y);
  return 0;
}

int axcnn_version() { return 3; }

}  // extern "C"
