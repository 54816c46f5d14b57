// yolou_io: native data-loading runtime for the TPU framework.
//
// Replaces the reference's host-side image path (cv2.imread IMREAD_UNCHANGED +
// cv2.resize inside torch DataLoader workers; /root/reference/dataset.py:53-65,
// custom_yolo_trainer/custom_base.py:66-78) with a dependency-light C++
// pipeline: PNG decode (zlib inflate + unfilter), bilinear/nearest resize,
// letterbox placement, and a pthread pool that fills a preallocated NHWC
// batch buffer. Exposed as a C ABI consumed via ctypes (no pybind11 in the
// image).
//
// Supported PNGs: 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced
// (BraTS stacked slices are 8-bit RGBA).

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC, 8-bit
  int h = 0, w = 0, c = 0;
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode an in-memory PNG. Returns 0 on success.
int decode_png(const uint8_t* buf, size_t len, Image* out) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || memcmp(buf, kSig, 8) != 0) return -1;
  size_t pos = 8;
  int w = 0, h = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= len) {
    uint32_t chunk_len = be32(buf + pos);
    const uint8_t* type = buf + pos + 4;
    const uint8_t* data = buf + pos + 8;
    if (pos + 12 + chunk_len > len) return -2;
    if (memcmp(type, "IHDR", 4) == 0) {
      w = be32(data);
      h = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + chunk_len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + chunk_len;
  }
  if (w <= 0 || h <= 0 || bit_depth != 8 || interlace != 0) return -3;
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // RGB
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // RGBA
    default: return -4;           // palette unsupported
  }
  const size_t stride = size_t(w) * channels;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return -5;
  }
  out->data.assign(stride * h, 0);
  out->h = h;
  out->w = w;
  out->c = channels;
  const int bpp = channels;  // bytes per pixel (8-bit)
  for (int y = 0; y < h; ++y) {
    const uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = raw.data() + (stride + 1) * y + 1;
    uint8_t* dst = out->data.data() + stride * y;
    const uint8_t* up = y > 0 ? out->data.data() + stride * (y - 1) : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -6;
      }
      dst[x] = uint8_t(v);
    }
  }
  // cv2.IMREAD_UNCHANGED semantics (the reference's decode path): BGR(A)
  // channel order, so swap R<->B for 3/4-channel images.
  if (channels >= 3) {
    for (size_t i = 0; i < out->data.size(); i += channels) {
      std::swap(out->data[i], out->data[i + 2]);
    }
  }
  return 0;
}

int read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t rd = fread(out->data(), 1, n, f);
  fclose(f);
  return rd == size_t(n) ? 0 : -2;
}

// Bilinear resize with half-pixel centers (cv2.INTER_LINEAR convention).
void resize_bilinear(const Image& src, int oh, int ow, int oc, uint8_t* dst) {
  const float sy = float(src.h) / oh, sx = float(src.w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)floorf(fy);
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= src.h ? src.h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= src.h ? src.h - 1 : y0 + 1);
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)floorf(fx);
      float wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= src.w ? src.w - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= src.w ? src.w - 1 : x0 + 1);
      for (int ch = 0; ch < oc; ++ch) {
        int sc = ch < src.c ? ch : src.c - 1;
        float v00 = src.data[(size_t(y0c) * src.w + x0c) * src.c + sc];
        float v01 = src.data[(size_t(y0c) * src.w + x1c) * src.c + sc];
        float v10 = src.data[(size_t(y1c) * src.w + x0c) * src.c + sc];
        float v11 = src.data[(size_t(y1c) * src.w + x1c) * src.c + sc];
        float v = (v00 * (1 - wx) + v01 * wx) * (1 - wy) +
                  (v10 * (1 - wx) + v11 * wx) * wy;
        dst[(size_t(y) * ow + x) * oc + ch] = uint8_t(v + 0.5f);
      }
    }
  }
}

void resize_nearest(const Image& src, int oh, int ow, int oc, uint8_t* dst) {
  for (int y = 0; y < oh; ++y) {
    int sy = y * src.h / oh;
    for (int x = 0; x < ow; ++x) {
      int sx = x * src.w / ow;
      for (int ch = 0; ch < oc; ++ch) {
        int sc = ch < src.c ? ch : src.c - 1;
        dst[(size_t(y) * ow + x) * oc + ch] =
            src.data[(size_t(sy) * src.w + sx) * src.c + sc];
      }
    }
  }
}

// Write a decoded image (stretch- or letterbox-resized) into an NHWC slot.
void place_image(const Image& img, int imgsz, int channels, int letterbox,
                 int nearest, uint8_t* slot) {
  if (!letterbox) {
    if (nearest)
      resize_nearest(img, imgsz, imgsz, channels, slot);
    else
      resize_bilinear(img, imgsz, imgsz, channels, slot);
    return;
  }
  if (img.h == imgsz && img.w == imgsz && img.c == channels) {
    // already model-sized: plain copy
    memcpy(slot, img.data.data(), size_t(imgsz) * imgsz * channels);
    return;
  }
  const float r = std::min(float(imgsz) / img.h, float(imgsz) / img.w);
  const int uh = int(img.h * r + 0.5f), uw = int(img.w * r + 0.5f);
  std::vector<uint8_t> tmp(size_t(uh) * uw * channels);
  resize_bilinear(img, uh, uw, channels, tmp.data());
  memset(slot, 114, size_t(imgsz) * imgsz * channels);
  const int top = int((imgsz - uh) / 2.0f - 0.1f + 0.5f);
  const int left = int((imgsz - uw) / 2.0f - 0.1f + 0.5f);
  for (int y = 0; y < uh; ++y) {
    memcpy(slot + ((size_t(top) + y) * imgsz + left) * channels,
           tmp.data() + size_t(y) * uw * channels, size_t(uw) * channels);
  }
}

// Decode one file and write it (stretch- or letterbox-resized) into an NHWC
// slot of the batch buffer.
int load_one(const char* path, int imgsz, int channels, int letterbox,
             int nearest, uint8_t* slot) {
  std::vector<uint8_t> buf;
  if (read_file(path, &buf) != 0) return -10;
  Image img;
  int rc = decode_png(buf.data(), buf.size(), &img);
  if (rc != 0) return rc;
  place_image(img, imgsz, channels, letterbox, nearest, slot);
  return 0;
}

// NHWC (S,S,C) -> space-to-depth(4) (S/4, S/4, 16*C), channel order
// (iy, ix, ci) — the stem's preferred layout (nn/blocks.py::s2d_stem_apply).
// A pure index permutation done while the batch buffer is being written, so
// the device never pays the 3.5+ ms on-chip relayout.
void s2d4(const uint8_t* src, int imgsz, int channels, uint8_t* dst) {
  const int ob = imgsz / 4;
  const size_t row = size_t(imgsz) * channels;
  for (int oy = 0; oy < ob; ++oy) {
    for (int iy = 0; iy < 4; ++iy) {
      const uint8_t* srow = src + (size_t(oy) * 4 + iy) * row;
      uint8_t* drow = dst + (size_t(oy) * ob) * (16 * channels)
                      + iy * 4 * channels;
      if (channels == 4) {
        // common case (BraTS stacks): 4 px x 4 ch = 16 contiguous bytes per
        // copy — two unaligned u64 moves beat a memcpy call per pixel group
        for (int ox = 0; ox < ob; ++ox) {
          uint64_t a, b;
          memcpy(&a, srow + size_t(ox) * 16, 8);
          memcpy(&b, srow + size_t(ox) * 16 + 8, 8);
          memcpy(drow + size_t(ox) * 64, &a, 8);
          memcpy(drow + size_t(ox) * 64 + 8, &b, 8);
        }
      } else {
        for (int ox = 0; ox < ob; ++ox) {
          // 4 consecutive source pixels (ix=0..3) are contiguous
          memcpy(drow + size_t(ox) * 16 * channels,
                 srow + size_t(ox) * 4 * channels, 4 * channels);
        }
      }
    }
  }
}

// ---- uint8 -> normalized bfloat16 (v / 255.0f, round-to-nearest-even) ----
// Matches XLA's f32->bf16 conversion bit-for-bit so a loader-emitted bf16
// feed is exactly the device program's `(u8.astype(f32)/255).astype(bf16)`
// — folding that ~1 ms whole-image cast pass out of the device program.
struct Bf16Lut {
  uint16_t v[256];
  Bf16Lut() {
    for (int i = 0; i < 256; ++i) {
      float f = float(i) / 255.0f;
      uint32_t bits;
      memcpy(&bits, &f, 4);
      // round to nearest even on the truncated 16 bits
      bits += 0x7FFFu + ((bits >> 16) & 1u);
      v[i] = uint16_t(bits >> 16);
    }
  }
};
const Bf16Lut kBf16;

// s2d(4) permutation fused with the u8 -> unit-bf16 LUT: emits the stem's
// lane-dense layout already normalized, (S/4, S/4, 16*C) uint16-as-bf16.
void s2d4_bf16(const uint8_t* src, int imgsz, int channels, uint16_t* dst) {
  const int ob = imgsz / 4;
  const size_t row = size_t(imgsz) * channels;
  for (int oy = 0; oy < ob; ++oy) {
    for (int iy = 0; iy < 4; ++iy) {
      const uint8_t* srow = src + (size_t(oy) * 4 + iy) * row;
      uint16_t* drow = dst + (size_t(oy) * ob) * (16 * channels)
                       + iy * 4 * channels;
      for (int ox = 0; ox < ob; ++ox) {
        const uint8_t* s = srow + size_t(ox) * 4 * channels;
        uint16_t* d = drow + size_t(ox) * 16 * channels;
        for (int k = 0; k < 4 * channels; ++k) d[k] = kBf16.v[s[k]];
      }
    }
  }
}

}  // namespace

extern "C" {

// Standalone s2d(4) permutation (for tests/benchmarks of the host cost).
void yio_s2d4(const uint8_t* src, int imgsz, int channels, uint8_t* dst) {
  s2d4(src, imgsz, channels, dst);
}

// s2d(4) + u8->unit-bf16 in one pass (dst is uint16-typed bf16 storage).
void yio_s2d4_bf16(const uint8_t* src, int imgsz, int channels,
                   uint16_t* dst) {
  s2d4_bf16(src, imgsz, channels, dst);
}

// Elementwise u8 -> unit-bf16 (v/255, RNE) for non-s2d feeds.
void yio_u8_to_unit_bf16(const uint8_t* src, int64_t n, uint16_t* dst) {
  for (int64_t i = 0; i < n; ++i) dst[i] = kBf16.v[src[i]];
}

// Decode one PNG file; caller frees *out with yio_free. Returns 0 on success.
int yio_decode_png_file(const char* path, uint8_t** out, int* h, int* w,
                        int* c) {
  std::vector<uint8_t> buf;
  if (read_file(path, &buf) != 0) return -10;
  Image img;
  int rc = decode_png(buf.data(), buf.size(), &img);
  if (rc != 0) return rc;
  *out = (uint8_t*)malloc(img.data.size());
  memcpy(*out, img.data.data(), img.data.size());
  *h = img.h;
  *w = img.w;
  *c = img.c;
  return 0;
}

// Fill out[n, imgsz, imgsz, channels] (uint8) from n files using a thread
// pool. status[i] receives the per-file return code. Returns 0 if all ok.
int yio_load_batch(const char** paths, int n, int imgsz, int channels,
                   int letterbox, int nearest, int nthreads, uint8_t* out,
                   int* status) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t slot_size = size_t(imgsz) * imgsz * channels;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = load_one(paths[i], imgsz, channels, letterbox, nearest,
                        out + slot_size * i);
      if (status) status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };
  int nt = nthreads > 0 ? nthreads : int(std::thread::hardware_concurrency());
  if (nt > n) nt = n > 0 ? n : 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load() == 0 ? 0 : -1;
}

// Like yio_load_batch but emits each slot in space-to-depth(4) layout:
// out[n, imgsz/4, imgsz/4, 16*channels]. Costs one thread-local NHWC staging
// buffer per worker; the permutation itself is memcpy-dense.
int yio_load_batch_s2d(const char** paths, int n, int imgsz, int channels,
                       int letterbox, int nearest, int nthreads, uint8_t* out,
                       int* status) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t slot_size = size_t(imgsz) * imgsz * channels;
  auto worker = [&]() {
    std::vector<uint8_t> stage(slot_size);
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = load_one(paths[i], imgsz, channels, letterbox, nearest,
                        stage.data());
      if (rc == 0) s2d4(stage.data(), imgsz, channels, out + slot_size * i);
      if (status) status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };
  int nt = nthreads > 0 ? nthreads : int(std::thread::hardware_concurrency());
  if (nt > n) nt = n > 0 ? n : 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load() == 0 ? 0 : -1;
}

// Threaded in-memory preprocess: letterbox (aspect-preserving, 114 pad) n
// uniform (h, w, c) uint8 images to imgsz and optionally emit each slot in
// space-to-depth(4) layout — the predictor's stem_s2d host path for sources
// that are already decoded (ndarray/PIL/video/stream frames).
int yio_letterbox_s2d_batch(const uint8_t* in, int n, int h, int w, int c,
                            int imgsz, int s2d, int nthreads, uint8_t* out) {
  const size_t in_size = size_t(h) * w * c;
  const size_t slot_size = size_t(imgsz) * imgsz * c;
  std::atomic<int> next(0);
  auto worker = [&]() {
    std::vector<uint8_t> stage(s2d ? slot_size : 0);
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img;
      img.data.assign(in + in_size * i, in + in_size * (i + 1));
      img.h = h;
      img.w = w;
      img.c = c;
      uint8_t* slot = s2d ? stage.data() : out + slot_size * i;
      place_image(img, imgsz, c, /*letterbox=*/1, /*nearest=*/0, slot);
      if (s2d) s2d4(stage.data(), imgsz, c, out + slot_size * i);
    }
  };
  int nt = nthreads > 0 ? nthreads : int(std::thread::hardware_concurrency());
  if (nt > n) nt = n > 0 ? n : 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// yio_letterbox_s2d_batch with the fused u8 -> unit-bf16 emit: the
// predictor / bench feed for stem_s2d models, already normalized (the
// device program starts at bf16 and pays no cast pass).
int yio_letterbox_s2d_batch_bf16(const uint8_t* in, int n, int h, int w,
                                 int c, int imgsz, int nthreads,
                                 uint16_t* out) {
  const size_t in_size = size_t(h) * w * c;
  const size_t slot_size = size_t(imgsz) * imgsz * c;
  std::atomic<int> next(0);
  auto worker = [&]() {
    std::vector<uint8_t> stage(slot_size);
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img;
      img.data.assign(in + in_size * i, in + in_size * (i + 1));
      img.h = h;
      img.w = w;
      img.c = c;
      place_image(img, imgsz, c, /*letterbox=*/1, /*nearest=*/0, stage.data());
      s2d4_bf16(stage.data(), imgsz, c, out + slot_size * i);
    }
  };
  int nt = nthreads > 0 ? nthreads : int(std::thread::hardware_concurrency());
  if (nt > n) nt = n > 0 ? n : 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

void yio_free(void* p) { free(p); }

int yio_version() { return 2; }

}  // extern "C"
