// shmgan_tpu native host runtime: multithreaded image decode + bilinear resize.
//
// The reference delegates its host pipeline to tf.data's C++ runtime
// (datasetLoader.py); this library is the rebuilt native equivalent for the JAX
// feed: a worker pool that decodes 8-bit images (PPM/PGM/BMP and raw RGB8 blobs),
// bilinearly resizes them to the training resolution, and scales to [0,1] float32,
// writing straight into a caller-provided contiguous batch buffer so Python only
// does one zero-copy numpy wrap per batch.  PNG/JPEG decode stays on the Python
// side (PIL) — this image has no libjpeg/libpng dev headers — via decode_resize's
// fallback; the C++ path covers the bandwidth-heavy resize+normalize work and raw
// datasets.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, 8-bit
  bool ok = false;
};

// ---------------------------------------------------------------------------
// Decoders
// ---------------------------------------------------------------------------

// PPM (P6) / PGM (P5) binary.
Image DecodePNM(const std::string& bytes) {
  Image img;
  if (bytes.size() < 2 || bytes[0] != 'P') return img;
  int channels = bytes[1] == '6' ? 3 : (bytes[1] == '5' ? 1 : 0);
  if (channels == 0) return img;
  size_t pos = 2;
  auto next_int = [&](int* out) -> bool {
    // skip whitespace and '#' comments
    while (pos < bytes.size()) {
      if (isspace(static_cast<unsigned char>(bytes[pos]))) {
        ++pos;
      } else if (bytes[pos] == '#') {
        while (pos < bytes.size() && bytes[pos] != '\n') ++pos;
      } else {
        break;
      }
    }
    int v = 0;
    bool any = false;
    while (pos < bytes.size() && isdigit(static_cast<unsigned char>(bytes[pos]))) {
      v = v * 10 + (bytes[pos] - '0');
      // bound dimensions/maxval: prevents int overflow on malformed headers
      if (v > (1 << 24)) return false;
      ++pos;
      any = true;
    }
    *out = v;
    return any;
  };
  int w, h, maxval;
  if (!next_int(&w) || !next_int(&h) || !next_int(&maxval)) return img;
  if (maxval <= 0 || maxval > 255 || w <= 0 || h <= 0) return img;
  ++pos;  // single whitespace after maxval
  size_t need = static_cast<size_t>(w) * h * channels;
  // pos may sit past the end on a truncated header; guard BEFORE subtracting
  // (size_t underflow would pass the < need check and read out of bounds)
  if (pos > bytes.size() || bytes.size() - pos < need) return img;
  img.w = w;
  img.h = h;
  img.c = channels;
  img.data.assign(bytes.begin() + pos, bytes.begin() + pos + need);
  img.ok = true;
  return img;
}

// Uncompressed 24/32-bit BMP (BITMAPINFOHEADER), bottom-up or top-down.
Image DecodeBMP(const std::string& b) {
  Image img;
  if (b.size() < 54 || b[0] != 'B' || b[1] != 'M') return img;
  auto u32 = [&](size_t off) {
    uint32_t v;
    std::memcpy(&v, b.data() + off, 4);
    return v;
  };
  auto s32 = [&](size_t off) {
    int32_t v;
    std::memcpy(&v, b.data() + off, 4);
    return v;
  };
  auto u16 = [&](size_t off) {
    uint16_t v;
    std::memcpy(&v, b.data() + off, 2);
    return v;
  };
  uint32_t data_off = u32(10);
  int32_t w = s32(18), h = s32(22);
  uint16_t bpp = u16(28);
  uint32_t compression = u32(30);
  if (compression != 0 || (bpp != 24 && bpp != 32) || w <= 0 || h == 0) return img;
  bool bottom_up = h > 0;
  int ah = std::abs(h);
  int src_c = bpp / 8;
  size_t row_stride = ((static_cast<size_t>(w) * src_c + 3) / 4) * 4;
  if (b.size() < data_off + row_stride * ah) return img;
  img.w = w;
  img.h = ah;
  img.c = 3;
  img.data.resize(static_cast<size_t>(w) * ah * 3);
  for (int y = 0; y < ah; ++y) {
    int src_y = bottom_up ? (ah - 1 - y) : y;
    const uint8_t* row =
        reinterpret_cast<const uint8_t*>(b.data()) + data_off + row_stride * src_y;
    for (int x = 0; x < w; ++x) {
      const uint8_t* px = row + static_cast<size_t>(x) * src_c;
      uint8_t* dst = img.data.data() + (static_cast<size_t>(y) * w + x) * 3;
      dst[0] = px[2];  // BMP stores BGR
      dst[1] = px[1];
      dst[2] = px[0];
    }
  }
  img.ok = true;
  return img;
}

// Raw RGB8 blob with an 8-byte header: uint32 h, uint32 w (little endian).
Image DecodeRaw(const std::string& b) {
  Image img;
  if (b.size() < 8) return img;
  uint32_t h, w;
  std::memcpy(&h, b.data(), 4);
  std::memcpy(&w, b.data() + 4, 4);
  size_t need = static_cast<size_t>(h) * w * 3;
  if (h == 0 || w == 0 || b.size() - 8 < need) return img;
  img.h = static_cast<int>(h);
  img.w = static_cast<int>(w);
  img.c = 3;
  img.data.assign(b.begin() + 8, b.begin() + 8 + need);
  img.ok = true;
  return img;
}

Image DecodeFile(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return {};
  std::string bytes((std::istreambuf_iterator<char>(f)),
                    std::istreambuf_iterator<char>());
  if (bytes.size() >= 2 && bytes[0] == 'P') return DecodePNM(bytes);
  if (bytes.size() >= 2 && bytes[0] == 'B' && bytes[1] == 'M') return DecodeBMP(bytes);
  std::string p(path);
  auto dot = p.rfind('.');
  if (dot != std::string::npos && p.substr(dot) == ".raw") return DecodeRaw(bytes);
  return {};
}

// ---------------------------------------------------------------------------
// Bilinear resize (align_corners=false, half-pixel centers — matches PIL/TF2
// bilinear used by the reference's keras resize) + [0,1] float32 normalize.
// ---------------------------------------------------------------------------
void ResizeNormalize(const Image& src, int out_h, int out_w, float* dst) {
  const float sy = static_cast<float>(src.h) / out_h;
  const float sx = static_cast<float>(src.w) / out_w;
  constexpr float kInv255 = 1.0f / 255.0f;
  for (int y = 0; y < out_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::clamp(static_cast<int>(std::floor(fy)), 0, src.h - 1);
    int y1 = std::min(y0 + 1, src.h - 1);
    float wy = std::clamp(fy - y0, 0.0f, 1.0f);
    for (int x = 0; x < out_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::clamp(static_cast<int>(std::floor(fx)), 0, src.w - 1);
      int x1 = std::min(x0 + 1, src.w - 1);
      float wx = std::clamp(fx - x0, 0.0f, 1.0f);
      for (int ch = 0; ch < 3; ++ch) {
        int sc = src.c == 1 ? 0 : ch;
        float a = src.data[(static_cast<size_t>(y0) * src.w + x0) * src.c + sc];
        float b = src.data[(static_cast<size_t>(y0) * src.w + x1) * src.c + sc];
        float c = src.data[(static_cast<size_t>(y1) * src.w + x0) * src.c + sc];
        float d = src.data[(static_cast<size_t>(y1) * src.w + x1) * src.c + sc];
        float top = a + (b - a) * wx;
        float bot = c + (d - c) * wx;
        dst[(static_cast<size_t>(y) * out_w + x) * 3 + ch] =
            (top + (bot - top) * wy) * kInv255;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// PNG encode (zlib deflate; filter 0 rows). The serving host is often a
// single core and PIL's encoder sits on the per-request critical path
// (serve_http.py::_png_bytes); this is the native replacement — the rebuilt
// analogue of the image IO the reference delegates to TF's C++ runtime.
// ---------------------------------------------------------------------------

void PutBE32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24); v.push_back(x >> 16); v.push_back(x >> 8); v.push_back(x);
}

void PutChunk(std::vector<uint8_t>& v, const char type[4],
              const uint8_t* data, size_t len) {
  PutBE32(v, static_cast<uint32_t>(len));
  size_t start = v.size();
  v.insert(v.end(), type, type + 4);
  if (len) v.insert(v.end(), data, data + len);
  uint32_t crc = crc32(0L, v.data() + start, static_cast<uInt>(len + 4));
  PutBE32(v, crc);
}

}  // namespace

extern "C" {

// Encode an (h, w, c) uint8 image (c == 1 or 3) as PNG into `out`.
// Returns bytes written, or -1 if out_cap is too small / inputs invalid.
// level: zlib compression level (1 = fast, serving default; 6 = zlib default).
int64_t shmgan_encode_png(const uint8_t* img, int h, int w, int c, int level,
                          uint8_t* out, int64_t out_cap) {
  if (!img || !out || h <= 0 || w <= 0 || (c != 1 && c != 3)) return -1;
  // raw stream: one filter byte (0) + row bytes, per scanline
  const size_t row = static_cast<size_t>(w) * c;
  std::vector<uint8_t> raw((row + 1) * h);
  for (int y = 0; y < h; ++y) {
    uint8_t* dst = raw.data() + static_cast<size_t>(y) * (row + 1);
    dst[0] = 0;  // filter type none
    std::memcpy(dst + 1, img + static_cast<size_t>(y) * row, row);
  }
  uLongf zcap = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> z(zcap);
  if (compress2(z.data(), &zcap, raw.data(), static_cast<uLong>(raw.size()),
                level) != Z_OK) {
    return -1;
  }

  std::vector<uint8_t> png;
  png.reserve(zcap + 128);
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  png.insert(png.end(), kSig, kSig + 8);
  uint8_t ihdr[13];
  // width, height big-endian
  ihdr[0] = static_cast<uint8_t>(w >> 24); ihdr[1] = static_cast<uint8_t>(w >> 16);
  ihdr[2] = static_cast<uint8_t>(w >> 8);  ihdr[3] = static_cast<uint8_t>(w);
  ihdr[4] = static_cast<uint8_t>(h >> 24); ihdr[5] = static_cast<uint8_t>(h >> 16);
  ihdr[6] = static_cast<uint8_t>(h >> 8);  ihdr[7] = static_cast<uint8_t>(h);
  ihdr[8] = 8;                      // bit depth
  ihdr[9] = (c == 3) ? 2 : 0;       // color type: truecolor / grayscale
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;  // deflate, adaptive, no interlace
  PutChunk(png, "IHDR", ihdr, sizeof(ihdr));
  PutChunk(png, "IDAT", z.data(), zcap);
  PutChunk(png, "IEND", nullptr, 0);

  if (static_cast<int64_t>(png.size()) > out_cap) return -1;
  std::memcpy(out, png.data(), png.size());
  return static_cast<int64_t>(png.size());
}

// Decode `n` files into a preallocated (n, out_h, out_w, 3) float32 buffer.
// Returns the number of successfully decoded images; failures leave zeros and
// set status[i] = 0.
int shmgan_decode_batch(const char** paths, int n, int out_h, int out_w,
                        float* out, uint8_t* status, int num_threads) {
  std::atomic<int> next(0), ok_count(0);
  int workers = std::max(1, std::min(num_threads, n));
  auto work = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      Image img = DecodeFile(paths[i]);
      float* dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
      if (img.ok) {
        ResizeNormalize(img, out_h, out_w, dst);
        status[i] = 1;
        ok_count.fetch_add(1);
      } else {
        std::memset(dst, 0, sizeof(float) * out_h * out_w * 3);
        status[i] = 0;
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < workers; ++t) pool.emplace_back(work);
  for (auto& t : pool) t.join();
  return ok_count.load();
}

// Resize+normalize a single already-decoded RGB8 HWC image.
void shmgan_resize_normalize(const uint8_t* data, int h, int w, int c, int out_h,
                             int out_w, float* out) {
  Image img;
  img.h = h;
  img.w = w;
  img.c = c;
  img.data.assign(data, data + static_cast<size_t>(h) * w * c);
  img.ok = true;
  ResizeNormalize(img, out_h, out_w, out);
}

// Channel-wise min across V aligned images (pseudo-diffuse synthesis,
// utils.py:68-123 semantics): in (V, H*W*3) float32 -> out (H*W*3).
void shmgan_estimate_diffuse(const float* views, int v, int64_t size, float* out) {
  std::memcpy(out, views, sizeof(float) * size);
  for (int i = 1; i < v; ++i) {
    const float* src = views + static_cast<int64_t>(i) * size;
    for (int64_t j = 0; j < size; ++j) out[j] = std::min(out[j], src[j]);
  }
}

}  // extern "C"
