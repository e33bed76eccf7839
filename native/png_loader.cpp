// Native data-loading path: from-scratch grayscale PNG codec + threaded
// batch decoder, exposed through a C ABI for ctypes.
//
// The framework's datasets are 8-bit grayscale PNGs written by the
// extraction pipeline; decoding them on the (single-threaded) Python side
// is the host bottleneck when feeding the TPU. This loader decodes a whole
// batch into one contiguous buffer with a thread pool, so the Python layer
// does a single memcpy-free hand-off to jax.device_put.
//
// Scope: PNG color type 0 (grayscale), bit depth 8, non-interlaced — exactly
// what the pipeline writes. Anything else returns an error and the Python
// wrapper falls back to cv2.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr unsigned char kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};

uint32_t be32(const unsigned char* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct PngInfo {
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
};

// Reads the whole file; returns false on IO error.
bool read_file(const char* path, std::vector<unsigned char>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0) { std::fclose(f); return false; }
  out.resize(size_t(size));
  size_t got = std::fread(out.data(), 1, size_t(size), f);
  std::fclose(f);
  return got == size_t(size);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Parses chunks, inflates IDAT, defilters. Returns 0 on success.
// Error codes: -1 io, -2 not png, -3 unsupported format, -4 corrupt,
//              -5 output buffer too small.
int decode_gray8(const char* path, unsigned char* out, long out_capacity,
                 int* height, int* width) {
  std::vector<unsigned char> file;
  if (!read_file(path, file)) return -1;
  if (file.size() < 8 || std::memcmp(file.data(), kSig, 8) != 0) return -2;

  PngInfo info;
  std::vector<unsigned char> idat;
  size_t pos = 8;
  bool saw_ihdr = false, saw_iend = false;
  while (pos + 8 <= file.size()) {
    uint32_t len = be32(&file[pos]);
    if (pos + 12 + len > file.size()) return -4;
    const char* type = reinterpret_cast<const char*>(&file[pos + 4]);
    const unsigned char* data = &file[pos + 8];
    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (len != 13) return -4;
      info.width = be32(data);
      info.height = be32(data + 4);
      info.bit_depth = data[8];
      info.color_type = data[9];
      info.interlace = data[12];
      saw_ihdr = true;
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      saw_iend = true;
      break;
    }
    pos += 12 + len;
  }
  if (!saw_ihdr || !saw_iend || idat.empty()) return -4;
  if (info.bit_depth != 8 || info.color_type != 0 || info.interlace != 0)
    return -3;

  const uint32_t w = info.width, h = info.height;
  if (w == 0 || h == 0) return -4;
  if (long(w) * long(h) > out_capacity) return -5;

  // inflate: one filter byte + w gray bytes per row
  const size_t raw_size = size_t(h) * (size_t(w) + 1);
  std::vector<unsigned char> raw(raw_size);
  uLongf dest_len = raw_size;
  if (uncompress(raw.data(), &dest_len, idat.data(), idat.size()) != Z_OK ||
      dest_len != raw_size)
    return -4;

  // defilter (bpp = 1 for gray8)
  for (uint32_t y = 0; y < h; ++y) {
    const unsigned char* src = &raw[size_t(y) * (w + 1)];
    unsigned char filter = src[0];
    const unsigned char* cur = src + 1;
    unsigned char* dst = out + size_t(y) * w;
    const unsigned char* up = y ? out + size_t(y - 1) * w : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(dst, cur, w);
        break;
      case 1:
        dst[0] = cur[0];
        for (uint32_t x = 1; x < w; ++x) dst[x] = cur[x] + dst[x - 1];
        break;
      case 2:
        for (uint32_t x = 0; x < w; ++x) dst[x] = cur[x] + (up ? up[x] : 0);
        break;
      case 3:
        for (uint32_t x = 0; x < w; ++x) {
          int a = x ? dst[x - 1] : 0;
          int b = up ? up[x] : 0;
          dst[x] = cur[x] + static_cast<unsigned char>((a + b) / 2);
        }
        break;
      case 4:
        for (uint32_t x = 0; x < w; ++x) {
          int a = x ? dst[x - 1] : 0;
          int b = up ? up[x] : 0;
          int c = (x && up) ? up[x - 1] : 0;
          dst[x] = cur[x] + static_cast<unsigned char>(paeth(a, b, c));
        }
        break;
      default:
        return -4;
    }
  }
  *height = int(h);
  *width = int(w);
  return 0;
}

// --------------------------------------------------------------- encoder
//
// Grayscale-8 PNG writer: filter 0 (None) rows + one zlib deflate pass.
// Filter None + a low zlib level is the right speed/size point for
// training-data pipelines (the decode side accepts any filter, so this
// is a private fast path, not a format restriction); the Sub/Up/Paeth
// filter search cv2 runs is most of its encode cost.

void put_be32(std::vector<unsigned char>& v, uint32_t x) {
  v.push_back((unsigned char)(x >> 24));
  v.push_back((unsigned char)(x >> 16));
  v.push_back((unsigned char)(x >> 8));
  v.push_back((unsigned char)x);
}

void put_chunk(std::vector<unsigned char>& out, const char* tag,
               const unsigned char* data, size_t len) {
  put_be32(out, (uint32_t)len);
  size_t tag_at = out.size();
  out.insert(out.end(), tag, tag + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + tag_at, (uInt)(4 + len));
  put_be32(out, crc);
}

// Returns 0 on success; -1 io, -4 deflate failure.
int encode_gray8(const char* path, const unsigned char* img, int h, int w,
                 int level) {
  // filtered stream: one 0x00 filter byte + w gray bytes per row
  std::vector<unsigned char> rawv(size_t(h) * (size_t(w) + 1));
  for (int y = 0; y < h; ++y) {
    unsigned char* row = rawv.data() + size_t(y) * (w + 1);
    row[0] = 0;
    std::memcpy(row + 1, img + size_t(y) * w, size_t(w));
  }
  uLongf bound = compressBound((uLong)rawv.size());
  std::vector<unsigned char> comp(bound);
  if (compress2(comp.data(), &bound, rawv.data(), (uLong)rawv.size(),
                level) != Z_OK)
    return -4;
  comp.resize(bound);

  std::vector<unsigned char> out;
  out.reserve(comp.size() + 128);
  out.insert(out.end(), kSig, kSig + 8);
  unsigned char ihdr[13];
  ihdr[0] = (unsigned char)(uint32_t(w) >> 24);
  ihdr[1] = (unsigned char)(uint32_t(w) >> 16);
  ihdr[2] = (unsigned char)(uint32_t(w) >> 8);
  ihdr[3] = (unsigned char)w;
  ihdr[4] = (unsigned char)(uint32_t(h) >> 24);
  ihdr[5] = (unsigned char)(uint32_t(h) >> 16);
  ihdr[6] = (unsigned char)(uint32_t(h) >> 8);
  ihdr[7] = (unsigned char)h;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 0;   // color type: grayscale
  ihdr[10] = ihdr[11] = ihdr[12] = 0;  // deflate, filter 0, no interlace
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", comp.data(), comp.size());
  put_chunk(out, "IEND", nullptr, 0);

  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  size_t wrote = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return wrote == out.size() ? 0 : -1;
}

}  // namespace

extern "C" {

// Decode one grayscale PNG. `out` must hold `out_capacity` bytes.
// Returns 0 and fills height/width on success; negative error code otherwise.
int msrt_decode_png(const char* path, unsigned char* out, long out_capacity,
                    int* height, int* width) {
  return decode_gray8(path, out, out_capacity, height, width);
}

// Decode `n` same-sized grayscale PNGs into `out` (n * item_h * item_w bytes)
// with `n_threads` workers. Every image must decode to exactly
// (item_h, item_w). Returns 0 on success, or the first error code seen.
int msrt_decode_batch(const char** paths, int n, unsigned char* out,
                      int item_h, int item_w, int n_threads) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> status(0);
  const long item = long(item_h) * long(item_w);

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || status.load() != 0) return;
      int h = 0, w = 0;
      int rc = decode_gray8(paths[i], out + long(i) * item, item, &h, &w);
      if (rc == 0 && (h != item_h || w != item_w)) rc = -6;  // size mismatch
      if (rc != 0) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
        return;
      }
    }
  };

  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads && t < n; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return status.load();
}

// Encode one (h, w) grayscale-8 image to `path` (zlib `level` 0-9).
// Returns 0 on success; negative error code otherwise.
int msrt_encode_png(const char* path, const unsigned char* img, int h,
                    int w, int level) {
  return encode_gray8(path, img, h, w, level);
}

// Encode `n` same-sized (item_h, item_w) grayscale images from one
// contiguous buffer with `n_threads` workers. Returns 0 on success, or
// the first error code seen.
int msrt_encode_batch(const char** paths, int n, const unsigned char* imgs,
                      int item_h, int item_w, int level, int n_threads) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> status(0);
  const long item = long(item_h) * long(item_w);

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || status.load() != 0) return;
      int rc = encode_gray8(paths[i], imgs + long(i) * item, item_h,
                            item_w, level);
      if (rc != 0) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
        return;
      }
    }
  };

  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads && t < n; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return status.load();
}

// Read only the header: fills height/width. Returns 0 on success.
int msrt_png_size(const char* path, int* height, int* width) {
  std::vector<unsigned char> file;
  if (!read_file(path, file)) return -1;
  if (file.size() < 33 || std::memcmp(file.data(), kSig, 8) != 0) return -2;
  if (std::memcmp(&file[12], "IHDR", 4) != 0) return -4;
  *width = int(be32(&file[16]));
  *height = int(be32(&file[20]));
  return 0;
}

}  // extern "C"
