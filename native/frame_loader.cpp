// Native frame loader: threaded PNG decode + SPSC ring buffer.
//
// The TPU-native equivalent of the reference's native ingest runtime — the
// OpenNI camera driver thread (/root/reference/src/PrimeSenseCam.cpp) and the
// ROS publisher processes that decoded/preprocessed frames concurrently with
// the solver (/root/reference/src/publisherPyD.cpp, camTopic2PublisherPyD.cpp).
// Here the "sensor" is a TUM RGB-D sequence on disk: a C++ worker pool
// decodes PNG pairs (8-bit gray/RGB + 16-bit depth) off the Python GIL and
// hands fixed-format frames to Python through a bounded ring buffer, keeping
// the TPU fed without host stalls.
//
// Exposed as a plain C API (ctypes-friendly; no pybind11 in this image):
//   fl_open(manifest, count, width, height, queue_depth, n_workers) -> handle
//   fl_next(handle, gray_out, depth_out, timestamp_out) -> index or -1 at end
//   fl_close(handle)
//   fl_decode_png_gray / fl_decode_png_depth16 -> one-shot decoders (tests)
//
// The manifest is a text blob: lines of "<timestamp> <gray_png> <depth_png>".
// Depth PNGs are TUM-convention uint16 (1/5000 m per unit); output depth is
// float32 millimetres with the 0 -> 1 sanitize applied
// (/root/reference/src/camTopic2PublisherPyD.cpp:72-80). Build: see
// native/Makefile (g++ -O3 -shared -lz -lpthread).

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// Minimal PNG decoder (enough for TUM RGB-D: 8-bit gray/RGB/RGBA and
// 16-bit gray, non-interlaced).
// ---------------------------------------------------------------------

struct PngImage {
  uint32_t width = 0, height = 0;
  int bit_depth = 0;   // 8 or 16
  int channels = 0;    // 1, 3 or 4
  std::vector<uint8_t> data;  // raw scanlines after unfilter, big-endian 16-bit
};

static uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

static int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

static bool decode_png(const uint8_t* buf, size_t len, PngImage* out) {
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (len < 8 || memcmp(buf, magic, 8) != 0) return false;
  size_t pos = 8;
  std::vector<uint8_t> idat;
  int color_type = -1, interlace = 0;
  while (pos + 8 <= len) {
    uint32_t clen = be32(buf + pos);
    const char* ctype = reinterpret_cast<const char*>(buf + pos + 4);
    const uint8_t* cdata = buf + pos + 8;
    if (pos + 12 + clen > len) return false;
    if (memcmp(ctype, "IHDR", 4) == 0) {
      out->width = be32(cdata);
      out->height = be32(cdata + 4);
      out->bit_depth = cdata[8];
      color_type = cdata[9];
      interlace = cdata[12];
      if (interlace != 0) return false;  // no Adam7
      switch (color_type) {
        case 0: out->channels = 1; break;
        case 2: out->channels = 3; break;
        case 6: out->channels = 4; break;
        default: return false;  // no palette
      }
      if (out->bit_depth != 8 && out->bit_depth != 16) return false;
    } else if (memcmp(ctype, "IDAT", 4) == 0) {
      idat.insert(idat.end(), cdata, cdata + clen);
    } else if (memcmp(ctype, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + clen;
  }
  if (out->width == 0 || idat.empty()) return false;

  const size_t bpp = size_t(out->channels) * (out->bit_depth / 8);
  const size_t stride = bpp * out->width;
  std::vector<uint8_t> raw((stride + 1) * out->height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK) return false;
  if (raw_len != raw.size()) return false;

  out->data.assign(stride * out->height, 0);
  std::vector<uint8_t> prev(stride, 0);
  for (uint32_t y = 0; y < out->height; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = out->data.data() + y * stride;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= bpp ? dst[x - bpp] : 0;
      int b = prev[x];
      int c = x >= bpp ? prev[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v);
    }
    memcpy(prev.data(), dst, stride);
  }
  return true;
}

// gray float 0..255 (BT.601 rounding like cv::cvtColor / the converter node)
static bool png_to_gray_f32(const uint8_t* buf, size_t len, float* out, int w, int h) {
  PngImage img;
  if (!decode_png(buf, len, &img)) return false;
  if (int(img.width) != w || int(img.height) != h || img.bit_depth != 8) return false;
  const size_t n = size_t(w) * h;
  if (img.channels == 1) {
    for (size_t i = 0; i < n; ++i) out[i] = float(img.data[i]);
  } else {
    const int ch = img.channels;
    for (size_t i = 0; i < n; ++i) {
      const uint8_t* p = img.data.data() + i * ch;
      float g = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
      out[i] = float(int(g + 0.5f));
    }
  }
  return true;
}

// TUM uint16 depth -> float32 mm with 0 -> 1 sanitize
static bool png_to_depth_mm(const uint8_t* buf, size_t len, float* out, int w, int h) {
  PngImage img;
  if (!decode_png(buf, len, &img)) return false;
  if (int(img.width) != w || int(img.height) != h) return false;
  if (img.bit_depth != 16 || img.channels != 1) return false;
  const size_t n = size_t(w) * h;
  for (size_t i = 0; i < n; ++i) {
    uint16_t v = (uint16_t(img.data[2 * i]) << 8) | img.data[2 * i + 1];  // PNG is BE
    float mm = float(v) / 5.0f;  // 5000 units/m -> mm
    out[i] = mm == 0.0f ? 1.0f : mm;
  }
  return true;
}

static bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(size_t(sz));
  size_t rd = fread(out->data(), 1, size_t(sz), f);
  fclose(f);
  return rd == size_t(sz);
}

// ---------------------------------------------------------------------
// Threaded loader with bounded in-order ring buffer
// ---------------------------------------------------------------------

struct Frame {
  std::vector<float> gray, depth;
  double timestamp = 0.0;
  int index = -1;
  bool ok = false;
};

struct Loader {
  int width = 0, height = 0;
  size_t depth_cap = 4;
  std::vector<double> timestamps;
  std::vector<std::string> gray_paths, depth_paths;

  std::mutex mu;
  std::condition_variable cv_slot, cv_ready;
  std::deque<Frame> ready;           // in-order completed frames
  std::atomic<int> next_to_fetch{0};  // next index a worker should take
  int next_to_emit = 0;               // next index fl_next returns
  std::vector<Frame> staging;         // out-of-order completions, keyed by idx
  std::vector<bool> staged;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    const size_t n = gray_paths.size();
    while (!stop.load()) {
      int idx = next_to_fetch.fetch_add(1);
      if (idx >= int(n)) break;
      Frame fr;
      fr.index = idx;
      fr.timestamp = timestamps[idx];
      fr.gray.resize(size_t(width) * height);
      fr.depth.resize(size_t(width) * height);
      std::vector<uint8_t> gbuf, dbuf;
      fr.ok = read_file(gray_paths[idx], &gbuf) && read_file(depth_paths[idx], &dbuf) &&
              png_to_gray_f32(gbuf.data(), gbuf.size(), fr.gray.data(), width, height) &&
              png_to_depth_mm(dbuf.data(), dbuf.size(), fr.depth.data(), width, height);
      // stage, then drain the contiguous prefix into the bounded ready queue.
      // NB: every predicate must be re-evaluated after waking from the slot
      // wait — another worker may have drained the frame we targeted.
      std::unique_lock<std::mutex> lk(mu);
      staging[idx] = std::move(fr);
      staged[idx] = true;
      while (true) {
        size_t e = size_t(next_to_emit) + ready.size();
        if (e >= n || !staged[e]) break;
        if (ready.size() >= depth_cap) {
          cv_slot.wait(lk, [&] { return ready.size() < depth_cap || stop.load(); });
          if (stop.load()) return;
          continue;  // re-derive e and re-check staged[e]
        }
        ready.push_back(std::move(staging[e]));
        staged[e] = false;  // consumed from staging; never push twice
        cv_ready.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

void* fl_open(const char* manifest, int width, int height, int queue_depth,
              int n_workers) {
  auto* L = new Loader();
  L->width = width;
  L->height = height;
  L->depth_cap = size_t(queue_depth > 0 ? queue_depth : 4);
  // manifest: lines "timestamp gray_path depth_path"
  std::string text(manifest);
  size_t pos = 0;
  while (pos < text.size()) {
    size_t eol = text.find('\n', pos);
    if (eol == std::string::npos) eol = text.size();
    std::string line = text.substr(pos, eol - pos);
    pos = eol + 1;
    if (line.empty()) continue;
    char g[4096], d[4096];
    double ts;
    if (sscanf(line.c_str(), "%lf %4095s %4095s", &ts, g, d) == 3) {
      L->timestamps.push_back(ts);
      L->gray_paths.emplace_back(g);
      L->depth_paths.emplace_back(d);
    }
  }
  size_t n = L->gray_paths.size();
  L->staging.resize(n);
  L->staged.assign(n, false);
  int nw = n_workers > 0 ? n_workers : 2;
  for (int i = 0; i < nw; ++i) L->workers.emplace_back(&Loader::worker, L);
  return L;
}

int fl_count(void* handle) { return int(static_cast<Loader*>(handle)->gray_paths.size()); }

// Blocks until the next in-order frame is decoded; copies into caller buffers.
// Returns frame index, -1 at end of stream, -2 on decode failure.
int fl_next(void* handle, float* gray_out, float* depth_out, double* ts_out) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_to_emit >= int(L->gray_paths.size())) return -1;
  L->cv_ready.wait(lk, [&] { return !L->ready.empty(); });
  Frame fr = std::move(L->ready.front());
  L->ready.pop_front();
  L->next_to_emit++;
  L->cv_slot.notify_all();
  lk.unlock();
  if (!fr.ok) return -2;
  const size_t n = size_t(L->width) * L->height;
  memcpy(gray_out, fr.gray.data(), n * sizeof(float));
  memcpy(depth_out, fr.depth.data(), n * sizeof(float));
  if (ts_out) *ts_out = fr.timestamp;
  return fr.index;
}

void fl_close(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_slot.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers)
    if (t.joinable()) t.join();
  delete L;
}

// one-shot decoders (testing / simple use)
int fl_decode_png_gray(const uint8_t* buf, long len, float* out, int w, int h) {
  return png_to_gray_f32(buf, size_t(len), out, w, h) ? 0 : -1;
}
int fl_decode_png_depth16(const uint8_t* buf, long len, float* out, int w, int h) {
  return png_to_depth_mm(buf, size_t(len), out, w, h) ? 0 : -1;
}

}  // extern "C"
