// sgrt_tpu native runtime — host-side IO + threading for the TPU renderer.
//
// TPU-native re-design of the reference's host runtime pieces:
//   * tinyobjloader (src/include/tiny_obj_loader.h, vendored 3.5k LoC) →
//     sgrt_read_obj: a minimal fast vertex scanner (the renderer only uses
//     `v x y z` lines, src/vrt/gaussians-from-file.cpp:31-42).
//   * stb_image_write PNG dump (src/volumetric-ray-tracer/main.cpp:306) →
//     sgrt_write_png: zlib-backed PNG encoder.
//   * gen-gif.sh (render N orbit frames → ffmpeg gif) → sgrt_write_gif:
//     in-process animated GIF89a with LZW.
//   * thread_pool_t (src/vrt/thread-pool.{h,cpp}: FIFO + condvar, dtor
//     joins) → the same pattern, used here for parallel frame encoding
//     (on TPU the *render* needs no host threads — XLA schedules — but
//     encoding an orbit of frames is host work and pipelines with device
//     rendering).
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links -lz)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// thread pool (FIFO queue + condvar; destructor drains and joins)
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(unsigned n) {
    if (n == 0) n = 1;
    workers_.reserve(n);
    for (unsigned i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void enqueue(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      tasks_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back(uint8_t(v >> 24));
  out.push_back(uint8_t(v >> 16));
  out.push_back(uint8_t(v >> 8));
  out.push_back(uint8_t(v));
}

void png_chunk(std::vector<uint8_t>& out, const char tag[4],
               const uint8_t* data, size_t len) {
  put_be32(out, uint32_t(len));
  size_t tag_pos = out.size();
  out.insert(out.end(), tag, tag + 4);
  out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + tag_pos, uInt(4 + len));
  put_be32(out, crc);
}

bool encode_png(int w, int h, const uint8_t* rgba, std::vector<uint8_t>& out) {
  // raw scanlines with filter byte 0
  std::vector<uint8_t> raw(size_t(h) * (size_t(w) * 4 + 1));
  for (int y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + size_t(y) * (size_t(w) * 4 + 1);
    row[0] = 0;
    std::memcpy(row + 1, rgba + size_t(y) * w * 4, size_t(w) * 4);
  }
  uLongf zcap = compressBound(uLong(raw.size()));
  std::vector<uint8_t> z(zcap);
  if (compress2(z.data(), &zcap, raw.data(), uLong(raw.size()), 6) != Z_OK)
    return false;

  out.clear();
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = uint8_t(w >> 24); ihdr[1] = uint8_t(w >> 16);
  ihdr[2] = uint8_t(w >> 8);  ihdr[3] = uint8_t(w);
  ihdr[4] = uint8_t(h >> 24); ihdr[5] = uint8_t(h >> 16);
  ihdr[6] = uint8_t(h >> 8);  ihdr[7] = uint8_t(h);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 6;   // RGBA
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  png_chunk(out, "IHDR", ihdr, 13);
  png_chunk(out, "IDAT", z.data(), zcap);
  png_chunk(out, "IEND", nullptr, 0);
  return true;
}

bool write_file(const char* path, const std::vector<uint8_t>& data) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  size_t n = std::fwrite(data.data(), 1, data.size(), f);
  std::fclose(f);
  return n == data.size();
}

// ---------------------------------------------------------------------------
// GIF (GIF89a, global 216-color cube palette, LZW)
// ---------------------------------------------------------------------------

class GifLzw {
 public:
  explicit GifLzw(std::vector<uint8_t>& out) : out_(out) {}

  void encode(const uint8_t* indices, size_t n) {
    out_.push_back(kMinCodeSize);
    reset_dict();
    int32_t prefix = -1;
    for (size_t i = 0; i < n; ++i) {
      uint8_t c = indices[i];
      if (prefix < 0) {
        prefix = c;
        continue;
      }
      int32_t nxt = find(prefix, c);
      if (nxt >= 0) {
        prefix = nxt;
      } else {
        emit(uint16_t(prefix));
        add(prefix, c);
        if (next_code_ > kMaxCode) {
          emit(kClear);
          reset_dict();
        }
        prefix = c;
      }
    }
    if (prefix >= 0) emit(uint16_t(prefix));
    emit(kEnd);
    flush_bits();
    flush_block();
    out_.push_back(0);  // block terminator
  }

 private:
  static constexpr int kMinCodeSize = 8;
  static constexpr uint16_t kClear = 256;
  static constexpr uint16_t kEnd = 257;
  static constexpr uint16_t kMaxCode = 4095;

  void reset_dict() {
    table_.assign(size_t(4096) * 256, -1);
    next_code_ = kEnd + 1;
    code_size_ = kMinCodeSize + 1;
  }
  int32_t find(int32_t prefix, uint8_t c) const {
    return table_[size_t(prefix) * 256 + c];
  }
  void add(int32_t prefix, uint8_t c) {
    if (next_code_ <= kMaxCode) {
      table_[size_t(prefix) * 256 + c] = next_code_;
      ++next_code_;
      if (next_code_ - 1 == (1 << code_size_) && code_size_ < 12) ++code_size_;
    }
  }
  void emit(uint16_t code) {
    bits_ |= uint32_t(code) << nbits_;
    nbits_ += code_size_;
    while (nbits_ >= 8) {
      block_[block_len_++] = uint8_t(bits_);
      bits_ >>= 8;
      nbits_ -= 8;
      if (block_len_ == 255) flush_block();
    }
  }
  void flush_bits() {
    while (nbits_ > 0) {
      block_[block_len_++] = uint8_t(bits_);
      bits_ >>= 8;
      nbits_ = nbits_ > 8 ? nbits_ - 8 : 0;
      if (block_len_ == 255) flush_block();
    }
  }
  void flush_block() {
    if (block_len_ == 0) return;
    out_.push_back(uint8_t(block_len_));
    out_.insert(out_.end(), block_, block_ + block_len_);
    block_len_ = 0;
  }

  std::vector<uint8_t>& out_;
  std::vector<int32_t> table_;
  uint16_t next_code_ = 0;
  int code_size_ = 0;
  uint32_t bits_ = 0;
  int nbits_ = 0;
  uint8_t block_[255];
  int block_len_ = 0;
};

inline uint8_t cube_index(uint8_t r, uint8_t g, uint8_t b) {
  // 6x6x6 color cube at palette offset 0
  int ri = (r * 5 + 127) / 255, gi = (g * 5 + 127) / 255, bi = (b * 5 + 127) / 255;
  return uint8_t(ri * 36 + gi * 6 + bi);
}

}  // namespace

extern "C" {

// Parse `v x y z` lines. out==nullptr → return count only. Returns vertex
// count, or -1 on IO error.
long sgrt_read_obj(const char* path, float* out, long cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long count = 0;
  char line[512];
  while (std::fgets(line, sizeof line, f)) {
    if (line[0] != 'v' || line[1] != ' ') continue;
    if (out != nullptr) {
      if (count >= cap) break;
      char* p = line + 2;
      char* end;
      float x = std::strtof(p, &end);
      float y = std::strtof(end, &end);
      float z = std::strtof(end, &end);
      out[count * 3 + 0] = x;
      out[count * 3 + 1] = y;
      out[count * 3 + 2] = z;
    }
    ++count;
  }
  std::fclose(f);
  return count;
}

// RGBA8 (h, w, 4) → PNG file. Returns 0 on success.
int sgrt_write_png(const char* path, int w, int h, const uint8_t* rgba) {
  std::vector<uint8_t> png;
  if (!encode_png(w, h, rgba, png)) return 1;
  return write_file(path, png) ? 0 : 2;
}

// Batch PNG writer over a thread pool: frames (n, h, w, 4) RGBA8 →
// paths[i]. Returns number of failures.
int sgrt_write_pngs(const char** paths, int n, int w, int h,
                    const uint8_t* rgba_frames, int threads) {
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  {
    ThreadPool pool(unsigned(threads > 0 ? threads
                                         : std::thread::hardware_concurrency()));
    const size_t frame_bytes = size_t(w) * h * 4;
    for (int i = 0; i < n; ++i) {
      const uint8_t* frame = rgba_frames + size_t(i) * frame_bytes;
      const char* path = paths[i];
      pool.enqueue([&, frame, path] {
        if (sgrt_write_png(path, w, h, frame) != 0) ++failures;
        {
          std::lock_guard<std::mutex> lock(mu);
          ++done;
        }
        cv.notify_one();
      });
    }
    std::unique_lock<std::mutex> lock(mu);
    cv.wait(lock, [&] { return done.load() == n; });
  }  // pool dtor joins
  return failures.load();
}

// Animated GIF89a from RGB8 frames (n, h, w, 3), delay in 1/100 s.
// Returns 0 on success.
int sgrt_write_gif(const char* path, int w, int h, int n,
                   const uint8_t* rgb_frames, int delay_cs) {
  std::vector<uint8_t> out;
  out.insert(out.end(), {'G', 'I', 'F', '8', '9', 'a'});
  out.push_back(uint8_t(w)); out.push_back(uint8_t(w >> 8));
  out.push_back(uint8_t(h)); out.push_back(uint8_t(h >> 8));
  out.push_back(0xF7);  // global color table, 256 entries, 8-bit color
  out.push_back(0);     // background
  out.push_back(0);     // aspect
  // palette: 216-entry color cube + grayscale tail
  for (int r = 0; r < 6; ++r)
    for (int g = 0; g < 6; ++g)
      for (int b = 0; b < 6; ++b) {
        out.push_back(uint8_t(r * 51));
        out.push_back(uint8_t(g * 51));
        out.push_back(uint8_t(b * 51));
      }
  for (int i = 216; i < 256; ++i) {
    uint8_t v = uint8_t((i - 216) * 255 / 39);
    out.push_back(v); out.push_back(v); out.push_back(v);
  }
  // netscape loop extension (loop forever)
  const uint8_t loop[] = {0x21, 0xFF, 0x0B, 'N', 'E', 'T', 'S', 'C', 'A',
                          'P', 'E', '2', '.', '0', 0x03, 0x01, 0x00, 0x00,
                          0x00};
  out.insert(out.end(), loop, loop + sizeof loop);

  std::vector<uint8_t> indices(size_t(w) * h);
  for (int fidx = 0; fidx < n; ++fidx) {
    const uint8_t* frame = rgb_frames + size_t(fidx) * w * h * 3;
    for (size_t p = 0; p < size_t(w) * h; ++p)
      indices[p] = cube_index(frame[p * 3], frame[p * 3 + 1], frame[p * 3 + 2]);
    // graphic control: delay
    out.insert(out.end(), {0x21, 0xF9, 0x04, 0x00});
    out.push_back(uint8_t(delay_cs)); out.push_back(uint8_t(delay_cs >> 8));
    out.push_back(0); out.push_back(0);
    // image descriptor
    out.push_back(0x2C);
    out.insert(out.end(), {0, 0, 0, 0});
    out.push_back(uint8_t(w)); out.push_back(uint8_t(w >> 8));
    out.push_back(uint8_t(h)); out.push_back(uint8_t(h >> 8));
    out.push_back(0);  // no local color table
    GifLzw lzw(out);
    lzw.encode(indices.data(), indices.size());
  }
  out.push_back(0x3B);  // trailer
  return write_file(path, out) ? 0 : 1;
}

}  // extern "C"
