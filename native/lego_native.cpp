// Native host runtime for the TPU LeGO-LOAM pipeline.
//
// Replaces the reference's C++ plumbing layer — the Channel<T> mailbox
// (include/lego_loam/channel.h:11-56), the per-stage worker threads
// (main.cpp:9-43), and the hot decode loops (KittiLoader imageProjection.h:
// 127-219, PCL fromROSMsg) — with a small C library driven from Python via
// ctypes. Everything device-side lives in JAX; this is the host I/O path:
// scan decode, NaN-filter + pad ("prep"), and a double-buffered background
// feeder so disk/decode overlaps device compute.
//
// Build: make -C native   ->  liblego_native.so

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// --- prep: NaN filter + fixed-size pad in one pass ------------------------
// in:  pts (n x 3 float32, NaN rows = misses)
// out: buf (cap x 3 float32 zero-padded), mask (cap uint8)
// returns number of rows copied (min(n, cap))
int lego_prep_cloud(const float* pts, int n, int cap, float* buf,
                    uint8_t* mask) {
  int m = n < cap ? n : cap;
  for (int i = 0; i < m; ++i) {
    float x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
    bool ok = std::isfinite(x) && std::isfinite(y) && std::isfinite(z);
    buf[3 * i] = ok ? x : 0.f;
    buf[3 * i + 1] = ok ? y : 0.f;
    buf[3 * i + 2] = ok ? z : 0.f;
    mask[i] = ok ? 1 : 0;
  }
  std::memset(buf + 3 * m, 0, sizeof(float) * 3 * (cap - m));
  std::memset(mask + m, 0, cap - m);
  return m;
}

// --- strided PointCloud2 payload extraction -------------------------------
// data: raw CDR payload bytes; extracts float32 x/y/z at given offsets.
int lego_decode_pointcloud2(const uint8_t* data, int n_points, int point_step,
                            int x_off, int y_off, int z_off, float* out) {
  for (int i = 0; i < n_points; ++i) {
    const uint8_t* p = data + (size_t)i * point_step;
    std::memcpy(out + 3 * i, p + x_off, 4);
    std::memcpy(out + 3 * i + 1, p + y_off, 4);
    std::memcpy(out + 3 * i + 2, p + z_off, 4);
  }
  return n_points;
}

// --- KITTI .bin reader -----------------------------------------------------
// Reads (x, y, z, reflectance) float32 records; returns point count or -1.
int lego_read_kitti_bin(const char* path, float* out_xyz, int cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<float> rec(4);
  int n = 0;
  while (n < cap && std::fread(rec.data(), sizeof(float), 4, f) == 4) {
    out_xyz[3 * n] = rec[0];
    out_xyz[3 * n + 1] = rec[1];
    out_xyz[3 * n + 2] = rec[2];
    ++n;
  }
  std::fclose(f);
  return n;
}

// --- Channel + background scan feeder -------------------------------------
// A bounded MPSC mailbox with the reference Channel's two modes: blocking
// (backpressure, projection->FA, main.cpp:10) and latest-wins (FA->MO,
// main.cpp:11).

struct Slot {
  std::vector<float> buf;   // cap*3
  std::vector<uint8_t> mask;  // cap
  double timestamp = 0.0;
  long index = -1;
};

struct Feeder {
  int cap;                 // points per scan
  bool latest_wins;
  size_t depth;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::queue<Slot> q;
  std::atomic<bool> done{false};
  std::thread worker;
  std::vector<std::string> files;  // KITTI file list
  ~Feeder() {
    done.store(true);
    cv_push.notify_all();
    cv_pop.notify_all();
    if (worker.joinable()) worker.join();
  }
};

static void feeder_loop(Feeder* f) {
  long idx = 0;
  std::vector<float> raw((size_t)f->cap * 3);
  for (const auto& path : f->files) {
    if (f->done.load()) return;
    int n = lego_read_kitti_bin(path.c_str(), raw.data(), f->cap);
    if (n < 0) continue;
    Slot s;
    s.buf.resize((size_t)f->cap * 3);
    s.mask.resize(f->cap);
    lego_prep_cloud(raw.data(), n, f->cap, s.buf.data(), s.mask.data());
    s.timestamp = 0.1 * idx;
    s.index = idx++;
    {
      std::unique_lock<std::mutex> lk(f->mu);
      if (f->latest_wins) {
        while (f->q.size() >= f->depth) f->q.pop();  // drop oldest
      } else {
        f->cv_push.wait(lk, [&] {
          return f->q.size() < f->depth || f->done.load();
        });
        if (f->done.load()) return;
      }
      f->q.push(std::move(s));
    }
    f->cv_pop.notify_one();
  }
  f->done.store(true);
  f->cv_pop.notify_all();
}

void* lego_feeder_create(const char** paths, int n_files, int cap,
                         int latest_wins, int depth) {
  Feeder* f = new Feeder();
  f->cap = cap;
  f->latest_wins = latest_wins != 0;
  f->depth = depth > 0 ? (size_t)depth : 2;
  for (int i = 0; i < n_files; ++i) f->files.emplace_back(paths[i]);
  f->worker = std::thread(feeder_loop, f);
  return f;
}

// Pops the next prepped scan. Returns its index, or -1 when the stream ends.
long lego_feeder_next(void* handle, float* buf, uint8_t* mask,
                      double* timestamp) {
  Feeder* f = static_cast<Feeder*>(handle);
  Slot s;
  {
    std::unique_lock<std::mutex> lk(f->mu);
    f->cv_pop.wait(lk, [&] { return !f->q.empty() || f->done.load(); });
    if (f->q.empty()) return -1;
    s = std::move(f->q.front());
    f->q.pop();
  }
  f->cv_push.notify_one();
  std::memcpy(buf, s.buf.data(), sizeof(float) * 3 * f->cap);
  std::memcpy(mask, s.mask.data(), f->cap);
  *timestamp = s.timestamp;
  return s.index;
}

void lego_feeder_destroy(void* handle) {
  delete static_cast<Feeder*>(handle);
}

}  // extern "C"
