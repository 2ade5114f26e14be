// dpc_io: native host-side IO runtime for distropointclouds_tpu.
//
// The reference's performance-critical host work lives in third-party
// native libraries (numpy decode, Open3D voxel downsample, torch
// DataLoader worker processes — SURVEY §2). This library provides the
// equivalent native layer for the TPU framework's input pipeline:
//
//   * dpc_load_scan        — KITTI .bin decode straight into a caller-
//                            provided fixed-size padded float32 buffer
//                            (zero-copy into the staging buffer that
//                            feeds jax.device_put).
//   * dpc_loader_*         — a multi-threaded prefetching batch loader:
//                            worker threads read+pad scans into a
//                            bounded ring of staging buffers while the
//                            TPU consumes previous batches (replaces
//                            torch DataLoader workers + pin_memory).
//   * dpc_voxel_downsample — hash-grid centroid voxel downsample with
//                            Open3D voxel_down_sample semantics
//                            (index = floor((p - min_bound)/voxel),
//                            centroid per occupied voxel).
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <atomic>
#include <cmath>
#include <limits>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Scan decode
// ---------------------------------------------------------------------------

// Read a KITTI .bin (N x 4 float32) into out[max_points * 4], zero-padded.
// Returns the number of points stored (min(N, max_points)), or -1 on error.
int64_t dpc_load_scan(const char* path, float* out, int64_t max_points) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  const size_t want = static_cast<size_t>(max_points) * 4;
  size_t got = std::fread(out, sizeof(float), want, f);
  // Count total floats in the file to report the true point count
  // (truncated reads still fill the buffer completely).
  bool truncated = false;
  if (got == want) {
    float probe;
    truncated = std::fread(&probe, sizeof(float), 1, f) == 1;
  }
  std::fclose(f);
  if (got % 4 != 0 && !truncated) {
    // Malformed tail; drop the partial point.
    got -= got % 4;
  }
  std::memset(out + got, 0, (want - got) * sizeof(float));
  return static_cast<int64_t>(got / 4);
}

// ---------------------------------------------------------------------------
// Scan-context descriptor (host fast path)
// ---------------------------------------------------------------------------
//
// Exact golden-v2 semantics (scaner_version2.py:64-115 float32 math):
// x/y==0 -> 0.001, theta = atan2 deg mod 360, ring = min(floor(r/gap),
// R-1) [clamp policy] or dropped beyond max_length [drop policy], sector
// floor + clip, scatter-max of z, empty cells -> 0. The per-cell grid
// (R*S*4 bytes = 450 KB) lives in L2, so the random-access scatter that
// is slow on TPUs (no atomics, vector-wide memory) runs at a few cycles
// per point here. Used by the loader's descriptor mode so the device
// receives dense grids (8x smaller than raw points) and spends its time
// on the CNN.

struct ScParams {
  int32_t num_ring;
  int32_t num_sector;
  float max_length;
  int32_t edge_drop;          // 0 = clamp (golden), 1 = drop
  int32_t full_height_range;  // 1 = raw z, 0 = z + offset
  float height_offset;
  int32_t zero_substitution;  // 1 = x/y==0 -> 0.001
};

int32_t dpc_scan_context(const float* xyzi, int64_t n, int64_t stride,
                         const ScParams* p, float* out_grid) {
  const int32_t R = p->num_ring, S = p->num_sector;
  const float gap_ring = p->max_length / static_cast<float>(R);
  const float gap_sector = 360.0f / static_cast<float>(S);
  const float NEG = -std::numeric_limits<float>::infinity();
  std::vector<float> grid(static_cast<size_t>(R) * S,
                          p->full_height_range ? NEG : 0.0f);
  const float rad2deg = 180.0f / static_cast<float>(M_PI);
  for (int64_t i = 0; i < n; ++i) {
    float x = xyzi[i * stride + 0];
    float y = xyzi[i * stride + 1];
    float z = xyzi[i * stride + 2];
    if (p->zero_substitution) {
      if (x == 0.0f) x = 0.001f;
      if (y == 0.0f) y = 0.001f;
    }
    if (!p->full_height_range) z += p->height_offset;
    float theta = std::atan2(y, x) * rad2deg;
    theta = std::fmod(theta, 360.0f);
    if (theta < 0.0f) theta += 360.0f;  // numpy % semantics
    float r = std::sqrt(x * x + y * y);
    int32_t ring, sector;
    if (p->edge_drop) {
      if (!(r <= p->max_length)) continue;
      ring = static_cast<int32_t>(std::floor(r / gap_ring));
      if (ring < 0) ring = 0;
      if (ring > R - 1) ring = R - 1;
    } else {
      float fr = std::floor(r / gap_ring);
      float clamped = fr < static_cast<float>(R - 1)
                          ? fr
                          : static_cast<float>(R - 1);
      ring = static_cast<int32_t>(clamped);
    }
    sector = static_cast<int32_t>(std::floor(theta / gap_sector));
    if (sector > S - 1) sector = S - 1;
    if (sector < 0) sector = 0;
    float& cell = grid[static_cast<size_t>(ring) * S + sector];
    if (z > cell) cell = z;
  }
  if (p->full_height_range) {
    for (auto& v : grid)
      if (v == NEG) v = 0.0f;
  }
  std::memcpy(out_grid, grid.data(), grid.size() * sizeof(float));
  return 0;
}

// ---------------------------------------------------------------------------
// Voxel downsample (Open3D-compatible centroid semantics)
// ---------------------------------------------------------------------------

// in: n x 3 float32. out: capacity x 3 float32. Returns number of
// centroids written (one per occupied voxel), or -1 if capacity too small.
int64_t dpc_voxel_downsample(const float* in, int64_t n, float voxel,
                             float* out, int64_t capacity) {
  if (n <= 0) return 0;
  float mn[3] = {in[0], in[1], in[2]};
  for (int64_t i = 1; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      float v = in[i * 3 + d];
      if (v < mn[d]) mn[d] = v;
    }
  }
  struct Acc {
    double sum[3] = {0, 0, 0};
    int64_t count = 0;
  };
  std::unordered_map<uint64_t, Acc> cells;
  cells.reserve(static_cast<size_t>(n));
  const double inv = 1.0 / static_cast<double>(voxel);
  for (int64_t i = 0; i < n; ++i) {
    const float* p = in + i * 3;
    // 21 bits per axis (enough for ~2e6 voxels per axis).
    uint64_t ix = static_cast<uint64_t>(
        static_cast<int64_t>(std::floor((p[0] - mn[0]) * inv)) & 0x1FFFFF);
    uint64_t iy = static_cast<uint64_t>(
        static_cast<int64_t>(std::floor((p[1] - mn[1]) * inv)) & 0x1FFFFF);
    uint64_t iz = static_cast<uint64_t>(
        static_cast<int64_t>(std::floor((p[2] - mn[2]) * inv)) & 0x1FFFFF);
    uint64_t key = (ix << 42) | (iy << 21) | iz;
    Acc& a = cells[key];
    a.sum[0] += p[0];
    a.sum[1] += p[1];
    a.sum[2] += p[2];
    a.count++;
  }
  if (static_cast<int64_t>(cells.size()) > capacity) return -1;
  int64_t k = 0;
  for (const auto& kv : cells) {
    out[k * 3 + 0] = static_cast<float>(kv.second.sum[0] / kv.second.count);
    out[k * 3 + 1] = static_cast<float>(kv.second.sum[1] / kv.second.count);
    out[k * 3 + 2] = static_cast<float>(kv.second.sum[2] / kv.second.count);
    ++k;
  }
  return k;
}

// ---------------------------------------------------------------------------
// Prefetching batch loader
// ---------------------------------------------------------------------------

struct Batch {
  std::vector<float> data;     // batch * max_points * 4
  std::vector<float> grids;    // batch * R * S (descriptor mode only)
  std::vector<int64_t> counts; // batch
  int64_t first_index = 0;     // global sample index of first scan
  int64_t size = 0;            // live scans in this batch (<= batch)
};

struct Loader {
  std::vector<std::string> paths;
  int64_t max_points;
  int64_t batch;
  int64_t depth;
  bool loop;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  std::queue<Batch*> ready;
  int64_t next_batch_index = 0;  // producer cursor (batch units)
  int64_t total_batches = 0;
  std::atomic<bool> stop{false};
  // Producer start gate: production begins at the first dpc_loader_next*
  // call, never at create time. This makes dpc_loader_enable_sc (called
  // between create and the first next) race-free — without the gate the
  // producer could read a torn ScParams/sc_enabled mid-write and size
  // the grid buffer from garbage (observed as a rare segfault).
  bool started = false;

  // single-producer thread fills batches in order; multiple reader
  // threads parallelize the per-scan freads inside a batch.
  int threads_per_batch;

  // Descriptor mode: compute scan-context grids in the workers.
  bool sc_enabled = false;
  ScParams sc{};
};

static void fill_batch(Loader* L, Batch* b, int64_t batch_idx) {
  const int64_t n = static_cast<int64_t>(L->paths.size());
  const int64_t start = batch_idx * L->batch;
  const int64_t count = std::min(L->batch, n - start);
  b->first_index = start;
  b->size = count;
  b->data.resize(static_cast<size_t>(L->batch) * L->max_points * 4);
  b->counts.assign(static_cast<size_t>(L->batch), 0);

  const size_t grid_elems =
      L->sc_enabled
          ? static_cast<size_t>(L->sc.num_ring) * L->sc.num_sector
          : 0;
  if (L->sc_enabled) {
    b->grids.assign(static_cast<size_t>(L->batch) * grid_elems, 0.0f);
  }

  std::atomic<int64_t> cursor{0};
  auto work = [&]() {
    int64_t i;
    while ((i = cursor.fetch_add(1)) < count) {
      float* dst = b->data.data() +
                   static_cast<size_t>(i) * L->max_points * 4;
      int64_t c =
          dpc_load_scan(L->paths[start + i].c_str(), dst, L->max_points);
      b->counts[static_cast<size_t>(i)] = c < 0 ? 0 : c;
      if (L->sc_enabled && c > 0) {
        dpc_scan_context(dst, c, 4, &L->sc,
                         b->grids.data() + static_cast<size_t>(i) * grid_elems);
      }
    }
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < L->threads_per_batch; ++t) ts.emplace_back(work);
  work();
  for (auto& t : ts) t.join();
  // zero the padding rows of a short batch
  for (int64_t i = count; i < L->batch; ++i) {
    std::memset(b->data.data() + static_cast<size_t>(i) * L->max_points * 4,
                0, static_cast<size_t>(L->max_points) * 4 * sizeof(float));
  }
}

static void producer_main(Loader* L) {
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_space.wait(lk, [L] { return L->stop.load() || L->started; });
  }
  while (!L->stop.load()) {
    int64_t idx;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      if (L->next_batch_index >= L->total_batches) {
        if (!L->loop) break;
        L->next_batch_index = 0;
      }
      idx = L->next_batch_index++;
      L->cv_space.wait(lk, [L] {
        return L->stop.load() ||
               static_cast<int64_t>(L->ready.size()) < L->depth;
      });
      if (L->stop.load()) break;
    }
    Batch* b = new Batch();
    fill_batch(L, b, idx);
    {
      std::lock_guard<std::mutex> lk(L->mu);
      L->ready.push(b);
    }
    L->cv_ready.notify_one();
  }
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->ready.push(nullptr);  // end-of-stream marker
  }
  L->cv_ready.notify_all();
}

// paths: '\n'-separated file list. Returns opaque handle.
void* dpc_loader_create(const char* paths_joined, int64_t max_points,
                        int64_t batch, int64_t depth, int threads,
                        int loop) {
  Loader* L = new Loader();
  const char* p = paths_joined;
  while (*p) {
    const char* e = std::strchr(p, '\n');
    if (!e) e = p + std::strlen(p);
    if (e > p) L->paths.emplace_back(p, e - p);
    p = *e ? e + 1 : e;
  }
  L->max_points = max_points;
  L->batch = batch;
  L->depth = depth > 0 ? depth : 2;
  L->loop = loop != 0;
  L->threads_per_batch = threads > 0 ? threads : 4;
  L->total_batches =
      (static_cast<int64_t>(L->paths.size()) + batch - 1) / batch;
  L->workers.emplace_back(producer_main, L);
  return L;
}

int64_t dpc_loader_num_batches(void* handle) {
  return static_cast<Loader*>(handle)->total_batches;
}

// Enable descriptor mode. Must be called before the first
// dpc_loader_next* call; safe at any point between create and that call
// because the producer thread doesn't start filling until the gate in
// dpc_loader_next* opens.
void dpc_loader_enable_sc(void* handle, const ScParams* params) {
  Loader* L = static_cast<Loader*>(handle);
  L->sc = *params;
  L->sc_enabled = true;
}

// Like dpc_loader_next but also copies the per-scan descriptor grids
// (batch * R * S floats). Requires dpc_loader_enable_sc.
int64_t dpc_loader_next_sc(void* handle, float* out_points,
                           int64_t* counts, float* out_grids) {
  Loader* L = static_cast<Loader*>(handle);
  Batch* b;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    if (!L->started) {
      L->started = true;
      L->cv_space.notify_all();
    }
    L->cv_ready.wait(lk, [L] { return !L->ready.empty(); });
    b = L->ready.front();
    L->ready.pop();
  }
  L->cv_space.notify_one();
  if (b == nullptr) return -1;
  if (out_points)
    std::memcpy(out_points, b->data.data(), b->data.size() * sizeof(float));
  std::memcpy(counts, b->counts.data(), b->counts.size() * sizeof(int64_t));
  if (out_grids && !b->grids.empty())
    std::memcpy(out_grids, b->grids.data(), b->grids.size() * sizeof(float));
  int64_t size = b->size;
  delete b;
  return size;
}

// Blocks for the next batch. Copies into out (batch*max_points*4 floats)
// and counts (batch int64). Returns live-scan count, or -1 at
// end-of-stream.
int64_t dpc_loader_next(void* handle, float* out, int64_t* counts) {
  Loader* L = static_cast<Loader*>(handle);
  Batch* b;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    if (!L->started) {
      L->started = true;
      L->cv_space.notify_all();
    }
    L->cv_ready.wait(lk, [L] { return !L->ready.empty(); });
    b = L->ready.front();
    L->ready.pop();
  }
  L->cv_space.notify_one();
  if (b == nullptr) return -1;
  std::memcpy(out, b->data.data(), b->data.size() * sizeof(float));
  std::memcpy(counts, b->counts.data(),
              b->counts.size() * sizeof(int64_t));
  int64_t size = b->size;
  delete b;
  return size;
}

void dpc_loader_destroy(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  while (!L->ready.empty()) {
    delete L->ready.front();
    L->ready.pop();
  }
  delete L;
}

}  // extern "C"
