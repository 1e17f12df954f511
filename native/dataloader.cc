// Threaded prefetching batch loader for point-cloud training.
//
// Native replacement for the reference's `DataLoader(num_workers=4,
// pin_memory=True)` host pipeline (aircraft_rotate.py:61): worker threads
// assemble training batches (shuffled shape selection + per-batch point
// subsampling) into a bounded ring of preallocated buffers while the TPU
// consumes the previous step, so host data work fully overlaps device
// compute.
//
// C API (ctypes-friendly; see diffusion_extensions_tpu/data/native.py):
//   dl_create(data, n_shapes, n_points, dim, batch, samples,
//             n_threads, seed, capacity) -> handle
//   dl_next(handle, out) -> 1 on success, 0 if the loader is stopping
//                           (out is untouched in that case)
//   dl_destroy(handle)
//
// Build: g++ -O3 -march=native -shared -fPIC -o libdxtdata.so dataloader.cc -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batch {
  std::vector<float> buf;
};

struct Loader {
  const float* data = nullptr;  // (n_shapes, n_points, dim), borrowed
  int64_t n_shapes = 0, n_points = 0, dim = 0;
  int64_t batch = 0, samples = 0;
  int64_t batch_floats = 0;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::queue<Batch*> ready;
  std::vector<Batch*> free_list;
  std::vector<Batch> storage;
  std::atomic<bool> stop{false};
  uint64_t seed = 0;

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_full.notify_all();
    cv_empty.notify_all();
    for (auto& t : workers) t.join();
  }
};

void worker_main(Loader* L, uint64_t worker_seed) {
  std::mt19937_64 rng(worker_seed);
  std::uniform_int_distribution<int64_t> pick_shape(0, L->n_shapes - 1);
  std::uniform_int_distribution<int64_t> pick_point(0, L->n_points - 1);
  const int64_t row_bytes = L->dim * sizeof(float);

  while (true) {
    Batch* b = nullptr;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_empty.wait(lk, [&] { return L->stop || !L->free_list.empty(); });
      if (L->stop) return;
      b = L->free_list.back();
      L->free_list.pop_back();
    }
    float* out = b->buf.data();
    for (int64_t i = 0; i < L->batch; ++i) {
      const float* shape = L->data + pick_shape(rng) * L->n_points * L->dim;
      float* row = out + i * L->samples * L->dim;
      if (L->samples == L->n_points) {
        std::memcpy(row, shape, L->n_points * row_bytes);
      } else {
        for (int64_t p = 0; p < L->samples; ++p) {
          std::memcpy(row + p * L->dim, shape + pick_point(rng) * L->dim,
                      row_bytes);
        }
      }
    }
    {
      std::lock_guard<std::mutex> lk(L->mu);
      L->ready.push(b);
    }
    L->cv_full.notify_one();
  }
}

}  // namespace

extern "C" {

void* dl_create(const float* data, int64_t n_shapes, int64_t n_points,
                int64_t dim, int64_t batch, int64_t samples,
                int64_t n_threads, uint64_t seed, int64_t capacity) {
  auto* L = new Loader();
  L->data = data;
  L->n_shapes = n_shapes;
  L->n_points = n_points;
  L->dim = dim;
  L->batch = batch;
  L->samples = samples;
  L->batch_floats = batch * samples * dim;
  L->seed = seed;
  if (capacity < 2) capacity = 2;
  L->storage.resize(capacity);
  for (auto& b : L->storage) {
    b.buf.resize(L->batch_floats);
    L->free_list.push_back(&b);
  }
  if (n_threads < 1) n_threads = 1;
  for (int64_t t = 0; t < n_threads; ++t) {
    L->workers.emplace_back(worker_main, L, seed * 0x9E3779B97F4A7C15ull + t);
  }
  return L;
}

int dl_next(void* handle, float* out) {
  auto* L = static_cast<Loader*>(handle);
  Batch* b = nullptr;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_full.wait(lk, [&] { return L->stop || !L->ready.empty(); });
    if (L->stop) return 0;  // stopping: out not written
    b = L->ready.front();
    L->ready.pop();
  }
  std::memcpy(out, b->buf.data(), L->batch_floats * sizeof(float));
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->free_list.push_back(b);
  }
  L->cv_empty.notify_one();
  return 1;
}

void dl_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
