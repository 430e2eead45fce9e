// Native host runtime for gpssim_tpu: bounded ring FIFO, streaming IQ file
// writer, and sample quantizer.
//
// C++ re-design of the reference's host runtime — the pthread FIFO
// (fifo.c: fixed pool of preallocated buffers, blocking acquire as
// real-time backpressure, wait_full start barrier, halt teardown) and the
// IQ file consumer thread (sdr_iqfile.c:22-77) — exposed through a plain C
// ABI for ctypes. The TPU compute path stays in JAX/Pallas; this library
// is the sink side of the producer/consumer pipeline, so Python never
// blocks on disk I/O and quantization runs vectorized native code.
//
// Build: tools/build_native.sh  (g++ -O3 -shared -fPIC)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Ring FIFO of fixed-size blocks (reference fifo.c semantics).
// ---------------------------------------------------------------------------
struct Fifo {
  explicit Fifo(int nbuf, long block_bytes)
      : block_bytes(block_bytes), storage(nbuf) {
    for (auto& b : storage) {
      b.resize(static_cast<size_t>(block_bytes));
      freelist.push_back(b.data());
    }
  }

  long block_bytes;
  std::vector<std::vector<uint8_t>> storage;
  std::deque<uint8_t*> freelist;           // fifo.c freelist
  std::deque<std::pair<uint8_t*, long>> q; // queued (buffer, payload bytes)
  std::mutex mu;
  std::condition_variable not_empty, not_full, full_once;
  bool halted = false;
  bool filled_once = false;

  // Producer: blocking acquire of a free buffer (fifo.c:128-148 — an empty
  // freelist is the backpressure signal).
  uint8_t* acquire() {
    std::unique_lock<std::mutex> lk(mu);
    while (freelist.empty() && !halted) {
      full_once.notify_all();
      filled_once = true;
      not_full.wait(lk);
    }
    if (halted) return nullptr;
    uint8_t* b = freelist.front();
    freelist.pop_front();
    return b;
  }

  bool enqueue(uint8_t* buf, long nbytes) {
    std::unique_lock<std::mutex> lk(mu);
    if (halted) return false;
    q.emplace_back(buf, nbytes);
    if (freelist.empty()) {
      filled_once = true;
      full_once.notify_all();
    }
    not_empty.notify_one();
    return true;
  }

  // Consumer: blocking dequeue; nullptr on halt-and-drained.
  uint8_t* dequeue(long* nbytes) {
    std::unique_lock<std::mutex> lk(mu);
    while (q.empty() && !halted) not_empty.wait(lk);
    if (q.empty()) return nullptr;
    auto [buf, n] = q.front();
    q.pop_front();
    if (nbytes) *nbytes = n;
    return buf;
  }

  void release(uint8_t* buf) {
    std::unique_lock<std::mutex> lk(mu);
    freelist.push_back(buf);
    not_full.notify_one();
  }

  // Stream-start barrier (fifo_wait_full, fifo.c:97-103).
  bool wait_full(double timeout_s) {
    std::unique_lock<std::mutex> lk(mu);
    auto dl = std::chrono::steady_clock::now() +
              std::chrono::duration_cast<std::chrono::steady_clock::duration>(
                  std::chrono::duration<double>(timeout_s));
    // Predicate form: a spurious wakeup must not end the wait early.
    full_once.wait_until(lk, dl, [&] { return filled_once || halted; });
    return filled_once;
  }

  // Teardown: wake everyone; consumers drain what is queued (fifo.c:105-126
  // clears the queue — here the writer drains so no samples are lost).
  void halt() {
    std::unique_lock<std::mutex> lk(mu);
    halted = true;
    not_empty.notify_all();
    not_full.notify_all();
    full_once.notify_all();
  }

  int depth_used() {
    std::unique_lock<std::mutex> lk(mu);
    return static_cast<int>(q.size());
  }
};

// ---------------------------------------------------------------------------
// Streaming file writer: FIFO + drain thread (sdr_iqfile.c:22-77).
// ---------------------------------------------------------------------------
struct Writer {
  Writer(const char* path, int nbuf, long block_bytes)
      : fifo(nbuf, block_bytes) {
    fp = std::fopen(path, "wb");
    if (fp) th = std::thread(&Writer::drain, this);
  }

  Fifo fifo;
  std::FILE* fp = nullptr;
  std::thread th;
  std::atomic<long long> bytes_written{0};
  std::atomic<bool> io_error{false};

  void drain() {
    for (;;) {
      long n = 0;
      uint8_t* buf = fifo.dequeue(&n);
      if (!buf) return;  // halted and drained
      size_t w = std::fwrite(buf, 1, static_cast<size_t>(n), fp);
      if (w != static_cast<size_t>(n)) io_error = true;
      bytes_written += static_cast<long long>(w);
      fifo.release(buf);
    }
  }

  // Copy caller data into ring buffers; blocks when the ring is full —
  // that blocking IS the real-time pacing of the pipeline.
  bool write(const uint8_t* data, long nbytes) {
    while (nbytes > 0) {
      uint8_t* buf = fifo.acquire();
      if (!buf) return false;
      long n = nbytes < fifo.block_bytes ? nbytes : fifo.block_bytes;
      std::memcpy(buf, data, static_cast<size_t>(n));
      if (!fifo.enqueue(buf, n)) return false;
      data += n;
      nbytes -= n;
    }
    return !io_error;
  }

  int close() {
    fifo.halt();
    if (th.joinable()) th.join();
    int rc = 0;
    if (fp) {
      if (std::fclose(fp) != 0) rc = -1;
      fp = nullptr;
    }
    return io_error ? -2 : rc;
  }

  ~Writer() {
    if (fp) close();
  }
};

}  // namespace

extern "C" {

// ---- FIFO C ABI ----
void* gfifo_create(int nbuf, long block_bytes) {
  return new Fifo(nbuf, block_bytes);
}
void gfifo_destroy(void* f) { delete static_cast<Fifo*>(f); }
void* gfifo_acquire(void* f) { return static_cast<Fifo*>(f)->acquire(); }
int gfifo_enqueue(void* f, void* buf, long nbytes) {
  return static_cast<Fifo*>(f)->enqueue(static_cast<uint8_t*>(buf), nbytes);
}
void* gfifo_dequeue(void* f, long* nbytes) {
  return static_cast<Fifo*>(f)->dequeue(nbytes);
}
void gfifo_release(void* f, void* buf) {
  static_cast<Fifo*>(f)->release(static_cast<uint8_t*>(buf));
}
int gfifo_wait_full(void* f, double timeout_s) {
  return static_cast<Fifo*>(f)->wait_full(timeout_s);
}
void gfifo_halt(void* f) { static_cast<Fifo*>(f)->halt(); }
int gfifo_depth_used(void* f) { return static_cast<Fifo*>(f)->depth_used(); }

// ---- Writer C ABI ----
void* gwriter_open(const char* path, int nbuf, long block_bytes) {
  Writer* w = new Writer(path, nbuf, block_bytes);
  if (!w->fp) {
    delete w;
    return nullptr;
  }
  return w;
}
int gwriter_write(void* w, const void* data, long nbytes) {
  return static_cast<Writer*>(w)->write(static_cast<const uint8_t*>(data),
                                        nbytes);
}
int gwriter_depth_used(void* w) {
  return static_cast<Writer*>(w)->fifo.depth_used();
}
long long gwriter_bytes_written(void* w) {
  return static_cast<Writer*>(w)->bytes_written.load();
}
int gwriter_close(void* w) {
  Writer* wr = static_cast<Writer*>(w);
  int rc = wr->close();
  delete wr;
  return rc;
}

// ---- Quantizer ----
// 16-bit accumulators → int8 via arithmetic >>4, exactly as the reference
// (gps.c:2841-2845). Auto-vectorizes under -O3.
void gquantize_16to8(const int16_t* in, int8_t* out, long n) {
  for (long i = 0; i < n; ++i) out[i] = static_cast<int8_t>(in[i] >> 4);
}

}  // extern "C"
