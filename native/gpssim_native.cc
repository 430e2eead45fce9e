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

#include <algorithm>
#include <atomic>
#include <cerrno>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <chrono>
#include <fcntl.h>
#include <mutex>
#include <poll.h>
#include <thread>
#include <unistd.h>
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

  bool empty_and_live() {
    std::unique_lock<std::mutex> lk(mu);
    return q.empty() && !halted;
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

// ---------------------------------------------------------------------------
// Realtime TX streamer: FIFO + paced drain thread over a file descriptor
// (socket, pipe, character device).
//
// Implements the reference's TX contract that the file sink skips:
//   * start-full barrier — transmission begins only once the FIFO has
//     filled once (fifo_wait_full, fifo.c:97-103; sdr_iqfile.c:74), so the
//     pre-buffer absorbs producer jitter from sample zero;
//   * hardware pacing — blocks leave at the sample rate (the role the
//     SDR's DAC clock plays in sdr_hackrf.c/sdr_pluto.c);
//   * underrun accounting — a block whose transmit time arrives while the
//     FIFO is empty is an underrun (the radio would have starved).
// ---------------------------------------------------------------------------
struct Streamer {
  Streamer(int fd, int nbuf, long block_bytes, double bytes_per_sec,
           double start_timeout_s)
      : fifo(nbuf, block_bytes), fd(fd), bytes_per_sec(bytes_per_sec),
        start_timeout_s(start_timeout_s) {
    // Non-blocking writes + poll: a peer that stops reading leaves the
    // drain in bounded 100 ms poll slices (abortable from finish())
    // instead of stuck forever inside a blocking ::write.
    int fl = fcntl(fd, F_GETFL, 0);
    if (fl >= 0) fcntl(fd, F_SETFL, fl | O_NONBLOCK);
    th = std::thread(&Streamer::drain, this);
  }

  Fifo fifo;
  int fd;
  double bytes_per_sec;   // 0 = unpaced (drain as fast as the fd accepts)
  double start_timeout_s;
  std::thread th;
  std::atomic<long long> bytes_sent{0};
  std::atomic<long> underruns{0};
  std::atomic<bool> io_error{false};
  std::atomic<bool> started{false};
  std::atomic<bool> drain_done{false};
  std::atomic<bool> abort_io{false};

  void drain() {
    drain_loop();
    drain_done = true;
  }

  void drain_loop() {
    // Start barrier: no byte leaves until the FIFO has filled once (or
    // the producer finished early / halted).
    fifo.wait_full(start_timeout_s);
    started = true;
    auto t0 = std::chrono::steady_clock::now();
    for (;;) {
      if (bytes_per_sec > 0.0) {
        // This block is due when every byte before it has left at the
        // DAC rate; a due-but-empty FIFO is an underrun.
        auto due = t0 + std::chrono::duration_cast<
                            std::chrono::steady_clock::duration>(
                            std::chrono::duration<double>(
                                bytes_sent.load() / bytes_per_sec));
        std::this_thread::sleep_until(due);
        if (fifo.empty_and_live()) ++underruns;
      }
      long n = 0;
      uint8_t* buf = fifo.dequeue(&n);
      if (!buf) return;  // halted and drained
      const uint8_t* p = buf;
      while (n > 0 && !io_error) {
        if (abort_io) {  // finish() gave up on a stalled peer
          io_error = true;
          break;
        }
        ssize_t w = ::write(fd, p, static_cast<size_t>(n));
        if (w < 0) {
          if (errno == EINTR) continue;
          if (errno == EAGAIN || errno == EWOULDBLOCK) {
            // A full send buffer is backpressure, not an I/O error:
            // wait for writability in short abortable slices.
            struct pollfd pfd = {fd, POLLOUT, 0};
            ::poll(&pfd, 1, 100);
            continue;
          }
          io_error = true;
          break;
        }
        p += w;
        n -= static_cast<long>(w);
        bytes_sent += static_cast<long long>(w);
      }
      fifo.release(buf);
      if (io_error) {
        // Nobody is reading: halt so the producer unblocks with an error
        // instead of deadlocking on acquire.
        fifo.halt();
        return;
      }
    }
  }

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

  // Halt and flush (the drain sends queued blocks at the paced rate);
  // idempotent, stats remain readable afterwards.  The flush is bounded:
  // past the deadline a stalled peer is abandoned (abort_io) rather than
  // hanging the caller forever.
  int finish(double flush_timeout_s = 10.0) {
    fifo.halt();
    if (th.joinable()) {
      auto deadline = std::chrono::steady_clock::now() +
                      std::chrono::duration_cast<
                          std::chrono::steady_clock::duration>(
                          std::chrono::duration<double>(flush_timeout_s));
      while (!drain_done && std::chrono::steady_clock::now() < deadline) {
        std::this_thread::sleep_for(std::chrono::milliseconds(5));
      }
      if (!drain_done) abort_io = true;  // drain exits within one poll slice
      th.join();
    }
    return io_error ? -2 : 0;
  }

  ~Streamer() { finish(); }
};

}  // namespace

// ---------------------------------------------------------------------------
// Sequential-parity engine.
//
// The reference advances each channel's code/carrier phase by repeated
// float64 accumulation inside the sample loop (gps.c:2789 `code_phase +=
// f_code*delt`, gps.c:2820 carrier), while the TPU framework uses the
// closed form `phase0 + n*step` (ops/plan.py) so blocks parallelize.  The
// two differ by a random-walk of rounding error — bounded by N half-ulps —
// and a sample whose phase lands inside that band around a chip/LUT
// boundary can quantize differently.  These helpers replay the *sequential*
// recurrences exactly (same IEEE-754 ops, no FMA contraction — see
// tools/build_native.sh) so the framework can
//   (a) chain block-boundary carrier phases with reference semantics
//       (gseq_carr_chain), and
//   (b) turn any closed-form block output into the sequential-exact stream
//       by patching the sparse set of boundary-straddling samples
//       (gseq_diff_block): it screens each sample's distance to the nearest
//       quantization boundary against a rigorous error bound and fully
//       evaluates only the ~0-2 candidates per block.
// ---------------------------------------------------------------------------

namespace {

constexpr double kCaLen = 1023.0;
// Screening margins (chips / LUT-index units).  Worst-case sequential-vs-
// closed-form divergence over a block: N adds, each rounding by at most
// half an ulp of the running value (code phase < 1024 → ulp ≤ 2^-43;
// carrier in [0,1) → ulp ≤ 2^-52), plus the closed form's two roundings:
//   code:    N*2^-43 ≈ 1.1e-7 chips                      (N = 1e6)
//   carrier: (N*2^-53 + ulp(N*dp))*512 ≈ 6e-8 index units
// The sample-major reference screen keeps a flat 1e-4 (~1000x margin,
// flags ~2e-4 of samples — evals are cheap relative to its full
// replay).  The fast screen flags gate the SEGMENT WALK length, so it
// uses the N-dependent rigorous bound x10 below: candidate counts drop
// from ~120/block to ~0, and the walk (which only needs to reach the
// last candidate) mostly vanishes.  Correctness never rests on the
// flag: every flagged sample is fully evaluated in both semantics, and
// the fuzz cross-check (tests/test_synth_seq.py) asserts the tight and
// wide screens produce identical corrections.
constexpr double kCodeMargin = 1e-4;
constexpr double kCarrMargin = 1e-4;

// 10x the rigorous worst case: N half-ulp roundings of the running code
// phase (< 1024 → ulp ≤ 2^-43, half-ulp 2^-44 ≈ 5.684e-14) plus the
// closed form's fl(n*dc) (≤ ulp(1.2e5)/2 ≈ 7.3e-12) and final-add
// (≤ 2^-44) roundings.
// Margins are linear in the sample index: slope * n + constant.  The
// whole-block screens query with the value at n = N (the conservative
// envelope); the per-candidate refinement re-tests a flagged sample n
// against the value at THAT n, which is what the bound actually proves
// — a candidate outside margin(n) cannot diverge at n, so the walk to
// it is skipped (measured: ~1.3 over-flagged candidates/block, each
// walking ~half a block — the dominant strict-corrections cost).
static inline double code_margin_slope() { return 10.0 * 5.684e-14; }
static inline double code_margin_const() { return 10.0 * 1.0e-11; }

// LUT-index units: 512 x (N half-ulp roundings of the phase in [0,1) →
// ulp ≤ 2^-53, half-ulp 2^-54 ≈ 5.552e-17) plus 512 x the closed
// form's fl(n*dp) / final-add roundings (≤ 1e-10 total for any block).
static inline double carr_margin_slope() { return 10.0 * 512.0 * 5.552e-17; }
static inline double carr_margin_const() { return 10.0 * 1.0e-10; }

struct SeqChan {
  double cp;        // sequential code phase, chips in [0, 1023)
  double dc;        // f_code * delt (single rounding, like gps.c:2789)
  double ph;        // sequential carrier phase, cycles in [0, 1)
  double dp;        // f_carr * delt
  uint32_t phi;     // 9.16 integer-NCO phase (int_nco mode; exact, no drift)
  uint32_t dphi;    // NCO step
  double cp0, c0;   // closed-form block-start values
  double gain;
  long icode, ibit, iword;       // sequential data-bit cascade
  long iword0, ibit0, icode0;    // block-start counters for the closed form
  int data_bit;                  // sequential ±1 data bit
  const int8_t* ca;              // 1023 chips {0,1}
  const uint32_t* dwrd;          // 60 nav words
};

// The reference hot loop's per-sample update (gps.c:2789-2829), minus the
// mixing: advance code phase with the wrap cascade, then carrier phase.
// Returns false on data-word overflow (invalid plan; Python raises).
inline bool seq_advance(SeqChan& ch, bool int_nco) {
  ch.cp += ch.dc;
  if (ch.cp >= kCaLen) {
    ch.cp -= kCaLen;
    if (++ch.icode >= 20) {  // 20 C/A codes = 1 data bit
      ch.icode = 0;
      if (++ch.ibit >= 30) {  // 30 bits = 1 word
        ch.ibit = 0;
        if (++ch.iword >= 60) return false;
      }
      ch.data_bit =
          static_cast<int>((ch.dwrd[ch.iword] >> (29 - ch.ibit)) & 1u) * 2 - 1;
    }
  }
  if (int_nco) {
    ch.phi += ch.dphi;
  } else {
    ch.ph += ch.dp;
    if (ch.ph >= 1.0)
      ch.ph -= 1.0;
    else if (ch.ph < 0.0)
      ch.ph += 1.0;
  }
  return true;
}

// Closed-form per-sample indices with the exact numpy elementwise op order
// (ops/synth_numpy.py): raw = fl(cp0 + fl(n*dc)), wraps = floor(raw/1023),
// chip = clip(trunc(raw - wraps*1023)), bitpos = (counters+wraps)/20, and
// itable = clip(floor(frac(fl(c0 + fl(n*dp)))*512)).
inline bool cf_indices(const SeqChan& ch, long n, bool int_nco,
                       uint32_t phi_n, long* chip, long* itable,
                       int* data_bit) {
  double raw = ch.cp0 + static_cast<double>(n) * ch.dc;
  double wrapsf = std::floor(raw / kCaLen);
  long c = static_cast<long>(raw - wrapsf * kCaLen);
  if (c < 0) c = 0;
  if (c > 1022) c = 1022;
  *chip = c;
  long total =
      ch.iword0 * 600 + ch.ibit0 * 20 + ch.icode0 + static_cast<long>(wrapsf);
  long bitpos = total / 20;
  long iw = bitpos / 30;
  long ib = bitpos - iw * 30;
  if (iw < 0 || iw >= 60) return false;
  *data_bit = static_cast<int>((ch.dwrd[iw] >> (29 - ib)) & 1u) * 2 - 1;
  if (int_nco) {
    // Integer NCO is exact: closed form == sequential by construction.
    *itable = static_cast<long>((phi_n >> 16) & 511u);
  } else {
    double carr = ch.c0 + static_cast<double>(n) * ch.dp;
    double frac = carr - std::floor(carr);
    long it = static_cast<long>(std::floor(frac * 512.0));
    if (it < 0) it = 0;
    if (it > 511) it = 511;
    *itable = it;
  }
  return true;
}

// Mixing contribution of one channel at one sample: the reference computes
// dataBit*codeCA*LUT (exact small-int product) * gain, truncated to int
// (gps.c:2781-2782).
inline void mix_contrib(const SeqChan& ch, long chip, long itable,
                        int data_bit, const double* sin_lut,
                        const double* cos_lut, int* ip, int* qp) {
  double s = static_cast<double>(data_bit * (ch.ca[chip] * 2 - 1));
  *ip = static_cast<int>(s * cos_lut[itable] * ch.gain);
  *qp = static_cast<int>(s * sin_lut[itable] * ch.gain);
}

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

// ---- Realtime TX streamer C ABI ----
void* gstream_open(int fd, int nbuf, long block_bytes, double bytes_per_sec,
                   double start_timeout_s) {
  return new Streamer(fd, nbuf, block_bytes, bytes_per_sec, start_timeout_s);
}
int gstream_write(void* s, const void* data, long nbytes) {
  return static_cast<Streamer*>(s)->write(static_cast<const uint8_t*>(data),
                                          nbytes);
}
int gstream_depth_used(void* s) {
  return static_cast<Streamer*>(s)->fifo.depth_used();
}
long long gstream_bytes_sent(void* s) {
  return static_cast<Streamer*>(s)->bytes_sent.load();
}
long gstream_underruns(void* s) {
  return static_cast<Streamer*>(s)->underruns.load();
}
int gstream_started(void* s) {
  return static_cast<Streamer*>(s)->started.load();
}
// Flush and stop the drain thread; the handle (and its stats) stays valid
// until gstream_close.
int gstream_finish(void* s, double flush_timeout_s) {
  return static_cast<Streamer*>(s)->finish(flush_timeout_s);
}
// End-of-stream marker WITHOUT waiting for the flush: halts the FIFO so
// the paced drain stops counting a drained-out tail as underruns (the
// stream is complete — no byte is late), then returns immediately.  A
// multi-stream producer calls this on EVERY sink before the per-sink
// blocking closes; otherwise sink k's flush wait would turn sinks k+1..N
// into false underrun counters.
int gstream_halt(void* s) {
  static_cast<Streamer*>(s)->fifo.halt();
  return 0;
}
int gstream_close(void* s) {
  Streamer* st = static_cast<Streamer*>(s);
  int rc = st->finish();
  delete st;
  return rc;
}

// ---- Sequential-parity engine ----

// Block-boundary carrier-phase chaining with the reference's sequential
// float64 semantics (gps.c:2820-2826), for a window of K consecutive
// 0.1 s blocks with per-block Doppler.  Inactive channels pass f_carr = 0
// (the add is then exact and the phase carries through unchanged).
//   carr0:  f64[C]   phase at the window start
//   f_carr: f64[K*C] per-block Doppler (row-major, block-major)
//   starts: f64[(K+1)*C] out; row j = phase at the start of block j,
//           row K = final end-of-window phase.
namespace {

// One reference step: p = fl(p + dp), then the single-subtract wrap
// (gps.c:2820-2826).
static inline double carr_step1(double p, double dp) {
  p = p + dp;
  p = (p >= 1.0) ? p - 1.0 : p;
  p = (p < 0.0) ? p + 1.0 : p;
  return p;
}

// Advance n sequential carrier steps, bit-exactly, in O(binade segments)
// instead of O(n): while consecutive results stay inside one binade, the
// IEEE round-to-nearest of (p + dp) is p's mantissa plus a CONSTANT
// integer step S = rint(dp/ulp) — an exact arithmetic progression — so
// whole segments fast-forward with integer math and only the
// binade/wrap-crossing steps run the scalar recurrence.  Falls back to
// scalar stepping for every irregular case (ties, subnormals, huge
// ratios), so exactness never depends on the fast path's coverage.
static double carr_advance_n(double p, double dp, long n) {
  if (dp == 0.0) {
    // fl(p + 0.0) == p for every p except -0.0 (then +0.0, stable after
    // one step).
    return (n > 0 && p == 0.0) ? 0.0 : p;
  }
  uint64_t dbits;
  std::memcpy(&dbits, &dp, 8);
  const int dsign = static_cast<int>(dbits >> 63);
  const int dexp = static_cast<int>((dbits >> 52) & 0x7FF);
  if (dexp == 0 || dexp == 0x7FF) {
    // Subnormal / inf / nan step: stay scalar.
    for (; n > 0; --n) p = carr_step1(p, dp);
    return p;
  }
  const int64_t dmant =
      static_cast<int64_t>((dbits & 0xFFFFFFFFFFFFFull) | (1ull << 52));
  const int64_t TOP = (int64_t(1) << 53) - 1;
  const int64_t BOT = int64_t(1) << 52;

  while (n > 0) {
    uint64_t pbits;
    std::memcpy(&pbits, &p, 8);
    const int pexp = static_cast<int>((pbits >> 52) & 0x7FF);
    if (!(p > 0.0) || p >= 1.0 || pexp == 0) {
      // p <= 0, out of range, or subnormal: scalar.
      p = carr_step1(p, dp);
      --n;
      continue;
    }
    // p = pmant * 2^(pexp-1075), pmant in [2^52, 2^53);
    // S = round-nearest-even(dp / ulp) with ulp = 2^(pexp-1075):
    //   S = rne(dmant * 2^(dexp-pexp)).
    const int k = dexp - pexp;
    int64_t S;
    if (k > 0) {
      // |dp| spans the whole binade in one add: scalar handles the jump.
      p = carr_step1(p, dp);
      --n;
      continue;
    } else if (k == 0) {
      S = dmant;  // dp is an exact whole number of ulps: no residual
    } else {
      const int sh = -k;
      if (sh >= 54) {
        // |t| < 0.5 ulp and no tie possible: p is a fixed point — EXCEPT
        // exactly at the binade bottom with a negative residual in
        // (0.25, 0.5) ulp, where the sum rounds on the finer grid below
        // (fl(1.0 - 0.4*2^-52) = 1 - 2^-53, not 1.0): scalar handles it.
        if (dsign &&
            static_cast<int64_t>((pbits & 0xFFFFFFFFFFFFFull) |
                                 (1ull << 52)) == BOT &&
            sh == 54 && dmant > (int64_t(1) << 52)) {
          p = carr_step1(p, dp);
          --n;
          continue;
        }
        return p;
      }
      const int64_t low = dmant & ((int64_t(1) << sh) - 1);
      const int64_t half = int64_t(1) << (sh - 1);
      S = dmant >> sh;
      if (low > half) {
        S += 1;
      } else if (low == half) {
        // Rounding tie: the exact sum sits half an ulp between the two
        // candidates, and round-half-to-EVEN makes the progression exact
        // again — from an even mantissa every step lands even with the
        // even step T = S + (S & 1) (for either sign of dp), so the
        // binade jumps like any other instead of going all-scalar (a tie
        // binade otherwise degrades every step in it; measured ~26% of
        // walk iterations on realistic Doppler).  An odd mantissa takes
        // one scalar step, which RNE lands on an even mantissa.
        const int64_t mm = static_cast<int64_t>(
            (pbits & 0xFFFFFFFFFFFFFull) | (1ull << 52));
        if (mm & 1) {
          p = carr_step1(p, dp);
          --n;
          continue;
        }
        S += S & 1;
        if (S == 0) return p;  // dmant exactly half an ulp: fixed point
      }
    }
    if (dsign) S = -S;
    if (S == 0) {
      // Unreachable for normal dmant (>= 2^52 forces |S| >= 1 or a tie
      // for sh <= 53); stay scalar rather than claim a fixed point.
      p = carr_step1(p, dp);
      --n;
      continue;
    }
    // Downward room stops at BOT+1, not BOT: an arrival exactly at the
    // binade bottom with residual < -0.25 ulp rounds into the finer
    // binade below, off the progression (same edge as above).
    int64_t room = (S > 0) ? (TOP - static_cast<int64_t>(
                                        (pbits & 0xFFFFFFFFFFFFFull) |
                                        (1ull << 52))) /
                                 S
                           : (static_cast<int64_t>(
                                  (pbits & 0xFFFFFFFFFFFFFull) |
                                  (1ull << 52)) -
                              BOT - 1) /
                                 (-S);
    if (room <= 0) {
      p = carr_step1(p, dp);  // boundary-crossing step
      --n;
      continue;
    }
    const long take = room < n ? static_cast<long>(room) : n;
    const int64_t pmant =
        static_cast<int64_t>((pbits & 0xFFFFFFFFFFFFFull) | (1ull << 52)) +
        static_cast<int64_t>(take) * S;
    pbits = (pbits & 0xFFF0000000000000ull) |
            (static_cast<uint64_t>(pmant) & 0xFFFFFFFFFFFFFull);
    std::memcpy(&p, &pbits, 8);
    n -= take;
    if (n > 0) {
      p = carr_step1(p, dp);  // the step that exits the binade / wraps
      --n;
    }
  }
  return p;
}

}  // namespace

// Returns 0 on success, -1 if C exceeds the slot capacity (the caller
// must not treat the output as populated).
}  // extern "C" — reopened below; the fan-out helpers need C++ linkage

namespace {

// Shared channel-fan-out policy: GPSSIM_CHAIN_THREADS overrides (0/1 =
// serial; tests use it to exercise the threaded schedule on single-core
// hosts), else thread when the host has >= 4 cores and there are at
// least `min_work` channels worth of real work.  Bit-exactness is
// schedule-independent in every caller: channels touch disjoint state.
static long chan_threads(long n_channels, long min_work) {
  long nthreads = 1;
  if (const char* env = std::getenv("GPSSIM_CHAIN_THREADS")) {
    nthreads = std::atol(env);
  } else {
    unsigned hw = std::thread::hardware_concurrency();
    if (hw >= 4 && n_channels >= min_work)
      nthreads = (long)hw < n_channels ? (long)hw : n_channels;
  }
  return nthreads > n_channels ? n_channels : nthreads;
}

template <typename Fn>
static void fan_channels(long nthreads, long n_channels, Fn fn) {
  if (nthreads <= 1) {
    for (long c = 0; c < n_channels; ++c) fn(c);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(static_cast<size_t>(nthreads));
  for (long t = 0; t < nthreads; ++t) {
    pool.emplace_back([&, t] {
      for (long c = t; c < n_channels; c += nthreads) fn(c);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

long gseq_carr_chain(long C, long K, long N, double delt,
                     const double* carr0, const double* f_carr,
                     double* starts) {
  if (C > 64) return -1;
  // Each channel's chain is independent (disjoint reads and strided
  // writes), so channels fan out over threads on multi-core hosts —
  // this chain is the planner's hot path and otherwise serializes the
  // whole pipeline behind one core.  The spawn cost amortizes over K
  // blocks of real segment walking.
  auto chain_one = [&](long c) {
    double p = carr0[c];
    for (long j = 0; j < K; ++j) {
      starts[j * C + c] = p;
      p = carr_advance_n(p, f_carr[j * C + c] * delt, N);
    }
    starts[K * C + c] = p;
  };
  fan_channels(chan_threads(C, 4), C, chain_one);
  return 0;
}

// Brute-force reference for the fast-forward above (test hook): the plain
// per-sample recurrence.
void gseq_carr_advance_brute(double* p, double dp, long n) {
  double v = *p;
  for (long i = 0; i < n; ++i) v = carr_step1(v, dp);
  *p = v;
}

// Fast-forward entry for the fuzz test.
void gseq_carr_advance_fast(double* p, double dp, long n) {
  *p = carr_advance_n(*p, dp, n);
}

// Sparse corrections that turn a closed-form block (numpy/XLA/Pallas
// semantics, ops/plan.py) into the sequential-exact stream: replays the
// reference recurrences, screens each sample's distance to the nearest
// chip/LUT boundary against the rigorous rounding bound, and fully
// evaluates only flagged candidates.  For each sample where the two
// semantics produce different I/Q accumulators, writes the sample index
// and the *sequential* int16 accumulator pair (absolute values, so the
// patch works after either 16-bit store or 8-bit >>4 quantization).
//
// Returns the number of corrections (>= 0), -1 on data-word overflow
// (invalid plan) or C > 16, -2 if max_out was too small.
//
// This is the straightforward sample-major float-domain replay, kept as
// the cross-check reference for the segmented fast path below
// (gseq_diff_block); tests assert their outputs are identical.
long gseq_diff_block_ref(
    long C, long N, double delt, int int_nco, const uint8_t* active,
    const double* code_phase, const double* f_code, const double* carr_phase,
    const double* f_carr, const uint32_t* carr_phase_i,
    const int32_t* carr_step_i, const double* gain, const int64_t* iword,
    const int64_t* ibit, const int64_t* icode, const int8_t* ca,
    const uint32_t* dwrd, const double* sin_lut, const double* cos_lut,
    long max_out, int64_t* out_idx, int16_t* out_i, int16_t* out_q,
    double* end_carr, uint32_t* end_carr_i, int want_end) {
  (void)want_end;  // the reference replay always materializes end state
  if (C > 16 || N < 0) return -1;
  SeqChan chs[16];
  long A = 0;  // active channel count (dense)
  long slot_of[16];
  for (long c = 0; c < C; ++c) {
    end_carr[c] = carr_phase[c];
    end_carr_i[c] = carr_phase_i[c];
    if (!active[c]) continue;
    SeqChan& ch = chs[A];
    ch.cp = ch.cp0 = code_phase[c];
    ch.dc = f_code[c] * delt;
    ch.ph = ch.c0 = carr_phase[c];
    ch.dp = f_carr[c] * delt;
    ch.phi = carr_phase_i[c];
    ch.dphi = static_cast<uint32_t>(carr_step_i[c]);
    ch.gain = gain[c];
    ch.iword = ch.iword0 = iword[c];
    ch.ibit = ch.ibit0 = ibit[c];
    ch.icode = ch.icode0 = icode[c];
    if (ch.iword < 0 || ch.iword >= 60) return -1;
    ch.data_bit =
        static_cast<int>((dwrd[c * 60 + ch.iword] >> (29 - ch.ibit)) & 1u) *
            2 - 1;
    ch.ca = ca + c * 1023;
    ch.dwrd = dwrd + c * 60;
    slot_of[A] = c;
    ++A;
  }

  long n_out = 0;
  for (long n = 0; n < N; ++n) {
    // Cheap screen: can any channel's quantized index differ between the
    // sequential and closed-form phase at this sample?
    bool candidate = false;
    for (long k = 0; k < A; ++k) {
      const SeqChan& ch = chs[k];
      double f = ch.cp - static_cast<double>(static_cast<long>(ch.cp));
      candidate |= (f < kCodeMargin) | (f > 1.0 - kCodeMargin);
      if (!int_nco) {
        double x = ch.ph * 512.0;
        double fx = x - std::floor(x);
        candidate |= (fx < kCarrMargin) | (fx > 1.0 - kCarrMargin);
      }
    }
    if (candidate) {
      int ia_s = 0, qa_s = 0, ia_c = 0, qa_c = 0;
      for (long k = 0; k < A; ++k) {
        SeqChan& ch = chs[k];
        // Sequential values at this sample (state as of loop entry).
        long chip_s = static_cast<long>(ch.cp);
        long it_s = int_nco
                        ? static_cast<long>((ch.phi >> 16) & 511u)
                        : static_cast<long>(std::floor(ch.ph * 512.0));
        if (it_s > 511) it_s = 511;  // ph*512 == 512.0 edge (see synth)
        int ip, qp;
        mix_contrib(ch, chip_s, it_s, ch.data_bit, sin_lut, cos_lut, &ip,
                    &qp);
        ia_s += ip;
        qa_s += qp;
        long chip_c, it_c;
        int db_c;
        if (!cf_indices(ch, n, int_nco != 0, ch.phi, &chip_c, &it_c, &db_c))
          return -1;
        mix_contrib(ch, chip_c, it_c, db_c, sin_lut, cos_lut, &ip, &qp);
        ia_c += ip;
        qa_c += qp;
      }
      if (ia_s != ia_c || qa_s != qa_c) {
        if (n_out >= max_out) return -2;
        out_idx[n_out] = n;
        out_i[n_out] = static_cast<int16_t>(ia_s);
        out_q[n_out] = static_cast<int16_t>(qa_s);
        ++n_out;
      }
    }
    for (long k = 0; k < A; ++k) {
      if (!seq_advance(chs[k], int_nco != 0)) return -1;
    }
  }

  for (long k = 0; k < A; ++k) {
    end_carr[slot_of[k]] = chs[k].ph;
    end_carr_i[slot_of[k]] = chs[k].phi;
  }
  return n_out;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fast screening path (the production gseq_diff_block).
//
// Same output as gseq_diff_block_ref, in O(hits) instead of O(samples):
//
// 1. Per channel, the candidate screen runs on the EXACT closed-form
//    progression in 2^-62 fixed point: chip/LUT boundary proximity is
//    "(a0 + n*step) mod 2^62 lands in a width-w window", and the hits of
//    an arithmetic progression in a modular window are found directly by
//    the O(log) Euclidean first-hit solver (first_hit_mod) — one query
//    per hit per block, no per-sample or per-binade work.  The window is
//    widened so the screen stays a conservative SUPERSET of the true
//    difference set: sequential-vs-closed-form divergence (< 2e-8 of a
//    chip/LUT unit per block), the closed form's own double rounding, and
//    the fixed-point quantization (< N+2 counts) are all orders of
//    magnitude inside the 1e-4 margin.
// 2. The sequential f64 state is only materialized where it is needed:
//    between consecutive flagged samples it fast-forwards in O(binade
//    segments) via the exact mantissa-progression lemma (seg_room, same
//    machinery as carr_advance_n), with every irregular step (binade or
//    wrap crossing, rounding tie) taken scalar.
// 3. Every flagged sample is fully evaluated in both semantics, so
//    over-flagging never changes the output, only costs a candidate eval.

namespace {

constexpr long kRoomMax = 1L << 60;

// Binade-segment parameters for v <- fl(v + dv): *S = exact mantissa step
// in ulps; returns the number of steps that provably stay in-binade and
// strictly below vcap (vcap <= 0: no cap).  0 => take one scalar step
// (irregular case); *fixed = the value never changes under this step.
static long seg_room(double v, double dv, double vcap, int64_t* S_out,
                     int64_t* mant_out, uint64_t* bits_out, int* pexp_out,
                     bool* fixed_out) {
  *fixed_out = false;
  *S_out = 0;
  *mant_out = 0;
  *bits_out = 0;
  *pexp_out = 0;
  if (!(v > 0.0)) return 0;
  uint64_t pbits;
  std::memcpy(&pbits, &v, 8);
  const int pexp = static_cast<int>((pbits >> 52) & 0x7FF);
  if (pexp == 0 || pexp == 0x7FF) return 0;  // subnormal / inf / nan
  const int64_t mant =
      static_cast<int64_t>((pbits & 0xFFFFFFFFFFFFFull) | (1ull << 52));
  *mant_out = mant;
  *bits_out = pbits;
  *pexp_out = pexp;
  if (dv == 0.0) {  // fl(v + 0) == v for v > 0: fixed point
    *fixed_out = true;
    return kRoomMax;
  }
  uint64_t dbits;
  std::memcpy(&dbits, &dv, 8);
  const int dsign = static_cast<int>(dbits >> 63);
  const int dexp = static_cast<int>((dbits >> 52) & 0x7FF);
  if (dexp == 0 || dexp == 0x7FF) return 0;  // subnormal/inf/nan step
  const int64_t dmant =
      static_cast<int64_t>((dbits & 0xFFFFFFFFFFFFFull) | (1ull << 52));
  const int k = dexp - pexp;
  int64_t S;
  if (k > 0) return 0;  // |dv| spans the whole binade in one add
  if (k == 0) {
    S = dmant;
  } else {
    const int sh = -k;
    if (sh >= 54) {
      // |step| < 0.5 ulp and no tie possible: fixed point — except
      // exactly at the binade bottom with a negative residual in
      // (0.25, 0.5) ulp, which rounds into the finer binade below
      // (fl(1.0 - 0.4*2^-52) = 1 - 2^-53): defer to the scalar step.
      if (dsign && mant == (int64_t(1) << 52) && sh == 54 &&
          dmant > (int64_t(1) << 52))
        return 0;
      *fixed_out = true;
      return kRoomMax;
    }
    const int64_t low = dmant & ((int64_t(1) << sh) - 1);
    const int64_t half = int64_t(1) << (sh - 1);
    S = dmant >> sh;
    if (low > half) {
      S += 1;
    } else if (low == half) {
      // Rounding tie: round-half-to-even keeps the progression exact
      // from an EVEN mantissa with the even step S + (S & 1) — same
      // lemma as carr_advance_n.  An odd mantissa defers to one scalar
      // step (which RNE lands even); the segment caches in the callers
      // preserve evenness (even step from even start).
      if (mant & 1) return 0;
      S += S & 1;
      if (S == 0) {  // dmant exactly half an ulp: even mantissa is fixed
        *fixed_out = true;
        return kRoomMax;
      }
    }
  }
  if (dsign) S = -S;
  if (S == 0) return 0;  // unreachable for normal dmant: stay scalar
  const int64_t TOP = (int64_t(1) << 53) - 1;
  const int64_t BOT = int64_t(1) << 52;
  long room;
  if (S > 0) {
    int64_t top = TOP;
    if (vcap > 0.0) {
      uint64_t cbits;
      std::memcpy(&cbits, &vcap, 8);
      const int cexp = static_cast<int>((cbits >> 52) & 0x7FF);
      if (cexp == pexp)
        top = static_cast<int64_t>((cbits & 0xFFFFFFFFFFFFFull) |
                                   (1ull << 52)) -
              1;
      else if (cexp < pexp)
        return 0;  // at/above the cap's binade: defer to scalar
    }
    room = static_cast<long>((top - mant) / S);
  } else {
    // Stop at BOT+1, not BOT: an arrival exactly at the binade bottom
    // with residual < -0.25 ulp rounds into the finer binade below, off
    // the progression (same edge as the sh >= 54 guard above).
    room = static_cast<long>((mant - BOT - 1) / (-S));
  }
  *S_out = S;
  return room;
}

static inline double mant_to_double(uint64_t tmpl_bits, int64_t mant) {
  const uint64_t b = (tmpl_bits & 0xFFF0000000000000ull) |
                     (static_cast<uint64_t>(mant) & 0xFFFFFFFFFFFFFull);
  double v;
  std::memcpy(&v, &b, 8);
  return v;
}

// Minimal j in [0, budget) with (a + j*s) mod m < w, or -1 if none
// exists below the budget.  Preconditions: 0 <= a < m, 0 <= s < m,
// 0 <= w <= m, budget >= 0.  Euclidean descent on the modulus
// (m, s) -> (s, (-m) mod s): O(log m) like gcd.  This is what makes the
// segment screen O(hits) instead of O(samples): a hit needs (a + j*s)
// to land in a width-w window mod m, and the first such j is found
// directly instead of scanning.
//
// The budget is threaded DOWN the descent, not just checked at the top:
// j(k2) = ceil(((k2+1)m - a)/s) is increasing in k2, so "j < budget"
// bounds the child problem to k2 + 1 <= ((budget-1)s + a)/m allowed
// values.  Since s <= m/2 after the reflection, the child budget at
// least halves per level — a screen query over N samples descends
// ~log2(N) levels instead of the full ~log(m) Euclid ladder (the screen
// issues 2 such queries per channel-block and hits are ~never below N,
// so the early-out is the common case and was measured as most of the
// strict-parity corrections cost).
static long long first_hit_mod(long long a, long long s, long long m,
                               long long w, long long budget) {
  if (w <= 0 || budget <= 0) return -1;
  if (a < w) return 0;
  if (s == 0) return -1;
  if (s > m - s) {
    // Reflect: t_j = (a + j*s) mod m lands in [0, w) iff the mirrored
    // progression (w-1-a + j*(m-s)) mod m does (same j — the window maps
    // onto itself under x -> w-1-x).  Keeps s <= m/2 so the descent
    // below halves the modulus at least every other level (the raw
    // recursion is LINEAR depth for s near m, e.g. s = m-1).
    long long ar = (w - 1 - a) % m;
    if (ar < 0) ar += m;
    return first_hit_mod(ar, m - s, m, w, budget);
  }
  // Need k >= 1 wraps: k*m <= a + j*s < k*m + w with j = ceil((k*m-a)/s),
  // valid iff the ceil residue r_k = (a - k*m) mod s < w.  Substituting
  // k = 1 + k2 turns "minimal valid k" into the same problem one level
  // down: r_k = ((a - m) mod s + k2 * ((-m) mod s)) mod s.
  // j < budget  <=>  (k2+1)m - a <= (budget-1)s  <=>  k2+1 <= b2 below.
  const long long b2 = static_cast<long long>(
      ((static_cast<__int128>(budget) - 1) * s + a) / m);
  if (b2 <= 0) return -1;
  const long long w2 = w < s ? w : s;
  long long a2 = (a - m) % s;
  if (a2 < 0) a2 += s;
  long long s2 = (-m) % s;
  if (s2 < 0) s2 += s;
  const long long k2 = first_hit_mod(a2, s2, s, w2, b2);
  if (k2 < 0) return -1;
  const __int128 num = (static_cast<__int128>(k2) + 1) * m - a;
  return static_cast<long long>((num + s - 1) / s);
}

// Whole-block candidate screen over the EXACT closed-form progression
// pos + n*step, flagging n where frac(scale*(pos + n*step)) is within
// `margin` (plus quantization slop) of an integer.  2^-62 fixed point:
// hit at n iff ((a + n*s) mod 2^62) < w, with the two-sided proximity
// window rotated to start at 0.
constexpr int64_t kFixM = int64_t(1) << 62;

struct GlobalScreen {
  int64_t a, s, w;
  // n-dependent refinement terms, in 2^-62 counts: a flagged sample n
  // is walked only if its boundary distance is within
  // W(n) = slope*n + cons + n + 2 — make_global's window with N -> n.
  double slope;
  double cons;
};

// frac(x) in 2^-62 fixed point.  x - floor(x) is exact for |x| < 2^53
// (both operands on the grid of ulp(x), result < 1 fits 53 bits); the
// ldexp scale is a power of two; nearbyint adds <= 0.5 counts, absorbed
// by the caller's slop.
static inline int64_t to_fix(double x) {
  const double f = x - std::floor(x);
  int64_t v = static_cast<int64_t>(std::nearbyint(std::ldexp(f, 62)));
  if (v >= kFixM) v -= kFixM;  // f < 1 keeps v < 2^62; pure defense
  if (v < 0) v = 0;
  return v;
}

static GlobalScreen make_global(double pos, double step, double scale,
                                double m_slope, double m_const, long N) {
  // scale is 1.0 or 512.0: scale*pos / scale*step are exact (power-of-2
  // multiply), so the only inexactness is the fixed-point rounding of
  // a0 (<= 0.5 counts) and of s (<= 0.5 counts, linearly accumulated to
  // <= N/2 counts by sample N) — widen the window by N+2 counts.
  const double margin = m_slope * static_cast<double>(N) + m_const;
  const int64_t W =
      static_cast<int64_t>(margin * static_cast<double>(kFixM)) + N + 2;
  const int64_t a0 = to_fix(scale * pos);
  const int64_t s = to_fix(scale * step);
  // Proximity window [0, W] u [M-W, M-1], rotated by +W to [0, 2W].
  int64_t a = a0 + W;
  if (a >= kFixM) a -= kFixM;
  return {a, s, 2 * W + 1, m_slope * static_cast<double>(kFixM),
          m_const * static_cast<double>(kFixM)};
}

// Refined per-candidate test: could sample n actually diverge?  The
// query window used margin(N); the bound at the candidate itself is
// margin(n) (sequential divergence and fixed-point slop both accumulate
// linearly in n), so a candidate outside that tighter window is proven
// identical in both semantics and needs no sequential walk.
static inline bool gs_hit_refined(const GlobalScreen& g, long n) {
  const int64_t t = static_cast<int64_t>(
      (static_cast<__int128>(g.s) * n + g.a) % kFixM);
  const int64_t Wc = (g.w - 1) / 2;  // the query half-width, margin(N)
  const int64_t Wn =
      static_cast<int64_t>(g.slope * static_cast<double>(n) + g.cons) + n + 2;
  int64_t d = t - Wc;
  if (d < 0) d = -d;
  return d <= Wn;
}

// First flagged sample in [n0, N) for this screen, or N if none.
static inline long gs_next(const GlobalScreen& g, long n0, long N) {
  if (n0 >= N) return N;
  const int64_t an = static_cast<int64_t>(
      (static_cast<__int128>(g.s) * n0 + g.a) % kFixM);
  const long long h = first_hit_mod(an, g.s, kFixM, g.w, N - n0);
  if (h < 0 || h >= N - n0) return N;
  return n0 + static_cast<long>(h);
}

// Advance a channel's sequential f64 state by exactly `steps` samples,
// no screening: whole binade segments jump via the exact mantissa
// progression; irregular steps (binade/wrap crossings, ties) go scalar
// through seq_advance, which also runs the data-bit cascade at code
// wraps.  false on data-word overflow (invalid plan).
// This walks the CODE dimension only (code phase + cascade; the scalar
// step's phi side-advance is unused in float mode).  It serves both the
// integer-NCO mode (carrier exact closed-form) and — since the code and
// carrier recurrences are independent (gps.c:2789-2829) — the float
// mode's code-flagged candidates, whose carrier dimension is walked
// separately by carr_advance_n only when its own screen flags.  The
// former joint min-interleave walk (seq_ff_float) is gone with it.
static bool seq_ff_nco(SeqChan& ch, long steps) {
  while (steps > 0) {
    int64_t Sc, mc;
    uint64_t cb;
    int ce;
    bool cfix;
    long L = seg_room(ch.cp, ch.dc, kCaLen, &Sc, &mc, &cb, &ce, &cfix);
    if (L > steps) L = steps;
    if (L <= 0) {
      if (!seq_advance(ch, true)) return false;
      --steps;
      continue;
    }
    if (!cfix) ch.cp = mant_to_double(cb, mc + L * Sc);
    steps -= L;
  }
  return true;
}

struct Delta {
  long n;
  int di, dq;
};

// Evaluate one flagged sample in both semantics; append the per-channel
// contribution difference (usually none).  false on invalid plan.
//
// code_is_seq / carr_is_seq say which dimensions were actually walked
// sequentially to n: a dimension whose screen did NOT flag n (at its
// refined margin) is PROVEN index-identical in both semantics there, so
// its closed-form index substitutes exactly and the sequential walk of
// that dimension is skipped entirely by the caller.
static bool eval_candidate(const SeqChan& ch, long n, double cp_n,
                           double ph_n, bool int_nco, uint32_t phi0,
                           bool code_is_seq, bool carr_is_seq,
                           const double* sin_lut, const double* cos_lut,
                           std::vector<Delta>* deltas) {
  const uint32_t phi_n =
      phi0 + static_cast<uint32_t>(static_cast<uint64_t>(n) * ch.dphi);
  long chip_c, it_c;
  int db_c;
  if (!cf_indices(ch, n, int_nco, phi_n, &chip_c, &it_c, &db_c)) return false;
  const long chip_s = code_is_seq ? static_cast<long>(cp_n) : chip_c;
  const int db_s = code_is_seq ? ch.data_bit : db_c;
  long it_s;
  if (int_nco) {
    it_s = static_cast<long>((phi_n >> 16) & 511u);
  } else if (carr_is_seq) {
    it_s = static_cast<long>(std::floor(ph_n * 512.0));
    if (it_s > 511) it_s = 511;  // ph*512 == 512.0 edge (see synth loop)
  } else {
    it_s = it_c;
  }
  int ip_s, qp_s, ip_c, qp_c;
  mix_contrib(ch, chip_s, it_s, db_s, sin_lut, cos_lut, &ip_s, &qp_s);
  mix_contrib(ch, chip_c, it_c, db_c, sin_lut, cos_lut, &ip_c, &qp_c);
  if (ip_s != ip_c || qp_s != qp_c)
    deltas->push_back({n, ip_s - ip_c, qp_s - qp_c});
  return true;
}

}  // namespace

extern "C" {

// Test hook: the modular first-hit solver, for direct fuzzing against a
// brute-force scan (tests/test_synth_seq.py).  The unbudgeted form asks
// for any hit below the modulus (every j < m is admissible since the
// residues cycle with period <= m).
long long gseq_first_hit(long long a, long long s, long long m,
                         long long w) {
  return first_hit_mod(a, s, m, w, m);
}

// Test hook: budget-limited variant (the production gs_next path).
long long gseq_first_hit_budget(long long a, long long s, long long m,
                                long long w, long long budget) {
  return first_hit_mod(a, s, m, w, budget);
}

long gseq_diff_block(
    long C, long N, double delt, int int_nco, const uint8_t* active,
    const double* code_phase, const double* f_code, const double* carr_phase,
    const double* f_carr, const uint32_t* carr_phase_i,
    const int32_t* carr_step_i, const double* gain, const int64_t* iword,
    const int64_t* ibit, const int64_t* icode, const int8_t* ca,
    const uint32_t* dwrd, const double* sin_lut, const double* cos_lut,
    long max_out, int64_t* out_idx, int16_t* out_i, int16_t* out_q,
    double* end_carr, uint32_t* end_carr_i, int want_end) {
  if (C > 16 || N < 0) return -1;
  SeqChan chs[16];
  uint32_t phi0s[16];
  long A = 0;
  long slot_of[16];
  for (long c = 0; c < C; ++c) {
    end_carr[c] = carr_phase[c];
    end_carr_i[c] = carr_phase_i[c];
    if (!active[c]) continue;
    SeqChan& ch = chs[A];
    ch.cp = ch.cp0 = code_phase[c];
    ch.dc = f_code[c] * delt;
    ch.ph = ch.c0 = carr_phase[c];
    ch.dp = f_carr[c] * delt;
    ch.phi = carr_phase_i[c];
    ch.dphi = static_cast<uint32_t>(carr_step_i[c]);
    ch.gain = gain[c];
    ch.iword = ch.iword0 = iword[c];
    ch.ibit = ch.ibit0 = ibit[c];
    ch.icode = ch.icode0 = icode[c];
    if (ch.iword < 0 || ch.iword >= 60) return -1;
    ch.data_bit =
        static_cast<int>((dwrd[c * 60 + ch.iword] >> (29 - ch.ibit)) & 1u) *
            2 - 1;
    ch.ca = ca + c * 1023;
    ch.dwrd = dwrd + c * 60;
    phi0s[A] = ch.phi;
    slot_of[A] = c;
    ++A;
  }

  const bool nco = int_nco != 0;
  // Per-channel screen walks are independent (disjoint SeqChan state,
  // disjoint end_carr slots, own delta list): fan them over threads on
  // multi-core hosts exactly like gseq_carr_chain — this walk is the
  // strict-parity patch path's whole cost.  GPSSIM_CHAIN_THREADS
  // overrides (0/1 = serial).
  std::vector<std::vector<Delta>> dlists(static_cast<size_t>(A));
  std::vector<int> walk_ok(static_cast<size_t>(A), 1);
  auto walk_one = [&](long k) {
    SeqChan& ch = chs[k];
    const uint32_t phi0 = phi0s[k];
    std::vector<Delta>* dl = &dlists[static_cast<size_t>(k)];
    // Candidate samples from the exact closed-form progressions (chip
    // edges; LUT edges unless the integer NCO makes the carrier exact).
    const GlobalScreen gc = make_global(ch.cp0, ch.dc, 1.0,
                                        code_margin_slope(),
                                        code_margin_const(), N);
    GlobalScreen gp{0, 0, 0, 0.0, 0.0};
    if (!nco)
      gp = make_global(ch.c0, ch.dp, 512.0, carr_margin_slope(),
                       carr_margin_const(), N);
    long cur_code = 0;  // code phase + cascade walked to here
    long cur_carr = 0;  // float carrier phase walked to here
    long hc = gs_next(gc, 0, N);
    long hp = nco ? N : gs_next(gp, 0, N);
    while (true) {
      const long nh = hc < hp ? hc : hp;
      if (nh >= N) break;
      // The query window is margin(N)-wide; re-test the candidate
      // against margin(nh) before paying the sequential walk to it — a
      // rejected candidate is PROVEN identical in both semantics.  The
      // surviving verdicts are kept PER DIMENSION: the code and carrier
      // recurrences are independent (gps.c:2789-2829, no cross terms,
      // the data-bit cascade rides the code dimension alone), so only a
      // flagged dimension's sequential state is walked — a code-only
      // candidate skips the carrier walk entirely and vice versa
      // (candidate walks, ~half a block each, are the dominant strict-
      // corrections cost; most candidates flag one dimension).
      const bool code_hit = hc == nh && gs_hit_refined(gc, nh);
      const bool carr_hit = !nco && hp == nh && gs_hit_refined(gp, nh);
      if (code_hit || carr_hit) {
        if (code_hit) {
          // seq_ff_nco walks code + cascade only (its phi side-advance
          // is unused in float mode: eval derives the NCO phase from
          // phi0 + n*dphi).
          if (!seq_ff_nco(ch, nh - cur_code)) {
            walk_ok[static_cast<size_t>(k)] = 0;
            return;
          }
          cur_code = nh;
        }
        if (carr_hit) {
          ch.ph = carr_advance_n(ch.ph, ch.dp, nh - cur_carr);
          cur_carr = nh;
        }
        if (!eval_candidate(ch, nh, ch.cp, ch.ph, nco, phi0, code_hit,
                            carr_hit, sin_lut, cos_lut, dl)) {
          walk_ok[static_cast<size_t>(k)] = 0;
          return;
        }
      }
      if (hc == nh) hc = gs_next(gc, nh + 1, N);
      if (hp == nh) hp = gs_next(gp, nh + 1, N);
    }
    // The block-end walk exists only to report end_carr: the planner's
    // carrier chain already owns block-boundary state, so production
    // callers pass want_end=0 and the walk past the last candidate (the
    // ENTIRE block when there are no candidates — the common case) is
    // skipped.  end_carr/end_carr_i then keep their pass-through init.
    if (!want_end) {
      // The skipped tail walk used to double as data-word-overflow
      // validation (seq_advance returns false past word 59).  Validate
      // via the closed form instead: the sequential wrap count differs
      // from floor((cp0 + N*dc)/1023) by at most 1, so a CERTAIN
      // overflow (one-wrap slack) is still rejected; only a plan whose
      // end sits exactly on the 36000-bitpos boundary can slip the lazy
      // check (want_end=1 and the _ref screen still catch it exactly).
      const double raw = ch.cp0 + static_cast<double>(N) * ch.dc;
      const double wr = std::floor(raw / kCaLen);
      const double total =
          static_cast<double>(ch.iword0 * 600 + ch.ibit0 * 20 +
                              ch.icode0) + wr;
      if (total - 1.0 >= 36000.0) walk_ok[static_cast<size_t>(k)] = 0;
      return;
    }
    // want_end: finish each dimension independently — the code walk for
    // its exact data-word-overflow validation (seq_advance returns
    // false past word 59, exactly as the joint walk did), the carrier
    // walk for the end phase itself.
    if (!seq_ff_nco(ch, N - cur_code)) {
      walk_ok[static_cast<size_t>(k)] = 0;
      return;
    }
    if (!nco) ch.ph = carr_advance_n(ch.ph, ch.dp, N - cur_carr);
    end_carr[slot_of[k]] = ch.ph;
    // The integer NCO only advances in int_nco mode (seq_advance); in
    // float mode the reference leaves it untouched — match exactly.
    end_carr_i[slot_of[k]] =
        nco ? phi0 + static_cast<uint32_t>(static_cast<uint64_t>(N) *
                                           ch.dphi)
            : phi0;
  };
  // With the tight screen most blocks have ZERO candidates, and a
  // candidate-free walk_one is ~free (two first-hit queries, no walk):
  // per-block thread spawn/join would then cost more than the work.
  // Pre-count channels with actual candidates (the queries are
  // microseconds) and fan out only when >= 2 of them have real walks
  // (or the env override forces a schedule).  Hosts that cannot thread
  // at all (< 4 cores) skip the pre-count: it would double the screen
  // queries — the whole cost of a candidate-free block — to inform a
  // decision with only one possible outcome.
  long n_work = 0;
  const bool can_thread = std::thread::hardware_concurrency() >= 4;
  if (!std::getenv("GPSSIM_CHAIN_THREADS") && can_thread) {
    if (want_end) {
      // Every channel walks the full block tail to materialize end
      // state — always real work, independent of candidate count.
      n_work = A;
    } else {
      for (long k = 0; k < A; ++k) {
        const SeqChan& ch = chs[k];
        if (gs_next(make_global(ch.cp0, ch.dc, 1.0, code_margin_slope(),
                                code_margin_const(), N),
                    0, N) < N) {
          ++n_work;
          continue;
        }
        if (!nco && gs_next(make_global(ch.c0, ch.dp, 512.0,
                                        carr_margin_slope(),
                                        carr_margin_const(), N),
                            0, N) < N)
          ++n_work;
      }
    }
  }
  const long nthreads =
      std::getenv("GPSSIM_CHAIN_THREADS") ? chan_threads(A, 2)
      : (n_work >= 2 ? chan_threads(A, 2) : 1);
  fan_channels(nthreads, A, walk_one);
  std::vector<Delta> deltas;
  for (long k = 0; k < A; ++k) {
    if (!walk_ok[static_cast<size_t>(k)]) return -1;
    deltas.insert(deltas.end(), dlists[static_cast<size_t>(k)].begin(),
                  dlists[static_cast<size_t>(k)].end());
  }

  if (deltas.empty()) return 0;
  std::sort(deltas.begin(), deltas.end(),
            [](const Delta& a, const Delta& b) { return a.n < b.n; });
  long n_out = 0;
  size_t i = 0;
  while (i < deltas.size()) {
    const long n = deltas[i].n;
    int di = 0, dq = 0;
    for (; i < deltas.size() && deltas[i].n == n; ++i) {
      di += deltas[i].di;
      dq += deltas[i].dq;
    }
    if (di == 0 && dq == 0) continue;
    // Closed-form totals at this sample: the sequential accumulators are
    // then totals + the flagged channels' deltas (unflagged channels
    // contribute identically in both semantics, per the screen bound).
    int ia_c = 0, qa_c = 0;
    for (long k = 0; k < A; ++k) {
      const SeqChan& ch = chs[k];
      const uint32_t phi_n =
          phi0s[k] +
          static_cast<uint32_t>(static_cast<uint64_t>(n) * ch.dphi);
      long chip_c, it_c;
      int db_c, ip, qp;
      if (!cf_indices(ch, n, nco, phi_n, &chip_c, &it_c, &db_c)) return -1;
      mix_contrib(ch, chip_c, it_c, db_c, sin_lut, cos_lut, &ip, &qp);
      ia_c += ip;
      qa_c += qp;
    }
    if (n_out >= max_out) return -2;
    out_idx[n_out] = n;
    out_i[n_out] = static_cast<int16_t>(ia_c + di);
    out_q[n_out] = static_cast<int16_t>(qa_c + dq);
    ++n_out;
  }
  return n_out;
}

// Window-batched corrections: gseq_diff_block over B stacked plans in ONE
// native call.  The per-block Python/ctypes marshalling (a dozen array
// conversions + a foreign call per 0.1 s block) is the strict-parity
// pipeline's per-block constant cost (VERDICT r3 item 3); batching moves
// it to one call per dispatch window.  Blocks are independent (disjoint
// inputs/outputs), so they also fan out over threads on multi-core hosts
// under the same GPSSIM_CHAIN_THREADS policy as the carrier chain —
// bit-exactness is schedule-independent.
//
// Inputs are the per-block fields stacked on a leading B axis (ca:
// [B*C*1023], dwrd: [B*C*60], everything else [B*C]).  Each block b may
// emit up to max_out corrections at offset b*max_out of out_idx/i/q with
// its count in out_n[b].  Returns 0, or the first failing block's error
// code (-1 invalid plan, -2 max_out exceeded).
long gseq_diff_window(
    long B, long C, long N, double delt, int int_nco, const uint8_t* active,
    const double* code_phase, const double* f_code, const double* carr_phase,
    const double* f_carr, const uint32_t* carr_phase_i,
    const int32_t* carr_step_i, const double* gain, const int64_t* iword,
    const int64_t* ibit, const int64_t* icode, const int8_t* ca,
    const uint32_t* dwrd, const double* sin_lut, const double* cos_lut,
    long max_out, int64_t* out_idx, int16_t* out_i, int16_t* out_q,
    long* out_n) {
  std::vector<long> rcs(static_cast<size_t>(B), 0);
  auto diff_one = [&](long b) {
    double end_carr[16];
    uint32_t end_carr_i[16];
    long n = gseq_diff_block(
        C, N, delt, int_nco, active + b * C, code_phase + b * C,
        f_code + b * C, carr_phase + b * C, f_carr + b * C,
        carr_phase_i + b * C, carr_step_i + b * C, gain + b * C,
        iword + b * C, ibit + b * C, icode + b * C, ca + b * C * 1023,
        dwrd + b * C * 60, sin_lut, cos_lut, max_out, out_idx + b * max_out,
        out_i + b * max_out, out_q + b * max_out, end_carr, end_carr_i,
        /*want_end=*/0);
    if (n < 0) {
      rcs[static_cast<size_t>(b)] = n;
      out_n[b] = 0;
    } else {
      out_n[b] = n;
    }
  };
  fan_channels(chan_threads(B, 16), B, diff_one);
  for (long b = 0; b < B; ++b)
    if (rcs[static_cast<size_t>(b)] != 0) return rcs[static_cast<size_t>(b)];
  return 0;
}

// Full sequential block synthesizer: the reference hot loop
// (gps.c:2767-2845) replayed natively — per-sample f64 phase accumulation,
// dataBit*chip*LUT*gain truncation, int accumulate, int16 store (bits=16)
// or the >>4 int8 quantize (bits=8).  Bit-exact against the reference by
// construction and ~10x faster than the NumPy parity path, so hour-scale
// endurance goldens stay tractable on the host.
//
// out: int16[2N] when bits==16, int8[2N] viewed as int16 storage when
// bits==8 (caller passes the right buffer). Returns 0, or -1 on invalid
// plan (word index out of range / C > 16).
long gseq_synth_block(
    long C, long N, double delt, int int_nco, int bits,
    const uint8_t* active, const double* code_phase, const double* f_code,
    const double* carr_phase, const double* f_carr,
    const uint32_t* carr_phase_i, const int32_t* carr_step_i,
    const double* gain, const int64_t* iword, const int64_t* ibit,
    const int64_t* icode, const int8_t* ca, const uint32_t* dwrd,
    const double* sin_lut, const double* cos_lut, void* out,
    double* end_carr, uint32_t* end_carr_i) {
  if (C > 16 || N < 0) return -1;
  SeqChan chs[16];
  long A = 0;
  long slot_of[16];
  for (long c = 0; c < C; ++c) {
    end_carr[c] = carr_phase[c];
    end_carr_i[c] = carr_phase_i[c];
    if (!active[c]) continue;
    SeqChan& ch = chs[A];
    ch.cp = ch.cp0 = code_phase[c];
    ch.dc = f_code[c] * delt;
    ch.ph = ch.c0 = carr_phase[c];
    ch.dp = f_carr[c] * delt;
    ch.phi = carr_phase_i[c];
    ch.dphi = static_cast<uint32_t>(carr_step_i[c]);
    ch.gain = gain[c];
    ch.iword = ch.iword0 = iword[c];
    ch.ibit = ch.ibit0 = ibit[c];
    ch.icode = ch.icode0 = icode[c];
    if (ch.iword < 0 || ch.iword >= 60) return -1;
    ch.data_bit =
        static_cast<int>((dwrd[c * 60 + ch.iword] >> (29 - ch.ibit)) & 1u) *
            2 - 1;
    ch.ca = ca + c * 1023;
    ch.dwrd = dwrd + c * 60;
    slot_of[A] = c;
    ++A;
  }

  // Gain-folded integer LUTs: the mixing sign s = dataBit*codeCA is ±1,
  // and IEEE multiplication / truncation are sign-symmetric, so
  // trunc(s*lut*gain) == s*trunc(lut*gain) EXACTLY (gps.c:2781-2782
  // operation order preserved bit-for-bit). Folding gain into 512-entry
  // per-channel integer tables (once per block, amortized over N
  // samples) removes every f64 multiply and f64->int conversion from
  // the per-sample mix.
  // 513 entries: ph*512 can round UP to exactly 512.0 for ph within a
  // few ulps of 1 (the reference reads cosTable512[512] — rodata
  // garbage, its own UB, gps.c:2775); entry [512] duplicates [511] so
  // that astronomically rare index clamps with ZERO per-sample cost
  // (an explicit per-sample clamp measured ~20% slower). The screen
  // paths clamp explicitly — they must match this table's semantics.
  alignas(64) int32_t igc[16][528], igs[16][528];
  for (long k = 0; k < A; ++k) {
    const double g = chs[k].gain;
    for (long t = 0; t < 512; ++t) {
      igc[k][t] = static_cast<int32_t>(cos_lut[t] * g);
      igs[k][t] = static_cast<int32_t>(sin_lut[t] * g);
    }
    igc[k][512] = igc[k][511];
    igs[k][512] = igs[k][511];
  }

  // Channel-outer accumulation into modular uint16 lanes: addition mod
  // 2^16 commutes with the final (short) cast the reference performs
  // (gps.c:2841-2845), so per-channel uint16 wraparound sums are
  // bit-identical to the wide int accumulation — for ANY contribution
  // magnitudes. Channel-outer keeps each channel's phase state, chip
  // table, and gain-folded LUTs in registers/L1, and the per-sample
  // cost approaches the f64 phase add-chain latency. (Measured against
  // the alternatives on this class of core: SWAR-packed single-lane
  // accumulators and two-channel interleaving both run SLOWER — wider
  // tables and register pressure cost more than the saved RMWs.)
  static thread_local std::vector<uint16_t> acc_i, acc_q;
  if (static_cast<long>(acc_i.size()) < N) {
    acc_i.resize(N);
    acc_q.resize(N);
  }
  std::fill(acc_i.begin(), acc_i.begin() + N, 0);
  std::fill(acc_q.begin(), acc_q.begin() + N, 0);

  for (long k = 0; k < A; ++k) {
    SeqChan& ch = chs[k];
    const int32_t* gc = igc[k];
    const int32_t* gs = igs[k];
    uint16_t* ai = acc_i.data();
    uint16_t* aq = acc_q.data();
    if (int_nco) {
      for (long n = 0; n < N; ++n) {
        long chip = static_cast<long>(ch.cp);
        long it = static_cast<long>((ch.phi >> 16) & 511u);
        int neg = -(ch.data_bit != (ch.ca[chip] * 2 - 1));
        ai[n] += static_cast<uint16_t>((gc[it] ^ neg) - neg);
        aq[n] += static_cast<uint16_t>((gs[it] ^ neg) - neg);
        if (!seq_advance(ch, true)) return -1;
      }
    } else {
      for (long n = 0; n < N; ++n) {
        long chip = static_cast<long>(ch.cp);
        // ph is wrapped to [0,1) by seq_advance, so truncation == floor.
        // ph*512 can round UP to exactly 512.0 for ph within 2^-53 of 1
        // (the reference reads cosTable512[512] — rodata garbage, its
        // own UB, gps.c:2775); clamp like every closed-form path here.
        long it = static_cast<long>(ch.ph * 512.0);
        int neg = -(ch.data_bit != (ch.ca[chip] * 2 - 1));
        ai[n] += static_cast<uint16_t>((gc[it] ^ neg) - neg);
        aq[n] += static_cast<uint16_t>((gs[it] ^ neg) - neg);
        if (!seq_advance(ch, false)) return -1;
      }
    }
  }

  int16_t* o16 = static_cast<int16_t*>(out);
  int8_t* o8 = static_cast<int8_t*>(out);
  if (bits == 16) {
    for (long n = 0; n < N; ++n) {
      o16[2 * n] = static_cast<int16_t>(acc_i[n]);
      o16[2 * n + 1] = static_cast<int16_t>(acc_q[n]);
    }
  } else {
    for (long n = 0; n < N; ++n) {
      o8[2 * n] =
          static_cast<int8_t>(static_cast<int16_t>(acc_i[n]) >> 4);
      o8[2 * n + 1] =
          static_cast<int8_t>(static_cast<int16_t>(acc_q[n]) >> 4);
    }
  }

  for (long k = 0; k < A; ++k) {
    end_carr[slot_of[k]] = chs[k].ph;
    end_carr_i[slot_of[k]] = chs[k].phi;
  }
  return 0;
}

// ---- Quantizer ----
// 16-bit accumulators → int8 via arithmetic >>4, exactly as the reference
// (gps.c:2841-2845). Auto-vectorizes under -O3.
void gquantize_16to8(const int16_t* in, int8_t* out, long n) {
  for (long i = 0; i < n; ++i) out[i] = static_cast<int8_t>(in[i] >> 4);
}

}  // extern "C"
