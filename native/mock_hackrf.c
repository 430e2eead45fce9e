/* Mock libhackrf ABI for contract-testing gpssim_tpu/io/hw_hackrf.py.
 *
 * Implements the subset of the libhackrf C ABI the binding uses, records
 * every configuration call, and emulates the pull-based TX: start_tx
 * spawns a thread that invokes the callback with 262,144-byte transfers
 * until it returns non-zero, capturing the transmitted bytes.
 *
 * Built by tests/test_hw_bindings.py with: cc -shared -fPIC -pthread.
 */

#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define TRANSFER_SIZE 262144
#define CAPTURE_MAX (16 * 1024 * 1024)

typedef struct {
  void* device;
  uint8_t* buffer;
  int buffer_length;
  int valid_length;
  void* rx_ctx;
  void* tx_ctx;
} hackrf_transfer;

typedef int (*tx_cb_fn)(hackrf_transfer*);

typedef struct {
  char** serial_numbers;
  int* usb_board_ids;
  int* usb_device_index;
  int devicecount;
  void** usb_devices;
  int usb_devicecount;
} hackrf_device_list_t;

static char* g_serials[1];
static int g_board_ids[1] = {2};
static int g_dev_index[1] = {0};
static hackrf_device_list_t g_list;
static int g_device_token = 0x48;

/* recorded state */
static double g_sample_rate = 0;
static uint64_t g_freq = 0;
static uint32_t g_filter_bw = 0;
static uint32_t g_gain = 999;
static int g_amp = -1;
static int g_antenna = -1;
static int g_hw_sync = -1;
static int g_inited = 0, g_exited = 0, g_stopped = 0, g_closed = 0;

static uint8_t* g_capture;
static long g_captured = 0;
static pthread_t g_tx_thread;
static tx_cb_fn g_cb;
static volatile int g_running = 0;

int hackrf_init(void) { g_inited++; return 0; }
int hackrf_exit(void) { g_exited++; return 0; }

hackrf_device_list_t* hackrf_device_list(void) {
  g_serials[0] = (char*)"MOCKSERIAL0001";
  g_list.serial_numbers = g_serials;
  g_list.usb_board_ids = g_board_ids;
  g_list.usb_device_index = g_dev_index;
  g_list.devicecount = 1;
  g_list.usb_devices = 0;
  g_list.usb_devicecount = 1;
  return &g_list;
}
void hackrf_device_list_free(hackrf_device_list_t* l) { (void)l; }

int hackrf_device_list_open(hackrf_device_list_t* l, int idx, void** dev) {
  (void)l; (void)idx;
  *dev = &g_device_token;
  return 0;
}

int hackrf_board_id_read(void* d, uint8_t* id) { (void)d; *id = 2; return 0; }
int hackrf_version_string_read(void* d, char* out, uint8_t n) {
  (void)d;
  strncpy(out, "mock-fw-1.0", n);
  return 0;
}
int hackrf_set_antenna_enable(void* d, uint8_t v) { (void)d; g_antenna = v; return 0; }
int hackrf_set_sample_rate(void* d, double hz) { (void)d; g_sample_rate = hz; return 0; }
uint32_t hackrf_compute_baseband_filter_bw(uint32_t bw) {
  return bw < 1750000u ? 1750000u : bw;
}
int hackrf_set_baseband_filter_bandwidth(void* d, uint32_t bw) {
  (void)d; g_filter_bw = bw; return 0;
}
int hackrf_set_freq(void* d, uint64_t hz) { (void)d; g_freq = hz; return 0; }
int hackrf_set_amp_enable(void* d, uint8_t v) { (void)d; g_amp = v; return 0; }
int hackrf_set_txvga_gain(void* d, uint32_t g) { (void)d; g_gain = g; return 0; }
int hackrf_set_hw_sync_mode(void* d, uint8_t v) { (void)d; g_hw_sync = v; return 0; }

static void* tx_loop(void* arg) {
  (void)arg;
  uint8_t* buf = (uint8_t*)malloc(TRANSFER_SIZE);
  while (g_running) {
    hackrf_transfer t;
    t.device = &g_device_token;
    t.buffer = buf;
    t.buffer_length = TRANSFER_SIZE;
    t.valid_length = TRANSFER_SIZE;
    t.rx_ctx = 0;
    t.tx_ctx = 0;
    if (g_cb(&t) != 0) break;
    if (g_captured + TRANSFER_SIZE <= CAPTURE_MAX) {
      memcpy(g_capture + g_captured, buf, TRANSFER_SIZE);
      g_captured += TRANSFER_SIZE;
    }
  }
  free(buf);
  return 0;
}

int hackrf_start_tx(void* d, tx_cb_fn cb, void* ctx) {
  (void)d; (void)ctx;
  if (!g_capture) g_capture = (uint8_t*)malloc(CAPTURE_MAX);
  g_cb = cb;
  g_running = 1;
  pthread_create(&g_tx_thread, 0, tx_loop, 0);
  return 0;
}

int hackrf_stop_tx(void* d) {
  (void)d;
  g_stopped++;
  if (g_running) {
    g_running = 0;
    pthread_join(g_tx_thread, 0);
  }
  return 0;
}

int hackrf_close(void* d) { (void)d; g_closed++; return 0; }

/* ---- mock introspection ---- */
long mock_captured_bytes(void) { return g_captured; }
long mock_copy_capture(uint8_t* out, long max) {
  long n = g_captured < max ? g_captured : max;
  memcpy(out, g_capture, (size_t)n);
  return n;
}
double mock_sample_rate(void) { return g_sample_rate; }
uint64_t mock_freq(void) { return g_freq; }
uint32_t mock_filter_bw(void) { return g_filter_bw; }
uint32_t mock_gain(void) { return g_gain; }
int mock_amp(void) { return g_amp; }
int mock_antenna(void) { return g_antenna; }
int mock_hw_sync(void) { return g_hw_sync; }
int mock_teardown_ok(void) {
  return g_inited == 1 && g_exited == 1 && g_stopped >= 1 && g_closed == 1 &&
         g_amp == 0 && g_gain == 0;
}
