/* Mock libiio ABI for contract-testing gpssim_tpu/io/hw_pluto.py.
 *
 * Fakes an ADALM-Pluto IIO context: ad9361-phy and
 * cf-ad9361-dds-core-lpc devices, channel handles, attribute writes
 * recorded by (channel, attr) name, and a TX buffer whose pushes are
 * captured. Built by tests/test_hw_bindings.py with: cc -shared -fPIC.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define NUM_IQ_SAMPLES 300000
#define SAMPLE_BYTES 4 /* int16 I + int16 Q */
#define CAPTURE_MAX (SAMPLE_BYTES * NUM_IQ_SAMPLES * 8)
#define MAX_ATTRS 64

static int g_ctx_token, g_phy_token, g_tx_token;
static int g_chans[8]; /* distinct channel handles */

typedef struct {
  char key[96];
  char value[64];
} attr_rec;
static attr_rec g_attrs[MAX_ATTRS];
static int g_nattrs = 0;
static int g_enabled = 0;
static int g_kernel_buffers = 0;
static int g_ctx_destroyed = 0, g_buf_destroyed = 0;
static int g_network_ctx = 0;
static char g_net_host[128];

static uint8_t* g_bufmem;
static size_t g_bufsize;
static uint8_t* g_capture;
static long g_captured = 0;
static long g_pushes = 0;

static void record(const char* chan, const char* attr, const char* val) {
  if (g_nattrs >= MAX_ATTRS) return;
  snprintf(g_attrs[g_nattrs].key, sizeof(g_attrs[0].key), "%s.%s", chan,
           attr);
  strncpy(g_attrs[g_nattrs].value, val, sizeof(g_attrs[0].value) - 1);
  g_nattrs++;
}

static const char* chan_name(void* chn) {
  static const char* names[8] = {"phy.voltage0",  "phy.altvoltage0",
                                 "phy.altvoltage1", "tx.voltage0",
                                 "tx.voltage1",     "?", "?", "?"};
  for (int i = 0; i < 8; i++)
    if (chn == (void*)&g_chans[i]) return names[i];
  return "?";
}

void* iio_create_default_context(void) { return &g_ctx_token; }
void* iio_create_network_context(const char* host) {
  g_network_ctx = 1;
  strncpy(g_net_host, host, sizeof(g_net_host) - 1);
  return &g_ctx_token;
}
void* iio_create_context_from_uri(const char* uri) {
  (void)uri;
  return &g_ctx_token;
}
void iio_context_destroy(void* c) { (void)c; g_ctx_destroyed++; }
unsigned iio_context_get_devices_count(void* c) { (void)c; return 3; }

void* iio_context_find_device(void* c, const char* name) {
  (void)c;
  if (strcmp(name, "ad9361-phy") == 0) return &g_phy_token;
  if (strcmp(name, "cf-ad9361-dds-core-lpc") == 0) return &g_tx_token;
  return 0;
}

int iio_device_set_kernel_buffers_count(void* d, unsigned n) {
  (void)d;
  g_kernel_buffers = (int)n;
  return 0;
}

void* iio_device_find_channel(void* d, const char* name, int output) {
  (void)output;
  if (d == (void*)&g_phy_token) {
    if (strcmp(name, "voltage0") == 0) return &g_chans[0];
    if (strcmp(name, "altvoltage0") == 0) return &g_chans[1];
    if (strcmp(name, "altvoltage1") == 0) return &g_chans[2];
  } else if (d == (void*)&g_tx_token) {
    if (strcmp(name, "voltage0") == 0) return &g_chans[3];
    if (strcmp(name, "voltage1") == 0) return &g_chans[4];
  }
  return 0;
}

long iio_channel_attr_write(void* chn, const char* attr, const char* v) {
  record(chan_name(chn), attr, v);
  return (long)strlen(v);
}
int iio_channel_attr_write_longlong(void* chn, const char* attr,
                                    long long v) {
  char buf[32];
  snprintf(buf, sizeof(buf), "%lld", v);
  record(chan_name(chn), attr, buf);
  return 0;
}
int iio_channel_attr_write_double(void* chn, const char* attr, double v) {
  char buf[32];
  snprintf(buf, sizeof(buf), "%g", v);
  record(chan_name(chn), attr, buf);
  return 0;
}
int iio_channel_attr_write_bool(void* chn, const char* attr, int v) {
  record(chan_name(chn), attr, v ? "1" : "0");
  return 0;
}
void iio_channel_enable(void* chn) { (void)chn; g_enabled++; }

void* iio_device_create_buffer(void* d, size_t samples, int cyclic) {
  (void)d; (void)cyclic;
  g_bufsize = samples * SAMPLE_BYTES;
  g_bufmem = (uint8_t*)malloc(g_bufsize);
  g_capture = (uint8_t*)malloc(CAPTURE_MAX);
  return g_bufmem;
}
int iio_buffer_set_blocking_mode(void* b, int blocking) {
  (void)b; (void)blocking;
  return 0;
}
void* iio_buffer_start(void* b) { return b; }
void* iio_buffer_end(void* b) { return (uint8_t*)b + g_bufsize; }
long iio_buffer_push(void* b) {
  if ((size_t)g_captured + g_bufsize <= CAPTURE_MAX) {
    memcpy(g_capture + g_captured, b, g_bufsize);
    g_captured += (long)g_bufsize;
  }
  g_pushes++;
  return (long)g_bufsize;
}
void iio_buffer_destroy(void* b) { (void)b; g_buf_destroyed++; }

/* ---- mock introspection ---- */
long mock_captured_bytes(void) { return g_captured; }
long mock_copy_capture(uint8_t* out, long max) {
  long n = g_captured < max ? g_captured : max;
  memcpy(out, g_capture, (size_t)n);
  return n;
}
long mock_pushes(void) { return g_pushes; }
int mock_enabled_channels(void) { return g_enabled; }
int mock_kernel_buffers(void) { return g_kernel_buffers; }
int mock_used_network(void) { return g_network_ctx; }
const char* mock_net_host(void) { return g_net_host; }
int mock_teardown_ok(void) { return g_ctx_destroyed == 1 && g_buf_destroyed == 1; }
const char* mock_attr(const char* key) {
  for (int i = g_nattrs - 1; i >= 0; i--)
    if (strcmp(g_attrs[i].key, key) == 0) return g_attrs[i].value;
  return "";
}
