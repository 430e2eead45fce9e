/* Headless driver for the reference GPS engine — golden-output oracle.
 *
 * Builds against the unmodified reference sources (gps.c, fifo.c,
 * almanac.c) staged by build_oracle.sh, replacing the TUI/curl/SDR layers
 * with stubs. Runs the engine's own gps_thread_ep and writes every FIFO
 * block to a file, reproducing the iqfile sink byte-for-byte.
 *
 * Usage:
 *   gps-sim-oracle <nav_file> <out_file> key=value...
 *     lat= lon= height= duration= bits=8|16 iono=0|1 rinex3=0|1
 *     motion= almanac=0|1 start=YYYY/MM/DD,hh:mm:ss overwrite=0|1
 *     tdist= tbear= theight=   (target offset)
 *     interactive=0|1 speed= vspeed=   (constant interactive kinematics)
 */
#include <pthread.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "gps-sim.h"
#include "gps.h"
#include "sdr.h"
#include "fifo.h"

simulator_t simulator; /* matches the file-scope global the engine expects */

/* gps-sim.c provides these in the real build */
void set_thread_name(const char *name) { (void)name; }
int thread_to_core(int core_id) { (void)core_id; return 0; }

static FILE *out_fp;
static pthread_t writer_thread;
static volatile int writer_stop = 0;

static long blocks_written = 0;

static void *writer_ep(void *arg) {
    (void)arg;
    for (;;) {
        struct iq_buf *iq = fifo_dequeue();
        if (iq == NULL)
            return NULL; /* halted */
        size_t n;
        if (simulator.sample_size == SC16) {
            n = fwrite(iq->data16, sizeof(signed short), iq->validLength, out_fp);
        } else {
            n = fwrite(iq->data8, sizeof(signed char), iq->validLength, out_fp);
        }
        if (n != (size_t)iq->validLength)
            fprintf(stderr, "oracle: short write %zu/%u\n", n, iq->validLength);
        blocks_written++;
        fifo_release(iq);
    }
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s nav out key=val...\n", argv[0]);
        return 2;
    }

    memset(&simulator, 0, sizeof(simulator));
    simulator.ionosphere_enable = true;
    simulator.almanac_enable = true;
    simulator.duration = USER_MOTION_SIZE;
    simulator.sample_size = SC08;
    simulator.sdr_type = SDR_IQFILE;
    simulator.nav_file_name = argv[1];
    pthread_cond_init(&simulator.gps_init_done, NULL);
    pthread_mutex_init(&simulator.gps_lock, NULL);

    const char *out_name = argv[2];

    for (int i = 3; i < argc; i++) {
        char *eq = strchr(argv[i], '=');
        if (!eq) continue;
        *eq = 0;
        const char *k = argv[i], *v = eq + 1;
        if (!strcmp(k, "lat")) simulator.location.lat = atof(v);
        else if (!strcmp(k, "lon")) simulator.location.lon = atof(v);
        else if (!strcmp(k, "height")) simulator.location.height = atof(v);
        else if (!strcmp(k, "duration"))
            simulator.duration = (int)(atof(v) * 10.0 + 0.5);
        else if (!strcmp(k, "bits"))
            simulator.sample_size = (atoi(v) == 16) ? SC16 : SC08;
        else if (!strcmp(k, "iono")) simulator.ionosphere_enable = atoi(v);
        else if (!strcmp(k, "rinex3")) simulator.use_rinex3 = atoi(v);
        else if (!strcmp(k, "almanac")) simulator.almanac_enable = atoi(v);
        else if (!strcmp(k, "overwrite")) simulator.time_overwrite = atoi(v);
        else if (!strcmp(k, "motion")) simulator.motion_file_name = strdup(v);
        else if (!strcmp(k, "tdist")) { simulator.target.distance = atof(v); simulator.target.valid = true; }
        else if (!strcmp(k, "tbear")) simulator.target.bearing = atof(v) * 1000.0;
        else if (!strcmp(k, "theight")) simulator.target.height = atof(v);
        /* Interactive-mode kinematics (gps.c:2714-2729): constant
         * bearing (tbear=) / ground speed / vertical speed held for the
         * whole run — the integration path the TUI keys normally drive. */
        else if (!strcmp(k, "interactive")) simulator.interactive_mode = atoi(v);
        else if (!strcmp(k, "speed")) simulator.target.velocity = atof(v);
        else if (!strcmp(k, "vspeed")) simulator.target.vertical_speed = atof(v);
        else if (!strcmp(k, "start")) {
            sscanf(v, "%d/%d/%d,%d:%d:%lf", &simulator.start.y,
                   &simulator.start.m, &simulator.start.d, &simulator.start.hh,
                   &simulator.start.mm, &simulator.start.sec);
        } else {
            fprintf(stderr, "unknown key %s\n", k);
            return 2;
        }
    }

    out_fp = fopen(out_name, "wb");
    if (!out_fp) { perror("fopen"); return 1; }

    if (!fifo_create(NUM_FIFO_BUFFERS, IQ_BUFFER_SIZE, simulator.sample_size)) {
        fprintf(stderr, "fifo_create failed\n");
        return 1;
    }

    pthread_create(&writer_thread, NULL, writer_ep, NULL);

    pthread_t gps_thread;
    pthread_create(&gps_thread, NULL, gps_thread_ep, &simulator);
    pthread_join(gps_thread, NULL);

    /* Engine done: wait for the FIFO to drain, then halt to stop writer. */
    fifo_wait_next();
    fifo_halt();
    pthread_join(writer_thread, NULL);
    fifo_destroy();
    fclose(out_fp);
    fprintf(stderr, "oracle: blocks_written=%ld\n", blocks_written);
    (void)writer_stop;
    return simulator.gps_thread_exit ? 0 : 1;
}
