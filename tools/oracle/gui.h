/* Headless stub of the reference TUI interface, used only to build the
 * reference engine as a golden-output oracle for parity tests.
 * Function names/signatures match /root/reference/gui.h; bodies are no-ops
 * (gui_stub.c) so no ncurses is needed. */
#ifndef GUI_H
#define GUI_H

#define UP_KEY 'w'
#define DOWN_KEY 's'
#define RIGHT_KEY 'd'
#define LEFT_KEY 'a'
#define UPSPEED_KEY 'e'
#define DOWNSPEED_KEY 'q'
#define GAIN_INC_KEY 't'
#define GAIN_DEC_KEY 'g'

typedef enum {
    TRACK = 0, LS_FIX, KF_FIX, INFO, HEADING, HEIGHT, SPEED, TARGET,
    LOCATION, EPHEMERIS, TOP, STATUS, HELP
} window_panel_t;

typedef enum { OFF = 0, ON = 1 } attr_status_t;

typedef enum {
    DEFAULT = 0, RED = 1, GREEN = 2, BLUE = 3, CYAN = 4, YELLOW = 5
} status_color_t;

void gui_init(void);
int gui_getch(void);
void gui_destroy(void);
void gui_mvwprintw(window_panel_t w, int y, int x, const char *fmt, ...);
void gui_status_wprintw(status_color_t clr, const char *fmt, ...);
void gui_colorpair(window_panel_t w, unsigned clr, attr_status_t onoff);
void gui_top_panel(window_panel_t p);
void gui_toggle_current_panel(void);
void gui_show_panel(window_panel_t p, attr_status_t onoff);
void gui_show_speed(float speed);
void gui_show_heading(float hdg);
void gui_show_vertical_speed(float vs);
void gui_show_location(void *l);
void gui_show_target(void *t);

#endif
