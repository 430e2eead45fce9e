/* Stub libcurl implementation: every transfer fails (oracle runs never use
 * the network). */
#include <curl/curl.h>

CURLcode curl_global_init(long flags) { (void)flags; return CURLE_OK; }
void curl_global_cleanup(void) {}
CURL *curl_easy_init(void) { return (CURL *)0; }
CURLcode curl_easy_setopt(CURL *h, CURLoption opt, ...) {
    (void)h; (void)opt; return CURLE_OK;
}
CURLcode curl_easy_perform(CURL *h) { (void)h; return CURLE_GOT_NOTHING; }
void curl_easy_cleanup(CURL *h) { (void)h; }
