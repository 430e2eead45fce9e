/* Minimal libcurl stub header for the headless oracle build (no network
 * features are exercised in oracle runs; use_ftp is always false). */
#ifndef ORACLE_CURL_STUB_H
#define ORACLE_CURL_STUB_H

#include <stddef.h>

typedef void CURL;

typedef enum {
    CURLE_OK = 0,
    CURLE_READ_ERROR = 26,
    CURLE_GOT_NOTHING = 52,
    CURLE_REMOTE_FILE_NOT_FOUND = 78
} CURLcode;

typedef enum {
    CURLOPT_URL = 1,
    CURLOPT_VERBOSE,
    CURLOPT_WRITEFUNCTION,
    CURLOPT_WRITEDATA,
    CURLOPT_USE_SSL,
    CURLOPT_USERPWD
} CURLoption;

typedef enum { CURLUSESSL_NONE = 0 } curl_usessl;

#define CURL_GLOBAL_DEFAULT 0

CURLcode curl_global_init(long flags);
void curl_global_cleanup(void);
CURL *curl_easy_init(void);
CURLcode curl_easy_setopt(CURL *h, CURLoption opt, ...);
CURLcode curl_easy_perform(CURL *h);
void curl_easy_cleanup(CURL *h);

#endif
