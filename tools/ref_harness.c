/*
 * Parity-test harness for the C reference engine.
 *
 * This file is OUR test driver; it textually includes the reference
 * implementation (path given via -DREF_CTTS_C=...) so tests can call its
 * internal (static) stages and compare them against the ctts_tpu rebuild.
 * Nothing from the reference is copied into this repository; the reference
 * tree is only read at compile time.
 *
 * Usage:
 *   ref_harness expand <text>            -- number expansion only
 *   ref_harness norm <csv> <text>        -- numbers + rules + lowercase
 *   ref_harness hash <text>              -- FNV-1a hash (decimal)
 *   ref_harness pause <punct> <pause_ms> -- punctuation pause in ms
 */

#define main ref_main
#include REF_CTTS_C
#undef main

#include <stdio.h>
#include <string.h>
#include <stdlib.h>

int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s expand|norm|hash|pause ...\n", argv[0]);
        return 2;
    }
    if (strcmp(argv[1], "expand") == 0) {
        char* out = expand_numbers(argv[2]);
        fputs(out, stdout);
        free(out);
        return 0;
    }
    if (strcmp(argv[1], "norm") == 0) {
        if (argc < 4) return 2;
        ctts_load_normalization(argv[2]);
        char* expanded = expand_numbers(argv[3]);
        char* ruled = ctts_apply_normalization(expanded);
        char* lowered = ctts_normalize(ruled);
        fputs(lowered, stdout);
        free(expanded);
        free(ruled);
        free(lowered);
        ctts_free_normalization();
        return 0;
    }
    if (strcmp(argv[1], "hash") == 0) {
        printf("%u\n", ctts_hash(argv[2], strlen(argv[2])));
        return 0;
    }
    if (strcmp(argv[1], "pause") == 0) {
        if (argc < 4) return 2;
        CTTSConfig cfg;
        ctts_config_defaults(&cfg);
        cfg.word_pause_ms = strtof(argv[3], NULL);
        printf("%.9g\n", get_punctuation_pause_ms(argv[2][0], &cfg));
        return 0;
    }
    fprintf(stderr, "unknown command %s\n", argv[1]);
    return 2;
}
