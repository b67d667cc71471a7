/*
 * ctts.h — drop-in C API for the ctts_tpu framework's native host runtime.
 *
 * ABI-compatible re-declaration of the reference engine's public C
 * interface (parity source: /root/reference/ctts.h:1-340). A program
 * written against the reference header links and runs against
 * libctts.so unchanged: same function names and signatures, same
 * CTTSConfig layout, same database format and error codes. The
 * implementation (csrc/ctts_capi.cpp) is the ctts_tpu native frontend +
 * plan executor, not the reference code.
 *
 * Original implementation for the ctts_tpu project.
 */

#ifndef CTTS_TPU_CTTS_H
#define CTTS_TPU_CTTS_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- constants (ctts.h:18-38) ---- */

#define CTTS_MAGIC 0x53545443u /* "CTTS" little-endian */
#define CTTS_VERSION 1
#define CTTS_SAMPLE_RATE 22050
#define CTTS_BITS_PER_SAMPLE 16
#define CTTS_MAX_UNIT_LEN 16

#define CTTS_DEFAULT_CROSSFADE_MS 20.0f
#define CTTS_DEFAULT_WORD_PAUSE_MS 120.0f
#define CTTS_DEFAULT_UNKNOWN_SILENCE_MS 30.0f
#define CTTS_DEFAULT_FADE_IN_MS 3.0f
#define CTTS_DEFAULT_FADE_OUT_MS 3.0f
#define CTTS_DEFAULT_SPEED 1.0f

#define CTTS_MIN_SPEED 0.5f
#define CTTS_MAX_SPEED 2.0f

/* ---- configuration (field order = ABI; ctts.h:44-77) ---- */

typedef struct {
  float crossfade_ms;
  float crossfade_vowel_ms;
  float crossfade_s_ending_ms;
  float crossfade_r_ending_ms;
  float vowel_to_consonant_factor;
  float word_pause_ms;
  float unknown_silence_ms;
  float fade_in_ms;
  float fade_out_ms;

  int remove_word_silence;
  float silence_threshold;
  float min_silence_ms;

  int remove_dc_offset;
  float normalize_level;
  float compression;

  float default_speed;
  float min_speed;
  float max_speed;

  float max_pitch_change;

  int print_units;
  int print_timing;
} CTTSConfig;

/* Opaque engine handle. (The reference exposes its struct publicly;
 * well-behaved callers only pass the pointer through the API below, and
 * the accessors cover the used fields.) */
typedef struct CTTS CTTS;

/* ---- database building (ctts.h:160-181) ---- */

int ctts_build_database(const char* letters_dir, const char* letters_index,
                        const char* syllables_dir,
                        const char* syllables_index, const char* output_file);

/* ---- synthesis (ctts.h:183-250) ---- */

CTTS* ctts_init(const char* database_file);
int ctts_synthesize(CTTS* engine, const char* text, int16_t** samples,
                    size_t* sample_count, float speed);
int ctts_write_wav(const char* filename, const int16_t* samples,
                   size_t sample_count, int sample_rate);
void ctts_free(CTTS* engine);
void ctts_free_samples(int16_t* samples);

/* ---- configuration (ctts.h:252-286) ---- */

int ctts_load_config(CTTSConfig* config, const char* config_file);
void ctts_config_defaults(CTTSConfig* config);
void ctts_set_crossfade(CTTS* engine, float crossfade_ms);
void ctts_set_word_pause(CTTS* engine, float pause_ms);
void ctts_set_unknown_silence(CTTS* engine, float silence_ms);
void ctts_set_fades(CTTS* engine, float fade_in_ms, float fade_out_ms);

/* Engine-config access (the reference exposes engine->config directly;
 * these accessors serve the same need through the opaque handle). */
CTTSConfig* ctts_get_config(CTTS* engine);
uint32_t ctts_units_found(const CTTS* engine);
uint32_t ctts_units_missing(const CTTS* engine);

/* ---- utilities (ctts.h:288-327) ---- */

size_t ctts_utf8_strlen(const char* str);
uint32_t ctts_utf8_next(const char** str);
uint32_t ctts_hash(const char* str, size_t len);
char* ctts_normalize(const char* text);
int ctts_load_normalization(const char* csv_file);
char* ctts_apply_normalization(const char* text);
void ctts_free_normalization(void);

/* ---- error codes (ctts.h:329-340) ---- */

#define CTTS_OK 0
#define CTTS_ERR_INVALID_ARG -1
#define CTTS_ERR_FILE_NOT_FOUND -2
#define CTTS_ERR_FILE_READ -3
#define CTTS_ERR_FILE_WRITE -4
#define CTTS_ERR_INVALID_FORMAT -5
#define CTTS_ERR_OUT_OF_MEMORY -6
#define CTTS_ERR_INVALID_WAV -7

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* CTTS_TPU_CTTS_H */
