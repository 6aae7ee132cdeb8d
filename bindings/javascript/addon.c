/* N-API addon exposing the stt_tpu C API to Node.js.
 *
 * Counterpart of the reference's native_client/javascript/stt.i (SWIG) —
 * rebuilt as a plain N-API C module: each STT_* entry point becomes a flat
 * function; index.js assembles the idiomatic Model/Stream classes on top,
 * mirroring native_client/javascript/index.ts.
 *
 * Metadata is converted eagerly into plain JS objects and the native
 * Metadata freed before returning, so no JS-side lifetime management of
 * native transcripts is needed (unlike the reference, which leaks the SWIG
 * proxy lifetime onto the caller).
 */
#include <node_api.h>
#include <stdbool.h>
#include <stdlib.h>
#include <string.h>

#include "../../stt_tpu/native/stt_tpu.h"

#define NAPI_CALL(env, call)                              \
  do {                                                    \
    if ((call) != napi_ok) {                              \
      napi_throw_error((env), NULL, "N-API call failed"); \
      return NULL;                                        \
    }                                                     \
  } while (0)

static napi_value make_string(napi_env env, const char* s) {
  napi_value out;
  if (napi_create_string_utf8(env, s ? s : "", NAPI_AUTO_LENGTH, &out) !=
      napi_ok)
    return NULL;
  return out;
}

static void* get_external(napi_env env, napi_value v) {
  void* p = NULL;
  napi_get_value_external(env, v, &p);
  return p;
}

/* Accepts a Node Buffer/TypedArray of 16-bit PCM; returns pointer+frames. */
static short* get_pcm(napi_env env, napi_value v, unsigned int* n_frames) {
  void* data = NULL;
  size_t len = 0;
  bool is_buffer = false;
  napi_is_buffer(env, v, &is_buffer);
  if (is_buffer) {
    if (napi_get_buffer_info(env, v, &data, &len) != napi_ok) return NULL;
  } else {
    napi_typedarray_type type;
    napi_value arraybuffer;
    size_t offset;
    if (napi_get_typedarray_info(env, v, &type, &len, &data, &arraybuffer,
                                 &offset) != napi_ok)
      return NULL;
    if (type == napi_int16_array) len *= 2; /* elements → bytes */
  }
  *n_frames = (unsigned int)(len / 2);
  return (short*)data;
}

static napi_value metadata_to_js(napi_env env, Metadata* m) {
  napi_value transcripts;
  if (napi_create_array_with_length(env, m ? m->num_transcripts : 0,
                                    &transcripts) != napi_ok)
    return NULL;
  for (unsigned int i = 0; m && i < m->num_transcripts; ++i) {
    const CandidateTranscript* ct = &m->transcripts[i];
    napi_value jct, conf, tokens;
    napi_create_object(env, &jct);
    napi_create_double(env, ct->confidence, &conf);
    napi_set_named_property(env, jct, "confidence", conf);
    napi_create_array_with_length(env, ct->num_tokens, &tokens);
    for (unsigned int t = 0; t < ct->num_tokens; ++t) {
      const TokenMetadata* tok = &ct->tokens[t];
      napi_value jtok, text, timestep, start;
      napi_create_object(env, &jtok);
      text = make_string(env, tok->text);
      napi_set_named_property(env, jtok, "text", text);
      napi_create_uint32(env, tok->timestep, &timestep);
      napi_set_named_property(env, jtok, "timestep", timestep);
      napi_create_double(env, tok->start_time, &start);
      napi_set_named_property(env, jtok, "startTime", start);
      napi_set_element(env, tokens, t, jtok);
    }
    napi_set_named_property(env, jct, "tokens", tokens);
    napi_set_element(env, transcripts, i, jct);
  }
  napi_value out;
  napi_create_object(env, &out);
  napi_set_named_property(env, out, "transcripts", transcripts);
  if (m) STT_FreeMetadata(m);
  return out;
}

static napi_value owned_string_to_js(napi_env env, char* s) {
  napi_value out = make_string(env, s);
  if (s) STT_FreeString(s);
  return out;
}

/* -- model lifecycle ------------------------------------------------------ */

static napi_value CreateModel(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  char path[4096];
  size_t n;
  NAPI_CALL(env, napi_get_value_string_utf8(env, argv[0], path, sizeof(path),
                                            &n));
  ModelState* model = NULL;
  int status = STT_CreateModel(path, &model);
  napi_value out, jstatus, jmodel;
  napi_create_object(env, &out);
  napi_create_int32(env, status, &jstatus);
  napi_set_named_property(env, out, "status", jstatus);
  if (status == STT_ERR_OK) {
    napi_create_external(env, model, NULL, NULL, &jmodel);
    napi_set_named_property(env, out, "model", jmodel);
  }
  return out;
}

static napi_value FreeModel(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  STT_FreeModel((ModelState*)get_external(env, argv[0]));
  return NULL;
}

static napi_value GetModelBeamWidth(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  napi_create_uint32(
      env, STT_GetModelBeamWidth((ModelState*)get_external(env, argv[0])),
      &out);
  return out;
}

static napi_value SetModelBeamWidth(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2], out;
  uint32_t width;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  NAPI_CALL(env, napi_get_value_uint32(env, argv[1], &width));
  napi_create_int32(
      env,
      STT_SetModelBeamWidth((ModelState*)get_external(env, argv[0]), width),
      &out);
  return out;
}

static napi_value GetModelSampleRate(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  napi_create_int32(
      env, STT_GetModelSampleRate((ModelState*)get_external(env, argv[0])),
      &out);
  return out;
}

/* -- scorer + hot words ---------------------------------------------------- */

static napi_value EnableExternalScorer(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  char path[4096];
  size_t n;
  NAPI_CALL(env, napi_get_value_string_utf8(env, argv[1], path, sizeof(path),
                                            &n));
  napi_create_int32(
      env,
      STT_EnableExternalScorer((ModelState*)get_external(env, argv[0]), path),
      &out);
  return out;
}

static napi_value DisableExternalScorer(napi_env env,
                                        napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  napi_create_int32(
      env,
      STT_DisableExternalScorer((ModelState*)get_external(env, argv[0])),
      &out);
  return out;
}

static napi_value SetScorerAlphaBeta(napi_env env, napi_callback_info info) {
  size_t argc = 3;
  napi_value argv[3], out;
  double alpha, beta;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  NAPI_CALL(env, napi_get_value_double(env, argv[1], &alpha));
  NAPI_CALL(env, napi_get_value_double(env, argv[2], &beta));
  napi_create_int32(
      env,
      STT_SetScorerAlphaBeta((ModelState*)get_external(env, argv[0]),
                             (float)alpha, (float)beta),
      &out);
  return out;
}

static napi_value AddHotWord(napi_env env, napi_callback_info info) {
  size_t argc = 3;
  napi_value argv[3], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  char word[1024];
  size_t n;
  double boost;
  NAPI_CALL(env, napi_get_value_string_utf8(env, argv[1], word, sizeof(word),
                                            &n));
  NAPI_CALL(env, napi_get_value_double(env, argv[2], &boost));
  napi_create_int32(
      env,
      STT_AddHotWord((ModelState*)get_external(env, argv[0]), word,
                     (float)boost),
      &out);
  return out;
}

static napi_value EraseHotWord(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  char word[1024];
  size_t n;
  NAPI_CALL(env, napi_get_value_string_utf8(env, argv[1], word, sizeof(word),
                                            &n));
  napi_create_int32(
      env, STT_EraseHotWord((ModelState*)get_external(env, argv[0]), word),
      &out);
  return out;
}

static napi_value ClearHotWords(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  napi_create_int32(
      env, STT_ClearHotWords((ModelState*)get_external(env, argv[0])), &out);
  return out;
}

/* -- one-shot -------------------------------------------------------------- */

static napi_value SpeechToText(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  unsigned int n_frames;
  short* pcm = get_pcm(env, argv[1], &n_frames);
  if (!pcm) {
    napi_throw_type_error(env, NULL, "expected Buffer or Int16Array");
    return NULL;
  }
  return owned_string_to_js(
      env,
      STT_SpeechToText((ModelState*)get_external(env, argv[0]), pcm,
                       n_frames));
}

static napi_value SpeechToTextWithMetadata(napi_env env,
                                           napi_callback_info info) {
  size_t argc = 3;
  napi_value argv[3];
  uint32_t num_results = 1;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  if (argc > 2) napi_get_value_uint32(env, argv[2], &num_results);
  unsigned int n_frames;
  short* pcm = get_pcm(env, argv[1], &n_frames);
  if (!pcm) {
    napi_throw_type_error(env, NULL, "expected Buffer or Int16Array");
    return NULL;
  }
  return metadata_to_js(
      env, STT_SpeechToTextWithMetadata((ModelState*)get_external(env, argv[0]),
                                        pcm, n_frames, num_results));
}

/* -- streaming ------------------------------------------------------------- */

static napi_value CreateStream(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  StreamingState* stream = NULL;
  int status =
      STT_CreateStream((ModelState*)get_external(env, argv[0]), &stream);
  napi_value out, jstatus, jstream;
  napi_create_object(env, &out);
  napi_create_int32(env, status, &jstatus);
  napi_set_named_property(env, out, "status", jstatus);
  if (status == STT_ERR_OK) {
    napi_create_external(env, stream, NULL, NULL, &jstream);
    napi_set_named_property(env, out, "stream", jstream);
  }
  return out;
}

static napi_value FeedAudioContent(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  unsigned int n_frames;
  short* pcm = get_pcm(env, argv[1], &n_frames);
  if (!pcm) {
    napi_throw_type_error(env, NULL, "expected Buffer or Int16Array");
    return NULL;
  }
  STT_FeedAudioContent((StreamingState*)get_external(env, argv[0]), pcm,
                       n_frames);
  return NULL;
}

static napi_value IntermediateDecode(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  return owned_string_to_js(
      env,
      STT_IntermediateDecode((StreamingState*)get_external(env, argv[0])));
}

static napi_value IntermediateDecodeWithMetadata(napi_env env,
                                                 napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2];
  uint32_t num_results = 1;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  if (argc > 1) napi_get_value_uint32(env, argv[1], &num_results);
  return metadata_to_js(
      env, STT_IntermediateDecodeWithMetadata(
               (StreamingState*)get_external(env, argv[0]), num_results));
}

static napi_value FinishStream(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  return owned_string_to_js(
      env, STT_FinishStream((StreamingState*)get_external(env, argv[0])));
}

static napi_value FinishStreamWithMetadata(napi_env env,
                                           napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2];
  uint32_t num_results = 1;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  if (argc > 1) napi_get_value_uint32(env, argv[1], &num_results);
  return metadata_to_js(
      env, STT_FinishStreamWithMetadata(
               (StreamingState*)get_external(env, argv[0]), num_results));
}

static napi_value FreeStream(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  STT_FreeStream((StreamingState*)get_external(env, argv[0]));
  return NULL;
}

/* -- misc ------------------------------------------------------------------ */

static napi_value Version(napi_env env, napi_callback_info info) {
  (void)info;
  return owned_string_to_js(env, STT_Version());
}

static napi_value ErrorCodeToErrorMessage(napi_env env,
                                          napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  int32_t code;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  NAPI_CALL(env, napi_get_value_int32(env, argv[0], &code));
  return owned_string_to_js(env, STT_ErrorCodeToErrorMessage(code));
}

/* STT_FreeMetadata / STT_FreeString are consumed internally (metadata_to_js,
 * owned_string_to_js) — no JS exposure needed. */

static napi_value Init(napi_env env, napi_value exports) {
  const struct {
    const char* name;
    napi_callback fn;
  } fns[] = {
      {"CreateModel", CreateModel},
      {"FreeModel", FreeModel},
      {"GetModelBeamWidth", GetModelBeamWidth},
      {"SetModelBeamWidth", SetModelBeamWidth},
      {"GetModelSampleRate", GetModelSampleRate},
      {"EnableExternalScorer", EnableExternalScorer},
      {"DisableExternalScorer", DisableExternalScorer},
      {"SetScorerAlphaBeta", SetScorerAlphaBeta},
      {"AddHotWord", AddHotWord},
      {"EraseHotWord", EraseHotWord},
      {"ClearHotWords", ClearHotWords},
      {"SpeechToText", SpeechToText},
      {"SpeechToTextWithMetadata", SpeechToTextWithMetadata},
      {"CreateStream", CreateStream},
      {"FeedAudioContent", FeedAudioContent},
      {"IntermediateDecode", IntermediateDecode},
      {"IntermediateDecodeWithMetadata", IntermediateDecodeWithMetadata},
      {"FinishStream", FinishStream},
      {"FinishStreamWithMetadata", FinishStreamWithMetadata},
      {"FreeStream", FreeStream},
      {"Version", Version},
      {"ErrorCodeToErrorMessage", ErrorCodeToErrorMessage},
  };
  for (size_t i = 0; i < sizeof(fns) / sizeof(fns[0]); ++i) {
    napi_value fn;
    NAPI_CALL(env, napi_create_function(env, fns[i].name, NAPI_AUTO_LENGTH,
                                        fns[i].fn, NULL, &fn));
    NAPI_CALL(env, napi_set_named_property(env, exports, fns[i].name, fn));
  }
  return exports;
}

NAPI_MODULE(stt_tpu, Init)
