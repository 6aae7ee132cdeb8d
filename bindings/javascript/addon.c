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

/* Unwrap a native handle created with napi_create_external. Throws a JS
 * error (and returns NULL) when the value is not an external or carries a
 * NULL pointer — e.g. a Stream used after finishStream() or a wrong-typed
 * argument — instead of letting the C API dereference garbage. */
static void* get_external(napi_env env, napi_value v) {
  napi_valuetype vt;
  if (napi_typeof(env, v, &vt) != napi_ok || vt != napi_external) {
    napi_throw_type_error(env, NULL, "expected a native stt handle");
    return NULL;
  }
  void* p = NULL;
  if (napi_get_value_external(env, v, &p) != napi_ok || p == NULL) {
    napi_throw_error(env, NULL,
                     "invalid or already-freed native stt handle");
    return NULL;
  }
  return p;
}

/* Accepts a Node Buffer or Int16Array of 16-bit PCM; returns pointer+frames.
 * Any other TypedArray is rejected — treating e.g. a Float32Array's element
 * count as a byte count would silently decode garbage audio. */
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
    if (type != napi_int16_array) return NULL;
    len *= 2; /* elements → bytes */
  }
  *n_frames = (unsigned int)(len / 2);
  return (short*)data;
}

/* Read a JS string argument into a heap buffer of exactly the right size —
 * fixed stack buffers would silently truncate long paths/words and e.g.
 * load a model from a wrong truncated path. Caller frees. */
static char* get_string(napi_env env, napi_value v) {
  size_t len = 0;
  if (napi_get_value_string_utf8(env, v, NULL, 0, &len) != napi_ok) {
    napi_throw_type_error(env, NULL, "expected a string");
    return NULL;
  }
  char* buf = (char*)malloc(len + 1);
  if (!buf) {
    napi_throw_error(env, NULL, "out of memory");
    return NULL;
  }
  size_t copied = 0;
  if (napi_get_value_string_utf8(env, v, buf, len + 1, &copied) != napi_ok) {
    free(buf);
    napi_throw_type_error(env, NULL, "expected a string");
    return NULL;
  }
  return buf;
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
  char* path = get_string(env, argv[0]);
  if (!path) return NULL;
  ModelState* model = NULL;
  int status = STT_CreateModel(path, &model);
  free(path);
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
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  STT_FreeModel(model);
  return NULL;
}

static napi_value GetModelBeamWidth(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  napi_create_uint32(env, STT_GetModelBeamWidth(model), &out);
  return out;
}

static napi_value SetModelBeamWidth(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2], out;
  uint32_t width;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  NAPI_CALL(env, napi_get_value_uint32(env, argv[1], &width));
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  napi_create_int32(env, STT_SetModelBeamWidth(model, width), &out);
  return out;
}

static napi_value GetModelSampleRate(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  napi_create_int32(env, STT_GetModelSampleRate(model), &out);
  return out;
}

/* -- scorer + hot words ---------------------------------------------------- */

static napi_value EnableExternalScorer(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  char* path = get_string(env, argv[1]);
  if (!path) return NULL;
  int status = STT_EnableExternalScorer(model, path);
  free(path);
  napi_create_int32(env, status, &out);
  return out;
}

static napi_value DisableExternalScorer(napi_env env,
                                        napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  napi_create_int32(env, STT_DisableExternalScorer(model), &out);
  return out;
}

static napi_value SetScorerAlphaBeta(napi_env env, napi_callback_info info) {
  size_t argc = 3;
  napi_value argv[3], out;
  double alpha, beta;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  NAPI_CALL(env, napi_get_value_double(env, argv[1], &alpha));
  NAPI_CALL(env, napi_get_value_double(env, argv[2], &beta));
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  napi_create_int32(env,
                    STT_SetScorerAlphaBeta(model, (float)alpha, (float)beta),
                    &out);
  return out;
}

static napi_value AddHotWord(napi_env env, napi_callback_info info) {
  size_t argc = 3;
  napi_value argv[3], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  double boost;
  NAPI_CALL(env, napi_get_value_double(env, argv[2], &boost));
  char* word = get_string(env, argv[1]);
  if (!word) return NULL;
  int status = STT_AddHotWord(model, word, (float)boost);
  free(word);
  napi_create_int32(env, status, &out);
  return out;
}

static napi_value EraseHotWord(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  char* word = get_string(env, argv[1]);
  if (!word) return NULL;
  int status = STT_EraseHotWord(model, word);
  free(word);
  napi_create_int32(env, status, &out);
  return out;
}

static napi_value ClearHotWords(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1], out;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  napi_create_int32(env, STT_ClearHotWords(model), &out);
  return out;
}

/* -- one-shot -------------------------------------------------------------- */

static napi_value SpeechToText(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  unsigned int n_frames;
  short* pcm = get_pcm(env, argv[1], &n_frames);
  if (!pcm) {
    napi_throw_type_error(env, NULL, "expected Buffer or Int16Array");
    return NULL;
  }
  return owned_string_to_js(env, STT_SpeechToText(model, pcm, n_frames));
}

static napi_value SpeechToTextWithMetadata(napi_env env,
                                           napi_callback_info info) {
  size_t argc = 3;
  napi_value argv[3];
  uint32_t num_results = 1;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  if (argc > 2) napi_get_value_uint32(env, argv[2], &num_results);
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  unsigned int n_frames;
  short* pcm = get_pcm(env, argv[1], &n_frames);
  if (!pcm) {
    napi_throw_type_error(env, NULL, "expected Buffer or Int16Array");
    return NULL;
  }
  return metadata_to_js(
      env, STT_SpeechToTextWithMetadata(model, pcm, n_frames, num_results));
}

/* -- streaming ------------------------------------------------------------- */

static napi_value CreateStream(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  ModelState* model = (ModelState*)get_external(env, argv[0]);
  if (!model) return NULL;
  StreamingState* stream = NULL;
  int status = STT_CreateStream(model, &stream);
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
  StreamingState* stream = (StreamingState*)get_external(env, argv[0]);
  if (!stream) return NULL;
  unsigned int n_frames;
  short* pcm = get_pcm(env, argv[1], &n_frames);
  if (!pcm) {
    napi_throw_type_error(env, NULL, "expected Buffer or Int16Array");
    return NULL;
  }
  STT_FeedAudioContent(stream, pcm, n_frames);
  return NULL;
}

static napi_value IntermediateDecode(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  StreamingState* stream = (StreamingState*)get_external(env, argv[0]);
  if (!stream) return NULL;
  return owned_string_to_js(env, STT_IntermediateDecode(stream));
}

static napi_value IntermediateDecodeWithMetadata(napi_env env,
                                                 napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2];
  uint32_t num_results = 1;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  if (argc > 1) napi_get_value_uint32(env, argv[1], &num_results);
  StreamingState* stream = (StreamingState*)get_external(env, argv[0]);
  if (!stream) return NULL;
  return metadata_to_js(
      env, STT_IntermediateDecodeWithMetadata(stream, num_results));
}

static napi_value FinishStream(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  StreamingState* stream = (StreamingState*)get_external(env, argv[0]);
  if (!stream) return NULL;
  return owned_string_to_js(env, STT_FinishStream(stream));
}

static napi_value FinishStreamWithMetadata(napi_env env,
                                           napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2];
  uint32_t num_results = 1;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  if (argc > 1) napi_get_value_uint32(env, argv[1], &num_results);
  StreamingState* stream = (StreamingState*)get_external(env, argv[0]);
  if (!stream) return NULL;
  return metadata_to_js(env,
                        STT_FinishStreamWithMetadata(stream, num_results));
}

static napi_value FreeStream(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, NULL, NULL));
  StreamingState* stream = (StreamingState*)get_external(env, argv[0]);
  if (!stream) return NULL;
  STT_FreeStream(stream);
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
