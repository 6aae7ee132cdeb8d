/* JNI shim binding the stt_tpu C API into the ai.stt_tpu Java package.
 *
 * Counterpart of the reference's native_client/java/jni/stt.i (SWIG JNI) —
 * rebuilt as a hand-written JNI layer: native handles travel as jlong,
 * Metadata is marshalled eagerly into ai.stt_tpu.{Metadata,
 * CandidateTranscript,TokenMetadata} objects and freed before returning.
 *
 * Build (requires a JDK):
 *   gcc -shared -fPIC -I$JAVA_HOME/include -I$JAVA_HOME/include/linux \
 *       stt_jni.c -L../../../stt_tpu/native -lstt_tpu -o libstt_tpu_jni.so
 */
#include <jni.h>
#include <stdint.h>
#include <stdlib.h>

#include "../../../stt_tpu/native/stt_tpu.h"

#define JNIFN(ret, name) \
  JNIEXPORT ret JNICALL Java_ai_stt_1tpu_STTModel_##name

#include <string.h>

/* Build a java.lang.String from raw UTF-8 bytes via new String(byte[],
 * "UTF-8"). NewStringUTF expects *modified* UTF-8 — feeding it raw UTF-8
 * containing 4-byte sequences (codepoints outside the BMP) is undefined
 * behavior — so transcripts/tokens are marshalled through a byte[]. */
static jstring utf8_to_jstring(JNIEnv* env, const char* s) {
  if (!s) s = "";
  size_t n = strlen(s);
  jbyteArray bytes = (*env)->NewByteArray(env, (jsize)n);
  if (!bytes || (*env)->ExceptionCheck(env)) return NULL;
  (*env)->SetByteArrayRegion(env, bytes, 0, (jsize)n, (const jbyte*)s);
  jclass str_cls = (*env)->FindClass(env, "java/lang/String");
  jmethodID str_init =
      str_cls ? (*env)->GetMethodID(env, str_cls, "<init>",
                                    "([BLjava/lang/String;)V")
              : NULL;
  jstring charset =
      str_init ? (*env)->NewStringUTF(env, "UTF-8") : NULL;
  if (!charset || (*env)->ExceptionCheck(env)) {
    (*env)->DeleteLocalRef(env, bytes);
    return NULL;
  }
  jstring out =
      (jstring)(*env)->NewObject(env, str_cls, str_init, bytes, charset);
  (*env)->DeleteLocalRef(env, bytes);
  (*env)->DeleteLocalRef(env, charset);
  return out;
}

static jobject metadata_to_java(JNIEnv* env, Metadata* m) {
  jclass tok_cls = (*env)->FindClass(env, "ai/stt_tpu/TokenMetadata");
  jclass ct_cls = (*env)->FindClass(env, "ai/stt_tpu/CandidateTranscript");
  jclass meta_cls = (*env)->FindClass(env, "ai/stt_tpu/Metadata");
  if (!tok_cls || !ct_cls || !meta_cls || (*env)->ExceptionCheck(env))
    goto fail;
  jmethodID tok_init =
      (*env)->GetMethodID(env, tok_cls, "<init>", "(Ljava/lang/String;IF)V");
  jmethodID ct_init = (*env)->GetMethodID(
      env, ct_cls, "<init>", "([Lai/stt_tpu/TokenMetadata;D)V");
  jmethodID meta_init = (*env)->GetMethodID(
      env, meta_cls, "<init>", "([Lai/stt_tpu/CandidateTranscript;)V");
  if (!tok_init || !ct_init || !meta_init || (*env)->ExceptionCheck(env))
    goto fail;

  unsigned int n_ct = m ? m->num_transcripts : 0;
  jobjectArray cts = (*env)->NewObjectArray(env, n_ct, ct_cls, NULL);
  if (!cts || (*env)->ExceptionCheck(env)) goto fail;
  for (unsigned int i = 0; i < n_ct; ++i) {
    const CandidateTranscript* ct = &m->transcripts[i];
    jobjectArray toks =
        (*env)->NewObjectArray(env, ct->num_tokens, tok_cls, NULL);
    if (!toks || (*env)->ExceptionCheck(env)) goto fail;
    for (unsigned int t = 0; t < ct->num_tokens; ++t) {
      const TokenMetadata* tok = &ct->tokens[t];
      jstring text = utf8_to_jstring(env, tok->text);
      if (!text || (*env)->ExceptionCheck(env)) goto fail;
      jobject jtok = (*env)->NewObject(env, tok_cls, tok_init, text,
                                       (jint)tok->timestep,
                                       (jfloat)tok->start_time);
      if (!jtok || (*env)->ExceptionCheck(env)) goto fail;
      (*env)->SetObjectArrayElement(env, toks, t, jtok);
      (*env)->DeleteLocalRef(env, jtok);
      (*env)->DeleteLocalRef(env, text);
      if ((*env)->ExceptionCheck(env)) goto fail;
    }
    jobject jct = (*env)->NewObject(env, ct_cls, ct_init, toks,
                                    (jdouble)ct->confidence);
    if (!jct || (*env)->ExceptionCheck(env)) goto fail;
    (*env)->SetObjectArrayElement(env, cts, i, jct);
    (*env)->DeleteLocalRef(env, jct);
    (*env)->DeleteLocalRef(env, toks);
    if ((*env)->ExceptionCheck(env)) goto fail;
  }
  if (m) STT_FreeMetadata(m);
  return (*env)->NewObject(env, meta_cls, meta_init, cts);

fail:
  /* Leave the pending JNI exception for the caller; just release the
   * native metadata so it cannot leak. */
  if (m) STT_FreeMetadata(m);
  return NULL;
}

static jstring owned_string_to_java(JNIEnv* env, char* s) {
  jstring out = utf8_to_jstring(env, s);
  if (s) STT_FreeString(s);
  return out;
}

JNIFN(jlong, nativeCreateModel)(JNIEnv* env, jclass cls, jstring model_path) {
  (void)cls;
  const char* path = (*env)->GetStringUTFChars(env, model_path, NULL);
  ModelState* model = NULL;
  int status = STT_CreateModel(path, &model);
  (*env)->ReleaseStringUTFChars(env, model_path, path);
  if (status != STT_ERR_OK) {
    char* msg = STT_ErrorCodeToErrorMessage(status);
    (*env)->ThrowNew(env, (*env)->FindClass(env, "java/io/IOException"),
                     msg ? msg : "STT_CreateModel failed");
    if (msg) STT_FreeString(msg);
    return 0;
  }
  return (jlong)(intptr_t)model;
}

JNIFN(void, nativeFreeModel)(JNIEnv* env, jclass cls, jlong handle) {
  (void)env;
  (void)cls;
  STT_FreeModel((ModelState*)(intptr_t)handle);
}

JNIFN(jint, nativeBeamWidth)(JNIEnv* env, jclass cls, jlong handle) {
  (void)env;
  (void)cls;
  return (jint)STT_GetModelBeamWidth((ModelState*)(intptr_t)handle);
}

JNIFN(jint, nativeSetBeamWidth)(JNIEnv* env, jclass cls, jlong handle,
                                jint width) {
  (void)env;
  (void)cls;
  return STT_SetModelBeamWidth((ModelState*)(intptr_t)handle,
                               (unsigned int)width);
}

JNIFN(jint, nativeSampleRate)(JNIEnv* env, jclass cls, jlong handle) {
  (void)env;
  (void)cls;
  return STT_GetModelSampleRate((ModelState*)(intptr_t)handle);
}

JNIFN(jint, nativeEnableExternalScorer)(JNIEnv* env, jclass cls, jlong handle,
                                        jstring scorer_path) {
  (void)cls;
  const char* path = (*env)->GetStringUTFChars(env, scorer_path, NULL);
  int status = STT_EnableExternalScorer((ModelState*)(intptr_t)handle, path);
  (*env)->ReleaseStringUTFChars(env, scorer_path, path);
  return status;
}

JNIFN(jint, nativeDisableExternalScorer)(JNIEnv* env, jclass cls,
                                         jlong handle) {
  (void)env;
  (void)cls;
  return STT_DisableExternalScorer((ModelState*)(intptr_t)handle);
}

JNIFN(jint, nativeSetScorerAlphaBeta)(JNIEnv* env, jclass cls, jlong handle,
                                      jfloat alpha, jfloat beta) {
  (void)env;
  (void)cls;
  return STT_SetScorerAlphaBeta((ModelState*)(intptr_t)handle, alpha, beta);
}

JNIFN(jint, nativeAddHotWord)(JNIEnv* env, jclass cls, jlong handle,
                              jstring word, jfloat boost) {
  (void)cls;
  const char* w = (*env)->GetStringUTFChars(env, word, NULL);
  int status = STT_AddHotWord((ModelState*)(intptr_t)handle, w, boost);
  (*env)->ReleaseStringUTFChars(env, word, w);
  return status;
}

JNIFN(jint, nativeEraseHotWord)(JNIEnv* env, jclass cls, jlong handle,
                                jstring word) {
  (void)cls;
  const char* w = (*env)->GetStringUTFChars(env, word, NULL);
  int status = STT_EraseHotWord((ModelState*)(intptr_t)handle, w);
  (*env)->ReleaseStringUTFChars(env, word, w);
  return status;
}

JNIFN(jint, nativeClearHotWords)(JNIEnv* env, jclass cls, jlong handle) {
  (void)env;
  (void)cls;
  return STT_ClearHotWords((ModelState*)(intptr_t)handle);
}

JNIFN(jstring, nativeSpeechToText)(JNIEnv* env, jclass cls, jlong handle,
                                   jshortArray pcm) {
  (void)cls;
  jsize n = (*env)->GetArrayLength(env, pcm);
  jshort* buf = (*env)->GetShortArrayElements(env, pcm, NULL);
  char* text = STT_SpeechToText((ModelState*)(intptr_t)handle, buf,
                                (unsigned int)n);
  (*env)->ReleaseShortArrayElements(env, pcm, buf, JNI_ABORT);
  return owned_string_to_java(env, text);
}

JNIFN(jobject, nativeSpeechToTextWithMetadata)(JNIEnv* env, jclass cls,
                                               jlong handle, jshortArray pcm,
                                               jint num_results) {
  (void)cls;
  jsize n = (*env)->GetArrayLength(env, pcm);
  jshort* buf = (*env)->GetShortArrayElements(env, pcm, NULL);
  Metadata* m = STT_SpeechToTextWithMetadata(
      (ModelState*)(intptr_t)handle, buf, (unsigned int)n,
      (unsigned int)num_results);
  (*env)->ReleaseShortArrayElements(env, pcm, buf, JNI_ABORT);
  return metadata_to_java(env, m);
}

JNIFN(jlong, nativeCreateStream)(JNIEnv* env, jclass cls, jlong handle) {
  (void)cls;
  StreamingState* stream = NULL;
  int status = STT_CreateStream((ModelState*)(intptr_t)handle, &stream);
  if (status != STT_ERR_OK) {
    char* msg = STT_ErrorCodeToErrorMessage(status);
    (*env)->ThrowNew(env, (*env)->FindClass(env, "java/io/IOException"),
                     msg ? msg : "STT_CreateStream failed");
    if (msg) STT_FreeString(msg);
    return 0;
  }
  return (jlong)(intptr_t)stream;
}

JNIFN(void, nativeFeedAudioContent)(JNIEnv* env, jclass cls, jlong stream,
                                    jshortArray pcm) {
  (void)cls;
  jsize n = (*env)->GetArrayLength(env, pcm);
  jshort* buf = (*env)->GetShortArrayElements(env, pcm, NULL);
  STT_FeedAudioContent((StreamingState*)(intptr_t)stream, buf,
                       (unsigned int)n);
  (*env)->ReleaseShortArrayElements(env, pcm, buf, JNI_ABORT);
}

JNIFN(jstring, nativeIntermediateDecode)(JNIEnv* env, jclass cls,
                                         jlong stream) {
  (void)cls;
  return owned_string_to_java(
      env, STT_IntermediateDecode((StreamingState*)(intptr_t)stream));
}

JNIFN(jobject, nativeIntermediateDecodeWithMetadata)(JNIEnv* env, jclass cls,
                                                     jlong stream,
                                                     jint num_results) {
  (void)cls;
  return metadata_to_java(
      env, STT_IntermediateDecodeWithMetadata(
               (StreamingState*)(intptr_t)stream, (unsigned int)num_results));
}

JNIFN(jstring, nativeFinishStream)(JNIEnv* env, jclass cls, jlong stream) {
  (void)cls;
  return owned_string_to_java(
      env, STT_FinishStream((StreamingState*)(intptr_t)stream));
}

JNIFN(jobject, nativeFinishStreamWithMetadata)(JNIEnv* env, jclass cls,
                                               jlong stream,
                                               jint num_results) {
  (void)cls;
  return metadata_to_java(
      env, STT_FinishStreamWithMetadata((StreamingState*)(intptr_t)stream,
                                        (unsigned int)num_results));
}

JNIFN(void, nativeFreeStream)(JNIEnv* env, jclass cls, jlong stream) {
  (void)env;
  (void)cls;
  STT_FreeStream((StreamingState*)(intptr_t)stream);
}

JNIFN(jstring, nativeVersion)(JNIEnv* env, jclass cls) {
  (void)cls;
  return owned_string_to_java(env, STT_Version());
}

JNIFN(jstring, nativeErrorCodeToErrorMessage)(JNIEnv* env, jclass cls,
                                              jint code) {
  (void)cls;
  return owned_string_to_java(env, STT_ErrorCodeToErrorMessage(code));
}
