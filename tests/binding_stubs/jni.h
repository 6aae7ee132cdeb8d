/* Minimal jni.h stub — declarations only, for compile-smoke testing
 * bindings/java/jni/stt_jni.c in images without a JDK
 * (tests/test_bindings.py::test_jni_shim_compiles). Mirrors the real JNI
 * C interface shapes (JNIEnv = pointer to function-pointer table) for
 * exactly the calls the shim uses. */
#ifndef STT_TPU_TEST_JNI_STUB_H
#define STT_TPU_TEST_JNI_STUB_H

#include <stddef.h>
#include <stdint.h>

#define JNIEXPORT
#define JNICALL

typedef uint8_t jboolean;
typedef int8_t jbyte;
typedef uint16_t jchar;
typedef int16_t jshort;
typedef int32_t jint;
typedef int64_t jlong;
typedef float jfloat;
typedef double jdouble;
typedef jint jsize;

typedef void* jobject;
typedef jobject jclass;
typedef jobject jstring;
typedef jobject jarray;
typedef jobject jobjectArray;
typedef jobject jbyteArray;
typedef jobject jshortArray;
typedef jobject jthrowable;
typedef void* jmethodID;

#define JNI_FALSE 0
#define JNI_TRUE 1
#define JNI_ABORT 2

struct JNINativeInterface_;
typedef const struct JNINativeInterface_* JNIEnv;

struct JNINativeInterface_ {
  jclass (*FindClass)(JNIEnv* env, const char* name);
  jmethodID (*GetMethodID)(JNIEnv* env, jclass clazz, const char* name,
                           const char* sig);
  jobject (*NewObject)(JNIEnv* env, jclass clazz, jmethodID methodID, ...);
  jobjectArray (*NewObjectArray)(JNIEnv* env, jsize length,
                                 jclass elementClass, jobject initialElement);
  void (*SetObjectArrayElement)(JNIEnv* env, jobjectArray array, jsize index,
                                jobject value);
  jbyteArray (*NewByteArray)(JNIEnv* env, jsize length);
  void (*SetByteArrayRegion)(JNIEnv* env, jbyteArray array, jsize start,
                             jsize len, const jbyte* buf);
  jstring (*NewStringUTF)(JNIEnv* env, const char* bytes);
  const char* (*GetStringUTFChars)(JNIEnv* env, jstring string,
                                   jboolean* isCopy);
  void (*ReleaseStringUTFChars)(JNIEnv* env, jstring string,
                                const char* utf);
  jsize (*GetArrayLength)(JNIEnv* env, jarray array);
  jshort* (*GetShortArrayElements)(JNIEnv* env, jshortArray array,
                                   jboolean* isCopy);
  void (*ReleaseShortArrayElements)(JNIEnv* env, jshortArray array,
                                    jshort* elems, jint mode);
  void (*DeleteLocalRef)(JNIEnv* env, jobject localRef);
  jint (*ThrowNew)(JNIEnv* env, jclass clazz, const char* message);
  jboolean (*ExceptionCheck)(JNIEnv* env);
};

#endif /* STT_TPU_TEST_JNI_STUB_H */
