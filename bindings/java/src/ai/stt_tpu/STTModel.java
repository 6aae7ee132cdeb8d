package ai.stt_tpu;

import java.io.IOException;

/**
 * Java binding for the stt_tpu speech-to-text framework — counterpart of the
 * reference's native_client/java SWIG binding (STTModel class), rebuilt over
 * the hand-written JNI shim (jni/stt_jni.c) against the libstt_tpu C API.
 *
 * <pre>{@code
 * try (STTModel model = new STTModel("/path/to/artifact")) {
 *   model.enableExternalScorer("/path/to/ls.scorer");
 *   String text = model.stt(pcm16kMono);
 * }
 * }</pre>
 */
public final class STTModel implements AutoCloseable {
  static {
    System.loadLibrary("stt_tpu_jni");
  }

  private long handle;

  public STTModel(String modelPath) throws IOException {
    handle = nativeCreateModel(modelPath);
  }

  /** Streaming recognition session; one model serves many streams. */
  public final class Stream implements AutoCloseable {
    private long streamHandle;

    private Stream(long streamHandle) {
      this.streamHandle = streamHandle;
    }

    private long checkedHandle() {
      if (streamHandle == 0) {
        throw new IllegalStateException(
            "Stream already finished or closed");
      }
      return streamHandle;
    }

    /** Feed 16-bit 16 kHz mono PCM. */
    public void feedAudioContent(short[] pcm) {
      nativeFeedAudioContent(checkedHandle(), pcm);
    }

    /** Non-destructive decode of the audio fed so far. */
    public String intermediateDecode() {
      return nativeIntermediateDecode(checkedHandle());
    }

    public Metadata intermediateDecodeWithMetadata(int numResults) {
      return nativeIntermediateDecodeWithMetadata(checkedHandle(), numResults);
    }

    /** Final decode; the stream becomes unusable afterwards. */
    public String finishStream() {
      String text = nativeFinishStream(checkedHandle());
      streamHandle = 0;
      return text;
    }

    public Metadata finishStreamWithMetadata(int numResults) {
      Metadata m = nativeFinishStreamWithMetadata(checkedHandle(), numResults);
      streamHandle = 0;
      return m;
    }

    @Override
    public void close() {
      if (streamHandle != 0) {
        nativeFreeStream(streamHandle);
        streamHandle = 0;
      }
    }
  }

  private long checkedModelHandle() {
    if (handle == 0) {
      throw new IllegalStateException("Model already closed");
    }
    return handle;
  }

  public int beamWidth() {
    return nativeBeamWidth(checkedModelHandle());
  }

  public void setBeamWidth(int width) {
    STTException.check(nativeSetBeamWidth(checkedModelHandle(), width));
  }

  public int sampleRate() {
    return nativeSampleRate(checkedModelHandle());
  }

  public void enableExternalScorer(String scorerPath) {
    STTException.check(nativeEnableExternalScorer(checkedModelHandle(), scorerPath));
  }

  public void disableExternalScorer() {
    STTException.check(nativeDisableExternalScorer(checkedModelHandle()));
  }

  public void setScorerAlphaBeta(float alpha, float beta) {
    STTException.check(nativeSetScorerAlphaBeta(checkedModelHandle(), alpha, beta));
  }

  public void addHotWord(String word, float boost) {
    STTException.check(nativeAddHotWord(checkedModelHandle(), word, boost));
  }

  public void eraseHotWord(String word) {
    STTException.check(nativeEraseHotWord(checkedModelHandle(), word));
  }

  public void clearHotWords() {
    STTException.check(nativeClearHotWords(checkedModelHandle()));
  }

  /** One-shot recognition of 16-bit 16 kHz mono PCM. */
  public String stt(short[] pcm) {
    return nativeSpeechToText(checkedModelHandle(), pcm);
  }

  public Metadata sttWithMetadata(short[] pcm, int numResults) {
    return nativeSpeechToTextWithMetadata(checkedModelHandle(), pcm, numResults);
  }

  public Stream createStream() throws IOException {
    return new Stream(nativeCreateStream(checkedModelHandle()));
  }

  public static String version() {
    return nativeVersion();
  }

  public static String errorCodeToErrorMessage(int code) {
    return nativeErrorCodeToErrorMessage(code);
  }

  @Override
  public void close() {
    if (handle != 0) {
      nativeFreeModel(handle);
      handle = 0;
    }
  }

  private static native long nativeCreateModel(String modelPath)
      throws IOException;

  private static native void nativeFreeModel(long handle);

  private static native int nativeBeamWidth(long handle);

  private static native int nativeSetBeamWidth(long handle, int width);

  private static native int nativeSampleRate(long handle);

  private static native int nativeEnableExternalScorer(long handle,
      String scorerPath);

  private static native int nativeDisableExternalScorer(long handle);

  private static native int nativeSetScorerAlphaBeta(long handle, float alpha,
      float beta);

  private static native int nativeAddHotWord(long handle, String word,
      float boost);

  private static native int nativeEraseHotWord(long handle, String word);

  private static native int nativeClearHotWords(long handle);

  private static native String nativeSpeechToText(long handle, short[] pcm);

  private static native Metadata nativeSpeechToTextWithMetadata(long handle,
      short[] pcm, int numResults);

  private static native long nativeCreateStream(long handle)
      throws IOException;

  private static native void nativeFeedAudioContent(long stream, short[] pcm);

  private static native String nativeIntermediateDecode(long stream);

  private static native Metadata nativeIntermediateDecodeWithMetadata(
      long stream, int numResults);

  private static native String nativeFinishStream(long stream);

  private static native Metadata nativeFinishStreamWithMetadata(long stream,
      int numResults);

  private static native void nativeFreeStream(long stream);

  private static native String nativeVersion();

  private static native String nativeErrorCodeToErrorMessage(int code);
}
