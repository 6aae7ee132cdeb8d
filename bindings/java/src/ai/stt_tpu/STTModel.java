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

    /** Feed 16-bit 16 kHz mono PCM. */
    public void feedAudioContent(short[] pcm) {
      nativeFeedAudioContent(streamHandle, pcm);
    }

    /** Non-destructive decode of the audio fed so far. */
    public String intermediateDecode() {
      return nativeIntermediateDecode(streamHandle);
    }

    public Metadata intermediateDecodeWithMetadata(int numResults) {
      return nativeIntermediateDecodeWithMetadata(streamHandle, numResults);
    }

    /** Final decode; the stream becomes unusable afterwards. */
    public String finishStream() {
      String text = nativeFinishStream(streamHandle);
      streamHandle = 0;
      return text;
    }

    public Metadata finishStreamWithMetadata(int numResults) {
      Metadata m = nativeFinishStreamWithMetadata(streamHandle, numResults);
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

  public int beamWidth() {
    return nativeBeamWidth(handle);
  }

  public void setBeamWidth(int width) {
    STTException.check(nativeSetBeamWidth(handle, width));
  }

  public int sampleRate() {
    return nativeSampleRate(handle);
  }

  public void enableExternalScorer(String scorerPath) {
    STTException.check(nativeEnableExternalScorer(handle, scorerPath));
  }

  public void disableExternalScorer() {
    STTException.check(nativeDisableExternalScorer(handle));
  }

  public void setScorerAlphaBeta(float alpha, float beta) {
    STTException.check(nativeSetScorerAlphaBeta(handle, alpha, beta));
  }

  public void addHotWord(String word, float boost) {
    STTException.check(nativeAddHotWord(handle, word, boost));
  }

  public void eraseHotWord(String word) {
    STTException.check(nativeEraseHotWord(handle, word));
  }

  public void clearHotWords() {
    STTException.check(nativeClearHotWords(handle));
  }

  /** One-shot recognition of 16-bit 16 kHz mono PCM. */
  public String stt(short[] pcm) {
    return nativeSpeechToText(handle, pcm);
  }

  public Metadata sttWithMetadata(short[] pcm, int numResults) {
    return nativeSpeechToTextWithMetadata(handle, pcm, numResults);
  }

  public Stream createStream() throws IOException {
    return new Stream(nativeCreateStream(handle));
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
