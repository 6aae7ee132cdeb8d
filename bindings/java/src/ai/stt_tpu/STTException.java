package ai.stt_tpu;

/** Raised when a libstt_tpu call returns a non-OK status code. */
public final class STTException extends RuntimeException {
  private final int code;

  public STTException(int code) {
    super(STTModel.errorCodeToErrorMessage(code));
    this.code = code;
  }

  public int getCode() {
    return code;
  }

  static void check(int status) {
    if (status != 0) {
      throw new STTException(status);
    }
  }
}
