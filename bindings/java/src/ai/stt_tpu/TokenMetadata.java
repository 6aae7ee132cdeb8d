package ai.stt_tpu;

/**
 * One recognized token and its timing. startTime = timestep * window_step /
 * sample_rate (same semantics as the reference's modelstate.cc:55).
 */
public final class TokenMetadata {
  private final String text;
  private final int timestep;
  private final float startTime;

  public TokenMetadata(String text, int timestep, float startTime) {
    this.text = text;
    this.timestep = timestep;
    this.startTime = startTime;
  }

  public String getText() {
    return text;
  }

  public int getTimestep() {
    return timestep;
  }

  public float getStartTime() {
    return startTime;
  }
}
