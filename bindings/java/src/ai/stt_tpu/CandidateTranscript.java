package ai.stt_tpu;

/** One candidate transcript with per-token timing and overall confidence. */
public final class CandidateTranscript {
  private final TokenMetadata[] tokens;
  private final double confidence;

  public CandidateTranscript(TokenMetadata[] tokens, double confidence) {
    this.tokens = tokens;
    this.confidence = confidence;
  }

  public TokenMetadata[] getTokens() {
    return tokens;
  }

  public double getConfidence() {
    return confidence;
  }

  public String getText() {
    StringBuilder sb = new StringBuilder();
    for (TokenMetadata t : tokens) {
      sb.append(t.getText());
    }
    return sb.toString();
  }
}
