package ai.stt_tpu;

/** Recognition result metadata: n-best candidate transcripts. */
public final class Metadata {
  private final CandidateTranscript[] transcripts;

  public Metadata(CandidateTranscript[] transcripts) {
    this.transcripts = transcripts;
  }

  public CandidateTranscript[] getTranscripts() {
    return transcripts;
  }
}
