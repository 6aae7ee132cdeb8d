// TypeScript declarations for the stt_tpu Node.js binding
// (counterpart of native_client/javascript/index.ts type surface).

export interface TokenMetadata {
  text: string;
  timestep: number;
  startTime: number;
}

export interface CandidateTranscript {
  tokens: TokenMetadata[];
  confidence: number;
}

export interface Metadata {
  transcripts: CandidateTranscript[];
}

export type PCM = Buffer | Int16Array;

export class STTError extends Error {
  code: number;
}

export class Stream {
  feedAudioContent(pcm: PCM): void;
  intermediateDecode(): string;
  intermediateDecodeWithMetadata(numResults?: number): Metadata;
  finishStream(): string;
  finishStreamWithMetadata(numResults?: number): Metadata;
  discard(): void;
}

export class Model {
  constructor(modelPath: string);
  beamWidth(): number;
  setBeamWidth(width: number): void;
  sampleRate(): number;
  enableExternalScorer(scorerPath: string): void;
  disableExternalScorer(): void;
  setScorerAlphaBeta(alpha: number, beta: number): void;
  addHotWord(word: string, boost: number): void;
  eraseHotWord(word: string): void;
  clearHotWords(): void;
  stt(pcm: PCM): string;
  sttWithMetadata(pcm: PCM, numResults?: number): Metadata;
  createStream(): Stream;
  free(): void;
}

export function Version(): string;
