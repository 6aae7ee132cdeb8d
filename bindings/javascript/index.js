// Node.js binding for stt_tpu — idiomatic Model/Stream classes over the
// N-API addon (addon.c), mirroring the reference's
// native_client/javascript/index.ts surface.
"use strict";

const binding = require("./build/Release/stt_tpu.node");

/** Error raised when a C API call returns a non-OK status. */
class STTError extends Error {
  constructor(code) {
    super(binding.ErrorCodeToErrorMessage(code));
    this.name = "STTError";
    this.code = code;
  }
}

function check(status) {
  if (status !== 0) throw new STTError(status);
  return status;
}

class Stream {
  constructor(handle) {
    this._handle = handle;
  }

  /** Feed 16-bit 16 kHz mono PCM (Buffer or Int16Array). */
  feedAudioContent(pcm) {
    binding.FeedAudioContent(this._handle, pcm);
  }

  /** Non-destructive decode of the audio fed so far. */
  intermediateDecode() {
    return binding.IntermediateDecode(this._handle);
  }

  intermediateDecodeWithMetadata(numResults = 1) {
    return binding.IntermediateDecodeWithMetadata(this._handle, numResults);
  }

  /** Final decode; the stream is freed and unusable afterwards. */
  finishStream() {
    const text = binding.FinishStream(this._handle);
    this._handle = null;
    return text;
  }

  finishStreamWithMetadata(numResults = 1) {
    const m = binding.FinishStreamWithMetadata(this._handle, numResults);
    this._handle = null;
    return m;
  }

  /** Discard the stream without decoding. */
  discard() {
    if (this._handle) {
      binding.FreeStream(this._handle);
      this._handle = null;
    }
  }
}

class Model {
  constructor(modelPath) {
    const { status, model } = binding.CreateModel(modelPath);
    check(status);
    this._handle = model;
  }

  beamWidth() {
    return binding.GetModelBeamWidth(this._handle);
  }

  setBeamWidth(width) {
    check(binding.SetModelBeamWidth(this._handle, width));
  }

  sampleRate() {
    return binding.GetModelSampleRate(this._handle);
  }

  enableExternalScorer(scorerPath) {
    check(binding.EnableExternalScorer(this._handle, scorerPath));
  }

  disableExternalScorer() {
    check(binding.DisableExternalScorer(this._handle));
  }

  setScorerAlphaBeta(alpha, beta) {
    check(binding.SetScorerAlphaBeta(this._handle, alpha, beta));
  }

  addHotWord(word, boost) {
    check(binding.AddHotWord(this._handle, word, boost));
  }

  eraseHotWord(word) {
    check(binding.EraseHotWord(this._handle, word));
  }

  clearHotWords() {
    check(binding.ClearHotWords(this._handle));
  }

  /** One-shot recognition of a whole utterance. */
  stt(pcm) {
    return binding.SpeechToText(this._handle, pcm);
  }

  sttWithMetadata(pcm, numResults = 1) {
    return binding.SpeechToTextWithMetadata(this._handle, pcm, numResults);
  }

  createStream() {
    const { status, stream } = binding.CreateStream(this._handle);
    check(status);
    return new Stream(stream);
  }

  free() {
    if (this._handle) {
      binding.FreeModel(this._handle);
      this._handle = null;
    }
  }
}

function Version() {
  return binding.Version();
}

module.exports = { Model, Stream, STTError, Version };
