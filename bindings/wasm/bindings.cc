// WASM (embind) binding for the stt_tpu C API — counterpart of the
// reference's native_client/wasm/bindings.cc.
//
// The reference's wasm build statically links TFLite; this image's
// libstt_tpu embeds a Python/JAX runtime, which has no wasm port, so this
// file cannot be built here. It binds the identical C surface
// (stt_tpu/native/stt_tpu.h) and compiles against any future wasm-hosted
// implementation of that header:
//   em++ -O2 bindings.cc -I../../stt_tpu/native -lembind \
//       libstt_tpu_wasm.a -o stt_wasm.js
#include <emscripten/bind.h>
#include <emscripten/val.h>

#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

#include "../../stt_tpu/native/stt_tpu.h"

using namespace emscripten;

namespace {

std::string consume_string(char* s) {
  if (!s) return "";
  std::string out(s);
  STT_FreeString(s);
  return out;
}

void throw_on_error(int status) {
  if (status != STT_ERR_OK) {
    throw std::runtime_error(consume_string(STT_ErrorCodeToErrorMessage(status)));
  }
}

// Eagerly convert native Metadata into a JS object tree and free it,
// so JS never owns native memory.
val metadata_to_val(Metadata* m) {
  val transcripts = val::array();
  for (unsigned int i = 0; m && i < m->num_transcripts; ++i) {
    const CandidateTranscript& ct = m->transcripts[i];
    val tokens = val::array();
    for (unsigned int t = 0; t < ct.num_tokens; ++t) {
      const TokenMetadata& tok = ct.tokens[t];
      val jtok = val::object();
      jtok.set("text", std::string(tok.text ? tok.text : ""));
      jtok.set("timestep", tok.timestep);
      jtok.set("startTime", tok.start_time);
      tokens.call<void>("push", jtok);
    }
    val jct = val::object();
    jct.set("tokens", tokens);
    jct.set("confidence", ct.confidence);
    transcripts.call<void>("push", jct);
  }
  if (m) STT_FreeMetadata(m);
  val out = val::object();
  out.set("transcripts", transcripts);
  return out;
}

std::vector<short> to_pcm(const val& typed_array) {
  return convertJSArrayToNumberVector<short>(typed_array);
}

class Stream {
 public:
  explicit Stream(StreamingState* handle) : handle_(handle) {}

  ~Stream() {
    if (handle_) STT_FreeStream(handle_);
  }

  void feedAudioContent(const val& pcm) {
    std::vector<short> buf = to_pcm(pcm);
    STT_FeedAudioContent(handle_, buf.data(),
                         static_cast<unsigned int>(buf.size()));
  }

  std::string intermediateDecode() {
    return consume_string(STT_IntermediateDecode(handle_));
  }

  val intermediateDecodeWithMetadata(unsigned int num_results) {
    return metadata_to_val(
        STT_IntermediateDecodeWithMetadata(handle_, num_results));
  }

  std::string finishStream() {
    std::string out = consume_string(STT_FinishStream(handle_));
    handle_ = nullptr;
    return out;
  }

  val finishStreamWithMetadata(unsigned int num_results) {
    val out = metadata_to_val(STT_FinishStreamWithMetadata(handle_, num_results));
    handle_ = nullptr;
    return out;
  }

 private:
  StreamingState* handle_;
};

class Model {
 public:
  explicit Model(const std::string& model_path) {
    throw_on_error(STT_CreateModel(model_path.c_str(), &handle_));
  }

  ~Model() {
    if (handle_) STT_FreeModel(handle_);
  }

  unsigned int beamWidth() const { return STT_GetModelBeamWidth(handle_); }

  void setBeamWidth(unsigned int width) {
    throw_on_error(STT_SetModelBeamWidth(handle_, width));
  }

  int sampleRate() const { return STT_GetModelSampleRate(handle_); }

  void enableExternalScorer(const std::string& path) {
    throw_on_error(STT_EnableExternalScorer(handle_, path.c_str()));
  }

  void disableExternalScorer() {
    throw_on_error(STT_DisableExternalScorer(handle_));
  }

  void setScorerAlphaBeta(float alpha, float beta) {
    throw_on_error(STT_SetScorerAlphaBeta(handle_, alpha, beta));
  }

  void addHotWord(const std::string& word, float boost) {
    throw_on_error(STT_AddHotWord(handle_, word.c_str(), boost));
  }

  void eraseHotWord(const std::string& word) {
    throw_on_error(STT_EraseHotWord(handle_, word.c_str()));
  }

  void clearHotWords() { throw_on_error(STT_ClearHotWords(handle_)); }

  std::string speechToText(const val& pcm) {
    std::vector<short> buf = to_pcm(pcm);
    return consume_string(STT_SpeechToText(
        handle_, buf.data(), static_cast<unsigned int>(buf.size())));
  }

  val speechToTextWithMetadata(const val& pcm, unsigned int num_results) {
    std::vector<short> buf = to_pcm(pcm);
    return metadata_to_val(STT_SpeechToTextWithMetadata(
        handle_, buf.data(), static_cast<unsigned int>(buf.size()),
        num_results));
  }

  Stream* createStream() {
    StreamingState* stream = nullptr;
    throw_on_error(STT_CreateStream(handle_, &stream));
    return new Stream(stream);
  }

 private:
  ModelState* handle_ = nullptr;
};

std::string version() { return consume_string(STT_Version()); }

}  // namespace

EMSCRIPTEN_BINDINGS(stt_tpu) {
  class_<Stream>("Stream")
      .function("feedAudioContent", &Stream::feedAudioContent)
      .function("intermediateDecode", &Stream::intermediateDecode)
      .function("intermediateDecodeWithMetadata",
                &Stream::intermediateDecodeWithMetadata)
      .function("finishStream", &Stream::finishStream)
      .function("finishStreamWithMetadata", &Stream::finishStreamWithMetadata);

  class_<Model>("Model")
      .constructor<const std::string&>()
      .function("beamWidth", &Model::beamWidth)
      .function("setBeamWidth", &Model::setBeamWidth)
      .function("sampleRate", &Model::sampleRate)
      .function("enableExternalScorer", &Model::enableExternalScorer)
      .function("disableExternalScorer", &Model::disableExternalScorer)
      .function("setScorerAlphaBeta", &Model::setScorerAlphaBeta)
      .function("addHotWord", &Model::addHotWord)
      .function("eraseHotWord", &Model::eraseHotWord)
      .function("clearHotWords", &Model::clearHotWords)
      .function("speechToText", &Model::speechToText)
      .function("speechToTextWithMetadata", &Model::speechToTextWithMetadata)
      .function("createStream", &Model::createStream, allow_raw_pointers());

  function("version", &version);
}
