// Swift binding for stt_tpu — counterpart of the reference's
// native_client/swift/Bindings.swift, rebuilt over the libstt_tpu C API
// (imported via stt_tpu.modulemap as STTNative).
import Foundation
import STTNative

public enum STTError: Error {
    case failure(code: Int32, message: String)

    static func check(_ status: Int32) throws {
        guard status == 0 else {
            let cMsg = STT_ErrorCodeToErrorMessage(status)
            let message = cMsg.map { String(cString: $0) } ?? "unknown error"
            if let cMsg = cMsg { STT_FreeString(cMsg) }
            throw STTError.failure(code: status, message: message)
        }
    }
}

public struct STTTokenMetadata {
    public let text: String
    public let timestep: UInt32
    public let startTime: Float
}

public struct STTCandidateTranscript {
    public let tokens: [STTTokenMetadata]
    public let confidence: Double

    public var text: String { tokens.map { $0.text }.joined() }
}

public struct STTMetadata {
    public let transcripts: [STTCandidateTranscript]
}

private func consumeString(_ cStr: UnsafeMutablePointer<CChar>?) -> String {
    guard let cStr = cStr else { return "" }
    let result = String(cString: cStr)
    STT_FreeString(cStr)
    return result
}

private func consumeMetadata(_ raw: UnsafeMutablePointer<Metadata>?) -> STTMetadata {
    guard let raw = raw else { return STTMetadata(transcripts: []) }
    defer { STT_FreeMetadata(raw) }
    var transcripts: [STTCandidateTranscript] = []
    let meta = raw.pointee
    for i in 0..<Int(meta.num_transcripts) {
        let ct = meta.transcripts[i]
        var tokens: [STTTokenMetadata] = []
        for t in 0..<Int(ct.num_tokens) {
            let tok = ct.tokens[t]
            tokens.append(STTTokenMetadata(
                text: tok.text.map { String(cString: $0) } ?? "",
                timestep: tok.timestep,
                startTime: tok.start_time))
        }
        transcripts.append(STTCandidateTranscript(
            tokens: tokens, confidence: ct.confidence))
    }
    return STTMetadata(transcripts: transcripts)
}

/// Streaming recognition session; obtain via `STTModel.createStream()`.
public final class STTStream {
    private var handle: OpaquePointer?

    fileprivate init(handle: OpaquePointer?) {
        self.handle = handle
    }

    /// Feed 16-bit 16 kHz mono PCM.
    public func feedAudioContent(_ pcm: [Int16]) {
        pcm.withUnsafeBufferPointer { buf in
            STT_FeedAudioContent(handle, buf.baseAddress, UInt32(buf.count))
        }
    }

    /// Non-destructive decode of the audio fed so far.
    public func intermediateDecode() -> String {
        consumeString(STT_IntermediateDecode(handle))
    }

    public func intermediateDecodeWithMetadata(numResults: UInt32 = 1) -> STTMetadata {
        consumeMetadata(STT_IntermediateDecodeWithMetadata(handle, numResults))
    }

    /// Final decode; the stream becomes unusable afterwards.
    public func finishStream() -> String {
        defer { handle = nil }
        return consumeString(STT_FinishStream(handle))
    }

    public func finishStreamWithMetadata(numResults: UInt32 = 1) -> STTMetadata {
        defer { handle = nil }
        return consumeMetadata(STT_FinishStreamWithMetadata(handle, numResults))
    }

    deinit {
        if let handle = handle { STT_FreeStream(handle) }
    }
}

/// Speech-to-text model; one per artifact, serves many concurrent streams.
public final class STTModel {
    private var handle: OpaquePointer?

    public init(modelPath: String) throws {
        var model: OpaquePointer?
        try STTError.check(STT_CreateModel(modelPath, &model))
        handle = model
    }

    public var beamWidth: UInt32 {
        STT_GetModelBeamWidth(handle)
    }

    public func setBeamWidth(_ width: UInt32) throws {
        try STTError.check(STT_SetModelBeamWidth(handle, width))
    }

    public var sampleRate: Int32 {
        STT_GetModelSampleRate(handle)
    }

    public func enableExternalScorer(path: String) throws {
        try STTError.check(STT_EnableExternalScorer(handle, path))
    }

    public func disableExternalScorer() throws {
        try STTError.check(STT_DisableExternalScorer(handle))
    }

    public func setScorerAlphaBeta(alpha: Float, beta: Float) throws {
        try STTError.check(STT_SetScorerAlphaBeta(handle, alpha, beta))
    }

    public func addHotWord(_ word: String, boost: Float) throws {
        try STTError.check(STT_AddHotWord(handle, word, boost))
    }

    public func eraseHotWord(_ word: String) throws {
        try STTError.check(STT_EraseHotWord(handle, word))
    }

    public func clearHotWords() throws {
        try STTError.check(STT_ClearHotWords(handle))
    }

    /// One-shot recognition of 16-bit 16 kHz mono PCM.
    public func speechToText(_ pcm: [Int16]) -> String {
        pcm.withUnsafeBufferPointer { buf in
            consumeString(STT_SpeechToText(handle, buf.baseAddress, UInt32(buf.count)))
        }
    }

    public func speechToTextWithMetadata(_ pcm: [Int16], numResults: UInt32 = 1) -> STTMetadata {
        pcm.withUnsafeBufferPointer { buf in
            consumeMetadata(STT_SpeechToTextWithMetadata(
                handle, buf.baseAddress, UInt32(buf.count), numResults))
        }
    }

    public func createStream() throws -> STTStream {
        var stream: OpaquePointer?
        try STTError.check(STT_CreateStream(handle, &stream))
        return STTStream(handle: stream)
    }

    public static func version() -> String {
        consumeString(STT_Version())
    }

    deinit {
        if let handle = handle { STT_FreeModel(handle) }
    }
}
