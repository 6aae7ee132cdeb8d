// .NET binding for stt_tpu — counterpart of the reference's
// native_client/dotnet/STTClient (P/Invoke over coqui-stt.h), rebuilt as
// P/Invoke over the libstt_tpu C API (stt_tpu/native/stt_tpu.h).
using System;
using System.Runtime.InteropServices;

namespace STTClient
{
    /// <summary>Error codes returned by libstt_tpu (stt_tpu.h enum).</summary>
    public enum ErrorCodes
    {
        STT_ERR_OK = 0x0000,
        STT_ERR_NO_MODEL = 0x1000,
        STT_ERR_INVALID_ALPHABET = 0x2000,
        STT_ERR_INVALID_SHAPE = 0x2001,
        STT_ERR_INVALID_SCORER = 0x2002,
        STT_ERR_MODEL_INCOMPATIBLE = 0x2003,
        STT_ERR_SCORER_NOT_ENABLED = 0x2004,
        STT_ERR_SCORER_UNREADABLE = 0x2005,
        STT_ERR_SCORER_INVALID_LM = 0x2006,
        STT_ERR_SCORER_NO_TRIE = 0x2007,
        STT_ERR_SCORER_INVALID_TRIE = 0x2008,
        STT_ERR_SCORER_VERSION_MISMATCH = 0x2009,
        STT_ERR_FAIL_INIT_MMAP = 0x3000,
        STT_ERR_FAIL_INIT_SESS = 0x3001,
        STT_ERR_FAIL_INTERPRETER = 0x3002,
        STT_ERR_FAIL_RUN_SESS = 0x3003,
        STT_ERR_FAIL_CREATE_STREAM = 0x3004,
        STT_ERR_FAIL_READ_PROTOBUF = 0x3005,
        STT_ERR_FAIL_CREATE_SESS = 0x3006,
        STT_ERR_FAIL_CREATE_MODEL = 0x3007,
        STT_ERR_FAIL_INSERT_HOTWORD = 0x3008,
        STT_ERR_FAIL_CLEAR_HOTWORD = 0x3009,
        STT_ERR_FAIL_ERASE_HOTWORD = 0x3010,
    }

    /// <summary>One recognized token and its timing.</summary>
    public struct TokenMetadata
    {
        public string Text;
        public uint Timestep;
        public float StartTime;
    }

    public struct CandidateTranscript
    {
        public TokenMetadata[] Tokens;
        public double Confidence;
    }

    public struct Metadata
    {
        public CandidateTranscript[] Transcripts;
    }

    public class STTException : Exception
    {
        public int Code { get; }

        internal STTException(int code) : base(Native.ErrorMessage(code))
        {
            Code = code;
        }

        internal static void Check(int status)
        {
            if (status != 0) throw new STTException(status);
        }
    }

    internal static class Native
    {
        private const string Lib = "stt_tpu";

        // Raw struct layouts mirroring stt_tpu.h for marshaling.
        [StructLayout(LayoutKind.Sequential)]
        internal struct RawToken
        {
            internal IntPtr text;
            internal uint timestep;
            internal float start_time;
        }

        [StructLayout(LayoutKind.Sequential)]
        internal struct RawTranscript
        {
            internal IntPtr tokens;
            internal uint num_tokens;
            internal double confidence;
        }

        [StructLayout(LayoutKind.Sequential)]
        internal struct RawMetadata
        {
            internal IntPtr transcripts;
            internal uint num_transcripts;
        }

        [DllImport(Lib)] internal static extern int STT_CreateModel(string modelPath, out IntPtr model);
        [DllImport(Lib)] internal static extern void STT_FreeModel(IntPtr model);
        [DllImport(Lib)] internal static extern uint STT_GetModelBeamWidth(IntPtr model);
        [DllImport(Lib)] internal static extern int STT_SetModelBeamWidth(IntPtr model, uint beamWidth);
        [DllImport(Lib)] internal static extern int STT_GetModelSampleRate(IntPtr model);
        [DllImport(Lib)] internal static extern int STT_EnableExternalScorer(IntPtr model, string path);
        [DllImport(Lib)] internal static extern int STT_DisableExternalScorer(IntPtr model);
        [DllImport(Lib)] internal static extern int STT_SetScorerAlphaBeta(IntPtr model, float alpha, float beta);
        [DllImport(Lib)] internal static extern int STT_AddHotWord(IntPtr model, string word, float boost);
        [DllImport(Lib)] internal static extern int STT_EraseHotWord(IntPtr model, string word);
        [DllImport(Lib)] internal static extern int STT_ClearHotWords(IntPtr model);
        [DllImport(Lib)] internal static extern IntPtr STT_SpeechToText(IntPtr model, short[] buffer, uint bufferSize);
        [DllImport(Lib)] internal static extern IntPtr STT_SpeechToTextWithMetadata(IntPtr model, short[] buffer, uint bufferSize, uint numResults);
        [DllImport(Lib)] internal static extern int STT_CreateStream(IntPtr model, out IntPtr stream);
        [DllImport(Lib)] internal static extern void STT_FeedAudioContent(IntPtr stream, short[] buffer, uint bufferSize);
        [DllImport(Lib)] internal static extern IntPtr STT_IntermediateDecode(IntPtr stream);
        [DllImport(Lib)] internal static extern IntPtr STT_IntermediateDecodeWithMetadata(IntPtr stream, uint numResults);
        [DllImport(Lib)] internal static extern IntPtr STT_FinishStream(IntPtr stream);
        [DllImport(Lib)] internal static extern IntPtr STT_FinishStreamWithMetadata(IntPtr stream, uint numResults);
        [DllImport(Lib)] internal static extern void STT_FreeStream(IntPtr stream);
        [DllImport(Lib)] internal static extern void STT_FreeMetadata(IntPtr metadata);
        [DllImport(Lib)] internal static extern void STT_FreeString(IntPtr str);
        [DllImport(Lib)] internal static extern IntPtr STT_Version();
        [DllImport(Lib)] internal static extern IntPtr STT_ErrorCodeToErrorMessage(int errorCode);

        internal static string ConsumeString(IntPtr str)
        {
            if (str == IntPtr.Zero) return string.Empty;
            string result = Marshal.PtrToStringUTF8(str);
            STT_FreeString(str);
            return result ?? string.Empty;
        }

        internal static string ErrorMessage(int code)
        {
            return ConsumeString(STT_ErrorCodeToErrorMessage(code));
        }

        internal static Metadata ConsumeMetadata(IntPtr raw)
        {
            var result = new Metadata { Transcripts = Array.Empty<CandidateTranscript>() };
            if (raw == IntPtr.Zero) return result;
            var meta = Marshal.PtrToStructure<RawMetadata>(raw);
            result.Transcripts = new CandidateTranscript[meta.num_transcripts];
            int ctSize = Marshal.SizeOf<RawTranscript>();
            int tokSize = Marshal.SizeOf<RawToken>();
            for (uint i = 0; i < meta.num_transcripts; i++)
            {
                var rawCt = Marshal.PtrToStructure<RawTranscript>(
                    meta.transcripts + (int)(i * ctSize));
                var tokens = new TokenMetadata[rawCt.num_tokens];
                for (uint t = 0; t < rawCt.num_tokens; t++)
                {
                    var rawTok = Marshal.PtrToStructure<RawToken>(
                        rawCt.tokens + (int)(t * tokSize));
                    tokens[t] = new TokenMetadata
                    {
                        Text = Marshal.PtrToStringUTF8(rawTok.text) ?? string.Empty,
                        Timestep = rawTok.timestep,
                        StartTime = rawTok.start_time,
                    };
                }
                result.Transcripts[i] = new CandidateTranscript
                {
                    Tokens = tokens,
                    Confidence = rawCt.confidence,
                };
            }
            STT_FreeMetadata(raw);
            return result;
        }
    }

    /// <summary>Streaming recognition session.</summary>
    public sealed class Stream : IDisposable
    {
        private IntPtr handle;

        internal Stream(IntPtr handle)
        {
            this.handle = handle;
        }

        public void FeedAudioContent(short[] pcm)
        {
            Native.STT_FeedAudioContent(handle, pcm, (uint)pcm.Length);
        }

        public string IntermediateDecode()
        {
            return Native.ConsumeString(Native.STT_IntermediateDecode(handle));
        }

        public Metadata IntermediateDecodeWithMetadata(uint numResults = 1)
        {
            return Native.ConsumeMetadata(
                Native.STT_IntermediateDecodeWithMetadata(handle, numResults));
        }

        public string FinishStream()
        {
            string text = Native.ConsumeString(Native.STT_FinishStream(handle));
            handle = IntPtr.Zero;
            return text;
        }

        public Metadata FinishStreamWithMetadata(uint numResults = 1)
        {
            var m = Native.ConsumeMetadata(
                Native.STT_FinishStreamWithMetadata(handle, numResults));
            handle = IntPtr.Zero;
            return m;
        }

        public void Dispose()
        {
            if (handle != IntPtr.Zero)
            {
                Native.STT_FreeStream(handle);
                handle = IntPtr.Zero;
            }
        }
    }

    /// <summary>Speech-to-text model (one per artifact; serves many streams).</summary>
    public sealed class STT : IDisposable
    {
        private IntPtr handle;

        public STT(string modelPath)
        {
            STTException.Check(Native.STT_CreateModel(modelPath, out handle));
        }

        public uint GetModelBeamWidth() => Native.STT_GetModelBeamWidth(handle);

        public void SetModelBeamWidth(uint width) =>
            STTException.Check(Native.STT_SetModelBeamWidth(handle, width));

        public int GetModelSampleRate() => Native.STT_GetModelSampleRate(handle);

        public void EnableExternalScorer(string path) =>
            STTException.Check(Native.STT_EnableExternalScorer(handle, path));

        public void DisableExternalScorer() =>
            STTException.Check(Native.STT_DisableExternalScorer(handle));

        public void SetScorerAlphaBeta(float alpha, float beta) =>
            STTException.Check(Native.STT_SetScorerAlphaBeta(handle, alpha, beta));

        public void AddHotWord(string word, float boost) =>
            STTException.Check(Native.STT_AddHotWord(handle, word, boost));

        public void EraseHotWord(string word) =>
            STTException.Check(Native.STT_EraseHotWord(handle, word));

        public void ClearHotWords() =>
            STTException.Check(Native.STT_ClearHotWords(handle));

        /// <summary>One-shot recognition of 16-bit 16 kHz mono PCM.</summary>
        public string SpeechToText(short[] pcm)
        {
            return Native.ConsumeString(
                Native.STT_SpeechToText(handle, pcm, (uint)pcm.Length));
        }

        public Metadata SpeechToTextWithMetadata(short[] pcm, uint numResults = 1)
        {
            return Native.ConsumeMetadata(Native.STT_SpeechToTextWithMetadata(
                handle, pcm, (uint)pcm.Length, numResults));
        }

        public Stream CreateStream()
        {
            STTException.Check(Native.STT_CreateStream(handle, out IntPtr stream));
            return new Stream(stream);
        }

        public static string Version() =>
            Native.ConsumeString(Native.STT_Version());

        public void Dispose()
        {
            if (handle != IntPtr.Zero)
            {
                Native.STT_FreeModel(handle);
                handle = IntPtr.Zero;
            }
        }
    }
}
