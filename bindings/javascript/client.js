#!/usr/bin/env node
// CLI client over the Node binding — counterpart of the reference's
// native_client/javascript/client.ts. Reads a 16 kHz mono 16-bit WAV and
// prints the transcript (optionally streamed / with word timings).
"use strict";

const fs = require("fs");
const { Model, Version } = require("./index.js");

function parseArgs(argv) {
  const args = { numResults: 1 };
  for (let i = 2; i < argv.length; ++i) {
    const a = argv[i];
    if (a === "--model") args.model = argv[++i];
    else if (a === "--scorer") args.scorer = argv[++i];
    else if (a === "--audio") args.audio = argv[++i];
    else if (a === "--beam_width") args.beamWidth = parseInt(argv[++i], 10);
    else if (a === "--lm_alpha") args.lmAlpha = parseFloat(argv[++i]);
    else if (a === "--lm_beta") args.lmBeta = parseFloat(argv[++i]);
    else if (a === "--hot_words") args.hotWords = argv[++i];
    else if (a === "--stream") args.stream = true;
    else if (a === "--json") args.json = true;
    else if (a === "--version") args.version = true;
    else if (a === "--help") args.help = true;
  }
  return args;
}

// Minimal RIFF parse: find the `data` chunk of a PCM16 mono 16k WAV.
function readWavPcm(path) {
  const buf = fs.readFileSync(path);
  if (buf.toString("ascii", 0, 4) !== "RIFF")
    throw new Error(`${path}: not a RIFF/WAV file`);
  let off = 12;
  while (off + 8 <= buf.length) {
    const id = buf.toString("ascii", off, off + 4);
    const size = buf.readUInt32LE(off + 4);
    if (id === "data") return buf.subarray(off + 8, off + 8 + size);
    off += 8 + size + (size & 1);
  }
  throw new Error(`${path}: no data chunk`);
}

function main() {
  const args = parseArgs(process.argv);
  if (args.version) {
    console.log(Version());
    return;
  }
  if (args.help || !args.model || !args.audio) {
    console.log(
      "usage: client.js --model DIR [--scorer S] [--beam_width N] " +
        "[--lm_alpha A --lm_beta B] [--hot_words w:boost,...] " +
        "[--stream] [--json] --audio FILE.wav"
    );
    process.exit(args.help ? 0 : 2);
  }

  const model = new Model(args.model);
  if (args.beamWidth) model.setBeamWidth(args.beamWidth);
  if (args.scorer) {
    model.enableExternalScorer(args.scorer);
    if (args.lmAlpha !== undefined && args.lmBeta !== undefined)
      model.setScorerAlphaBeta(args.lmAlpha, args.lmBeta);
  }
  if (args.hotWords)
    for (const pair of args.hotWords.split(",")) {
      const [word, boost] = pair.split(":");
      model.addHotWord(word, parseFloat(boost));
    }

  const pcm = readWavPcm(args.audio);
  if (args.json) {
    const meta = model.sttWithMetadata(pcm, args.numResults);
    console.log(JSON.stringify(meta, null, 2));
  } else if (args.stream) {
    const stream = model.createStream();
    const chunk = 16000; // bytes = 0.5 s
    for (let off = 0; off < pcm.length; off += chunk)
      stream.feedAudioContent(pcm.subarray(off, off + chunk));
    console.log(stream.finishStream());
  } else {
    console.log(model.stt(pcm));
  }
  model.free();
}

main();
