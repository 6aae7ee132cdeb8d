"""Single-stream chunk decode latency: kernel vs host(+device prune)."""
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/stt_tpu_xla_cache")
from stt_tpu.alphabet import Alphabet
from stt_tpu.decode.device import DeviceStreamingDecoder, prune_emissions
from stt_tpu.decode.beam import make_decoder_state
import bench as benchmod

alphabet = Alphabet("/root/reference/data/alphabet.txt")
C = alphabet.size + 1
rng = np.random.RandomState(0)
T = 500
probs_np = benchmod.speechlike_probs(rng, 1, T, C)[0]
probs_dev = jnp.asarray(probs_np)
CH = 16

# kernel streaming decoder
dec = DeviceStreamingDecoder(alphabet, beam_size=64)
dec.next(probs_dev[:CH])  # compile
dec = DeviceStreamingDecoder(alphabet, beam_size=64)
t0 = time.time()
for i in range(0, T, CH):
    dec.next(probs_dev[i:i+CH])
r = dec.decode(1)
t_k = time.time() - t0
print(f"kernel streaming: {t_k*1e3:.1f}ms total, {t_k/ (T//CH) *1e3:.2f}ms/chunk, used kernel: {dec._use_kernel}")

# host decoder fed device-pruned chunks
state = make_decoder_state(alphabet, 64, 1.0, 40, None, None, "auto")
idx, logp, cnt, blank = prune_emissions(probs_dev[None], 40, 1.0)
t0 = time.time()
idx, logp, cnt, blank = prune_emissions(probs_dev[None], 40, 1.0)
i2, l2, c2, b2 = np.asarray(idx)[0], np.asarray(logp)[0], np.asarray(cnt)[0], np.asarray(blank)[0]
for i in range(0, T, CH):
    state.next_pruned(i2[i:i+CH], l2[i:i+CH], c2[i:i+CH], b2[i:i+CH])
r2 = state.decode(1)
t_h = time.time() - t0
print(f"host streaming:   {t_h*1e3:.1f}ms total, {t_h/(T//CH)*1e3:.2f}ms/chunk")
print("transcripts equal:", r[0].transcript == r2[0].transcript)
