"""Full process() end-to-end on the real TPU: file I/O, 48k resampling,
previews, FLAC output."""
import numpy as np
from matchering_tpu.utils import enable_compile_cache
enable_compile_cache()
import matchering_tpu as mg
from matchering_tpu.io import wav as wavio

sr_in = 48000
t = np.arange(25 * sr_in) / sr_in
rng = np.random.RandomState(5)
tgt = np.stack([0.4*np.sin(2*np.pi*220*t) + 0.03*rng.randn(t.size)]*2, 1)
ref = np.stack([0.75*np.sign(np.sin(2*np.pi*110*t))]*2, 1)
wavio.write("/tmp/e2e_t.wav", tgt, sr_in, "PCM_24")
wavio.write("/tmp/e2e_r.wav", ref, sr_in, "PCM_24")

mg.log(info_handler=print, warning_handler=print)
mg.process(
    "/tmp/e2e_t.wav", "/tmp/e2e_r.wav",
    [mg.pcm16("/tmp/e2e_out.wav"), mg.Result("/tmp/e2e_out.flac", "PCM_24", use_limiter=False)],
    preview_target=mg.pcm16("/tmp/e2e_pt.wav"),
    preview_result=mg.pcm16("/tmp/e2e_pr.wav"),
)
out, osr = wavio.read("/tmp/e2e_out.wav")
from matchering_tpu.io import codecs
fl, fsr = codecs.read("/tmp/e2e_out.flac")
print("out:", out.shape, osr, "peak", np.abs(out).max())
print("flac:", fl.shape, fsr, "peak", np.abs(fl).max())
assert osr == 44100 and out.shape[0] == int(np.ceil(25*sr_in*44100/sr_in))
print("E2E TPU OK", flush=True)
