"""TPU-native extra: long-form master with the time axis sharded over chips.

The reference rejects tracks over 15 minutes (``matchering/checker.py:95``);
here a 60-minute 96 kHz master runs with its time axis sharded across all
local devices — overlap-save halos and carried IIR scans keep the output
identical to the single-device result.
"""

import numpy as np

import matchering_tpu as mg
from matchering_tpu.io import load
from matchering_tpu.parallel import timeshard

config = mg.Config(
    internal_sample_rate=96000,
    max_length=60 * 60,  # allow one hour
)

target, t_sr = load("my_one_hour_set.wav", "target", "/tmp")
reference, r_sr = load("some_popular_song.wav", "reference", "/tmp")
target, _ = mg.check(target, t_sr, config, "target")
reference, _ = mg.check(reference, r_sr, config, "reference")

out = timeshard.master_sharded(
    target.astype(np.float32), reference.astype(np.float32), config
)
mg.save("my_one_hour_master.wav", np.asarray(out.result), 96000, "PCM_24")
