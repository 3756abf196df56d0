"""TPU-native extra: batch mastering farm across a device mesh.

No reference equivalent (the reference is single-process CPU): masters a
bucket of (target, reference) pairs data-parallel over the ``pairs`` mesh
axis, each pair's time axis sharded over the ``time`` (ICI) axis.
"""

import numpy as np

import matchering_tpu as mg
from matchering_tpu.io import load
from matchering_tpu.parallel import batch, make_mesh, timeshard

pairs = [
    ("song_a.wav", "ref_a.wav"),
    ("song_b.wav", "ref_b.wav"),
    ("song_c.wav", "ref_c.wav"),
    ("song_d.wav", "ref_d.wav"),
]

config = mg.Config()

targets, references = [], []
for target_file, reference_file in pairs:
    t, t_sr = load(target_file, "target", "/tmp")
    r, r_sr = load(reference_file, "reference", "/tmp")
    t, _ = mg.check(t, t_sr, config, "target")
    r, _ = mg.check(r, r_sr, config, "reference")
    targets.append(t.astype(np.float32))
    references.append(r.astype(np.float32))

# Bucket-pad to shared lengths (one compiled executable per bucket shape).
targets_b, t_lengths = batch.bucket_pad(targets)
references_b, _ = batch.bucket_pad(references)

# 2-D mesh: independent pairs outside, time blocks inside (ICI).
mesh = make_mesh(pairs=2, time=4)
out = timeshard.master_farm(targets_b, references_b, config, mesh=mesh)

for i, (target_file, _) in enumerate(pairs):
    mastered = np.asarray(out.result[i, : t_lengths[i]])
    mg.save(f"master_{i}_{target_file}", mastered, config.internal_sample_rate, "PCM_16")
