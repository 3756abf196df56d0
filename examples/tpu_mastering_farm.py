"""TPU-native extra: batch mastering farm.

Usage: python examples/tpu_mastering_farm.py [t0 r0 t1 r1 ... ] [out_dir]

No reference equivalent (the reference is single-process CPU).  Two levels
of API:

1. ``mg.process_batch`` — the file-to-file driver: decodes, conditions,
   bucket-pads, masters every pair (each track analyzed and limited at its
   true length), trims, encodes.  On one device the pairs run as pipelined
   independent programs (fastest — ``dispatch="pipelined"``); under a mesh
   one batched program shards over the ``pairs`` axis.
2. The raw array path below it (``parallel.master_farm``) for callers that
   manage their own I/O: a 2-D ``(pairs, time)`` mesh shards independent
   pairs across the outer (DCN at pod scale) axis and each pair's time
   axis across the inner (ICI) axis.
"""

import os
import sys

import matchering_tpu as mg

argv = sys.argv[1:]
out_dir = argv.pop() if len(argv) % 2 == 1 else "."
files = argv or [
    "song_a.wav", "ref_a.wav",
    "song_b.wav", "ref_b.wav",
    "song_c.wav", "ref_c.wav",
    "song_d.wav", "ref_d.wav",
]
pairs = list(zip(files[::2], files[1::2]))

# --- level 1: the one-call driver -----------------------------------------
jobs = [
    mg.PairJob(
        target=target,
        reference=reference,
        results=[mg.pcm16(os.path.join(out_dir, f"master_{i}.wav"))],
    )
    for i, (target, reference) in enumerate(pairs)
]
mg.process_batch(jobs)

# --- level 2: the same farm over a device mesh, arrays in hand ------------
# (uncomment on a multi-device host; zero cross-pair communication, so the
# pairs axis scales to pod size — see SCALING.md)
#
# import numpy as np
# from matchering_tpu.parallel import batch, make_mesh, timeshard
# config = mg.Config()
# tracks = [mg.check(*mg.load(t, "target", "/tmp"), config, "target")[0] for t, _ in pairs]
# refs = [mg.check(*mg.load(r, "reference", "/tmp"), config, "reference")[0] for _, r in pairs]
# targets_b, t_lengths = batch.bucket_pad(tracks)
# references_b, r_lengths = batch.bucket_pad(refs)
# mesh = make_mesh(pairs=2, time=4)
# out = timeshard.master_farm(targets_b, references_b, config, mesh=mesh,
#                             target_lengths=t_lengths, reference_lengths=r_lengths)
# for i in range(len(pairs)):
#     mg.save(f"master_{i}.wav", np.asarray(out.result[i, : t_lengths[i]]),
#             config.internal_sample_rate, "PCM_16")
