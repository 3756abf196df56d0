"""Hyrax brickwall limiter — pure jittable JAX (TPU-native).

Behavioral parity with the reference limiter (``matchering/limiter/hyrax.py:
32-99``): gain envelope from the cross-channel rectified peak, attack stage
(centered sliding max + zero-phase one-pole smoothing), hold/release stage
(causal sliding max + Butterworth low-passes), final gain = 1 - max of the
three envelopes.  Differences in *mechanism* only:

* sliding maxima run as van Herk block-scan kernels (``ops.sliding``)
  instead of ``scipy.ndimage.maximum_filter1d``;
* every IIR pass is a ``jax.lax.associative_scan`` linear recurrence
  (``ops.iir``) instead of sequential scipy C loops — O(log n) depth, so the
  whole limiter is one fused XLA program with no host round-trips;
* the reference's data-dependent early-out (``hyrax.py:83-85``) becomes a
  branchless ``jnp.where`` select on the same ``isclose`` condition.

The entry point is pure and shape-static: safe under ``jit``, ``vmap`` and
``shard_map`` (the time-sharded variant lives in ``parallel/timeshard.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import Config
from .ops import basics, iir, sliding
from .utils import ms_to_samples


def _attack_stage(envelope: jax.Array, config: Config, length=None):
    """Centered sliding max + zero-phase one-pole smoothing
    (reference ``hyrax.py:43-53``).  Returns (smoothed, slided).

    With a traced ``length`` (bucket-padded batch entry), the sliding max
    reflects at the true track end and the zero-phase filter's backward
    pass starts from the odd-extension state at that boundary — exactly the
    reference's numbers at the exact track length."""
    attack = ms_to_samples(config.limiter.attack, config.internal_sample_rate)
    smoother = iir.one_pole_filter(config.limiter.attack_filter_coefficient, attack)
    if length is None:
        slided = sliding.sliding_max_attack(envelope, attack)
        return iir.filtfilt_first_order(smoother, slided), slided
    slided = sliding.sliding_max_attack_truncated(envelope, attack, length)
    return iir.filtfilt_first_order_truncated(smoother, slided, length), slided


def _release_stage(slided_attack: jax.Array, config: Config) -> jax.Array:
    """Causal hold max + hold/release Butterworth low-passes
    (reference ``hyrax.py:56-75``)."""
    fs = config.internal_sample_rate
    hold = ms_to_samples(config.limiter.hold, fs)
    slided = sliding.sliding_max_hold(slided_attack, hold)

    hold_out = iir.butter_lowpass(
        config.limiter.hold_filter_order,
        config.limiter.hold_filter_coefficient,
        fs,
        slided,
    )

    release_out = iir.butter_lowpass(
        config.limiter.release_filter_order,
        config.limiter.release_filter_coefficient / config.limiter.release,
        fs,
        jnp.maximum(slided, hold_out),
    )

    return jnp.maximum(hold_out, release_out)


def _use_pallas(n: int) -> bool:
    """Opt-in switch for the fused Pallas front-end (``ops.pallas_envelope``).

    The kernel is bit-identical to the unfused ops (tests/test_pallas.py,
    on-chip ``tools_pallas_verify.py``).  It needs the scoped-VMEM headroom
    flag set before backend init (this backend stack-allocates Pallas
    outputs in scoped VMEM — importing the package with
    MATCHERING_TPU_PALLAS=1 arranges it) and a track short enough for its
    two full-length outputs to fit that budget; set MATCHERING_TPU_PALLAS=1
    to enable, the XLA ops carry everything else."""
    import os

    from .ops.pallas_envelope import fits_pallas

    return (
        os.environ.get("MATCHERING_TPU_PALLAS") == "1"
        and jax.default_backend() not in ("cpu",)
        and fits_pallas(n)
    )


def limit(array: jax.Array, config: Config, length=None) -> jax.Array:
    """Brickwall-limit a stereo (n, 2) array at ``config.threshold``.

    Pure function of the input; identical output to the reference
    ``limit()`` (``hyrax.py:78-99``) within float tolerance.

    ``length`` (optional, traced): the true track length of a bucket-padded
    entry.  The gain envelope is then computed with the track ending at
    ``length`` — samples beyond it are forced to the no-overage envelope,
    the anti-causal attack stage gets exact end-boundary semantics, and the
    output beyond ``length`` is zeroed.  Output on [0, length) equals
    ``limit(array[:length], config)``.
    """
    tolerance = 1e-8 + 1e-5 * 1.0  # np.isclose defaults (hyrax.py:83)
    if length is None and _use_pallas(array.shape[0]):
        from .ops.pallas_envelope import limiter_front_end

        attack = ms_to_samples(config.limiter.attack, config.internal_sample_rate)
        gain_hard_clip, slided = limiter_front_end(
            array, config.threshold, attack
        )
        smoother = iir.one_pole_filter(
            config.limiter.attack_filter_coefficient, attack
        )
        gain_attack = iir.filtfilt_first_order(smoother, slided)
        hard_clip_slided = slided
        # |rectified - 1| <= tol  <=>  1 - 1/rectified <= tol/(1+tol)
        # (monotone, rectified >= 1) — the early-out check reuses the
        # kernel's gain output instead of recomputing the envelope
        not_needed = jnp.all(gain_hard_clip <= tolerance / (1.0 + tolerance))
    else:
        rectified = basics.rectify(array, config.threshold)
        if length is not None:
            rectified = jnp.where(
                jnp.arange(rectified.shape[0]) < length, rectified, 1.0
            )
        gain_hard_clip = basics.flip(1.0 / rectified)
        gain_attack, hard_clip_slided = _attack_stage(gain_hard_clip, config, length)
        # Reference early-out (hyrax.py:83-85): if nothing exceeds the
        # threshold (within np.isclose tolerance) the input passes through
        # untouched.  (With a traced length the beyond-boundary envelope is
        # exactly 1, so the all() reduction matches the true-length check.)
        not_needed = jnp.all(jnp.abs(rectified - 1.0) <= tolerance)
    gain_release = _release_stage(hard_clip_slided, config)

    gain = basics.flip(basics.max_mix(gain_hard_clip, gain_attack, gain_release))
    limited = array * gain[:, None]
    if length is not None:
        limited = limited * (jnp.arange(array.shape[0]) < length)[:, None]

    return jnp.where(not_needed, array, limited)
