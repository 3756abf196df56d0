"""True per-track lengths through the batch/farm path (VERDICT r1 item 1).

The reference analyzes each track at its exact length
(``matchering/stage_helpers/match_levels.py:47-59``); a bucket-padded batch
must reproduce every single-pair master, not the bucket-length analysis.
These tests pin the dynamic-geometry kernels to their static counterparts
and gate the end-to-end contract: a mixed-length bucket through
``master_batch(..., lengths)`` matches per-pair ``master_graph`` per track.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import signal

from matchering_tpu import Config
from matchering_tpu.limiter import limit
from matchering_tpu.ops import basics, iir, sliding, spectrum
from matchering_tpu.parallel.batch import bucket_pad, master_batch
from matchering_tpu.stages import master, piece_division


def _pad_to(x: np.ndarray, n: int) -> jnp.ndarray:
    out = np.zeros((n,) + x.shape[1:], dtype=x.dtype)
    out[: x.shape[0]] = x
    return jnp.asarray(out)


class TestTruncatedKernels:
    @pytest.mark.parametrize("length", [900, 4096, 9999])
    def test_filtfilt_truncated_matches_scipy(self, rng, length):
        n = 12000
        x = rng.randn(n)
        b, a = signal.butter(1, 0.03)
        expected = signal.filtfilt(b, a, x[:length])
        filt = iir.FirstOrderFilter(b0=b[0], b1=b[1], a1=a[1])
        got = np.asarray(
            iir.filtfilt_first_order_truncated(
                filt, jnp.asarray(x), jnp.asarray(length, jnp.int32)
            )
        )
        np.testing.assert_allclose(got[:length], expected, rtol=1e-9, atol=1e-11)
        assert np.all(got[length:] == 0.0)

    @pytest.mark.parametrize("length", [500, 2048, 9999])
    def test_attack_sliding_max_truncated(self, rng, length):
        n = 12000
        window = 45  # default 1 ms attack at 44.1k
        env = np.abs(rng.randn(n))
        env[length:] = 0.0
        expected = np.asarray(sliding.sliding_max_attack(jnp.asarray(env[:length]), window))
        got = np.asarray(
            sliding.sliding_max_attack_truncated(
                jnp.asarray(env), window, jnp.asarray(length, jnp.int32)
            )
        )
        np.testing.assert_array_equal(got[:length], expected)

    def test_piece_rms_dynamic_matches_static(self, rng):
        n = 1 << 20
        for length in [n, 777777, 300001]:
            x = rng.randn(length)
            div, piece = piece_division(length, 661500)
            expected = np.asarray(
                basics.piece_rms_flat(jnp.asarray(x), piece, div)
            )
            div_max = n // 661500 + 1
            rmses, valid = basics.piece_rms_dynamic(
                _pad_to(x, n),
                jnp.asarray(piece, jnp.int32),
                jnp.asarray(div, jnp.int32),
                div_max,
            )
            assert int(np.sum(np.asarray(valid))) == div
            np.testing.assert_allclose(
                np.asarray(rmses)[:div], expected, rtol=1e-12
            )

    def test_spectrum_dynamic_matches_static(self, rng):
        n = 1 << 19
        fft_size = 512
        for length in [n, 400001, 123457]:
            x = rng.randn(length)
            div, piece = piece_division(length, 80000)
            mask_np = (rng.rand(div) > 0.4).astype(np.float64)
            if mask_np.sum() == 0:
                mask_np[0] = 1.0
            expected = np.asarray(
                spectrum.masked_average_spectrum_flat(
                    jnp.asarray(x), jnp.asarray(mask_np), piece, div, fft_size
                )
            )
            div_max = n // 80000 + 1
            fpp_max = 80000 // fft_size + 1
            mask_pad = np.zeros(div_max)
            mask_pad[:div] = mask_np
            got = np.asarray(
                spectrum.masked_average_spectrum_dynamic(
                    _pad_to(x, n),
                    jnp.asarray(mask_pad),
                    jnp.asarray(piece, jnp.int32),
                    div_max,
                    fft_size,
                    fpp_max,
                )
            )
            np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-13)

    @pytest.mark.parametrize("length", [44100, 100000])
    def test_limit_truncated_matches_whole(self, rng, length, snr):
        n = 1 << 17
        cfg = Config(dtype="float64")
        x = 0.4 * rng.randn(length, 2)
        x[1000:3000] *= 4.0  # overage region engages the limiter
        x[length - 400 :] *= 3.0  # overage at the boundary (the hard case)
        expected = np.asarray(limit(jnp.asarray(x), cfg))
        got = np.asarray(
            limit(_pad_to(x, n), cfg, length=jnp.asarray(length, jnp.int32))
        )
        assert np.all(got[length:] == 0.0)
        measured = snr(expected, got[:length])
        assert measured > 140.0, measured


class TestMixedLengthFarm:
    def test_bucketed_batch_matches_per_pair_masters(self, rng, snr):
        """VERDICT r1 'done' gate: 9 s / 14 s / 20 s targets (mixed reference
        lengths too) through one padded batch == per-pair masters, >100 dB
        per track."""
        sr = 44100
        cfg = Config(dtype="float64")
        t_secs = [9.0, 14.0, 20.0]
        r_secs = [11.0, 14.5, 19.0]

        def mk(seconds, amp, seed):
            r = np.random.RandomState(seed)
            nsamp = int(seconds * sr)
            x = amp * r.randn(nsamp, 2)
            env = 0.5 + 0.5 * np.sin(np.arange(nsamp) / sr * 2.0)[:, None]
            return (x * env).astype(np.float64)

        targets = [mk(s, 0.25, 10 + i) for i, s in enumerate(t_secs)]
        references = [mk(s, 0.9, 20 + i) for i, s in enumerate(r_secs)]

        singles = [
            np.asarray(
                master(jnp.asarray(t), jnp.asarray(r), cfg, need_default=True).result
            )
            for t, r in zip(targets, references)
        ]

        t_batch, t_lens = bucket_pad(targets, multiple=1 << 18)
        r_batch, r_lens = bucket_pad(references, multiple=1 << 18)
        out = master_batch(
            jnp.asarray(t_batch),
            jnp.asarray(r_batch),
            cfg,
            target_lengths=t_lens,
            reference_lengths=r_lens,
        )
        batch_result = np.asarray(out.result)

        for i, (single, t_len) in enumerate(zip(singles, t_lens)):
            tail = batch_result[i, t_len:]
            assert np.all(tail == 0.0), i
            measured = snr(single, batch_result[i, :t_len])
            assert measured > 100.0, (i, measured)


class TestLengthBucketing:
    def test_config_length_bucketing_matches_exact(self, rng, snr):
        """Config(length_bucketing=...) pads through the dynamic-length
        graph and matches the exact-shape master for multiple lengths in
        one bucket (they share a compiled executable by construction)."""
        from matchering_tpu.stages import main as stages_main

        sr = 44100
        bucket = 1 << 19  # ~11.9 s at 44.1 kHz

        def pair(seed, secs):
            r = np.random.RandomState(seed)
            n = int(secs * sr)
            env = 0.5 + 0.5 * np.sin(np.arange(n) / sr * 2.0)[:, None]
            return np.clip(0.3 * r.randn(n, 2) * env, -0.99, 0.99)

        for seed, t_secs, r_secs in [(1, 9.0, 10.0), (2, 11.5, 8.0)]:
            t, r = pair(seed, t_secs), pair(seed + 50, r_secs)
            exact = stages_main(t, r, Config(dtype="float64"))[0]
            bucketed = stages_main(
                t, r, Config(dtype="float64", length_bucketing=bucket)
            )[0]
            assert bucketed.shape[0] == t.shape[0]
            measured = snr(np.asarray(exact), np.asarray(bucketed))
            assert measured > 100.0, (t_secs, measured)

    def test_length_bucketing_validation(self):
        with pytest.raises(ValueError):
            Config(length_bucketing=100)  # < fft_size
        with pytest.raises(ValueError):
            Config(length_bucketing=1.5)
