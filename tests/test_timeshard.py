"""Time-block sharding correctness: N-device == 1-device (SURVEY.md §4).

Runs on the virtual 8-device CPU mesh from conftest.  Every sharded kernel
is checked against its single-device counterpart, and the full sharded
mastering chain against ``master_graph`` — the distributed test harness the
reference never had.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P
from scipy import signal

import matchering_tpu as mg
from matchering_tpu.ops import iir, sliding
from matchering_tpu.parallel import mesh as mesh_mod, timeshard

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def tmesh():
    return mesh_mod.single_axis_mesh("time")


def run_sharded_1d(tmesh, fn, *arrays):
    """Apply a shard-local fn over 1-D arrays sharded on the time axis."""
    wrapped = shard_map(
        fn,
        mesh=tmesh,
        in_specs=tuple(P("time") for _ in arrays),
        out_specs=P("time"),
        check_vma=False,
    )
    return np.asarray(jax.jit(wrapped)(*arrays))


class TestShardedKernels:
    def test_convolve_same(self, tmesh, rng):
        n, taps = 8 * 4096, 4096
        x = jnp.asarray(rng.randn(n))
        h = jnp.asarray(rng.randn(taps))
        expected = signal.fftconvolve(np.asarray(x), np.asarray(h), "same")
        got = run_sharded_1d(
            tmesh, lambda xl: timeshard.convolve_same_sharded(xl, h, "time"), x
        )
        np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-8)

    def test_lfilter_sharded(self, tmesh, rng):
        x = jnp.asarray(rng.randn(8 * 2000))
        filt = iir.butter1_coefficients(7.0, 44100)
        expected = signal.lfilter([filt.b0, filt.b1], [1.0, filt.a1], np.asarray(x))
        got = run_sharded_1d(
            tmesh,
            lambda xl: timeshard.lfilter_first_order_sharded(filt, xl, "time"),
            x,
        )
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)

    def test_filtfilt_sharded(self, tmesh, rng):
        x = jnp.asarray(np.abs(rng.randn(8 * 1500)))
        filt = iir.one_pole_filter(-2.0, 44.0)
        expected = signal.filtfilt([filt.b0], [1.0, filt.a1], np.asarray(x))
        got = run_sharded_1d(
            tmesh,
            lambda xl: timeshard.filtfilt_first_order_sharded(filt, xl, "time"),
            x,
        )
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)

    def test_sliding_attack_sharded(self, tmesh, rng):
        x = jnp.asarray(rng.randn(8 * 1000))
        expected = np.asarray(sliding.sliding_max_attack(x, 44))
        got = run_sharded_1d(
            tmesh, lambda xl: timeshard.sliding_max_attack_sharded(xl, 44, "time"), x
        )
        np.testing.assert_allclose(got, expected)

    def test_sliding_hold_sharded(self, tmesh, rng):
        x = jnp.asarray(np.abs(rng.randn(8 * 1000)))
        expected = np.asarray(sliding.sliding_max_hold(x, 44))
        got = run_sharded_1d(
            tmesh, lambda xl: timeshard.sliding_max_hold_sharded(xl, 44, "time"), x
        )
        np.testing.assert_allclose(got, expected)

    def test_piece_rms_sharded(self, tmesh, rng):
        n = 8 * 3000
        x = jnp.asarray(rng.randn(n))
        piece, div = 1700, 14  # truncated tail, misaligned with shards
        from matchering_tpu.ops import basics

        expected = np.asarray(basics.batch_rms(basics.unfold(x, piece, div)))
        got_fn = shard_map(
            lambda xl: timeshard.piece_rms_sharded(xl, piece, div, "time"),
            mesh=tmesh,
            in_specs=(P("time"),),
            out_specs=P(),
            check_vma=False,
        )
        got = np.asarray(jax.jit(got_fn)(x))
        np.testing.assert_allclose(got, expected, rtol=1e-12)

    def test_spectrum_sharded(self, tmesh, rng):
        from matchering_tpu.ops import basics, spectrum

        n = 8 * 3000
        x = jnp.asarray(rng.randn(n))
        piece, div, fft_size = 2900, 8, 512
        pieces = basics.unfold(x, piece, div)
        mask = jnp.asarray((rng.rand(div) > 0.4).astype(np.float64))
        expected = np.asarray(
            spectrum.masked_average_spectrum(pieces, mask, fft_size)
        )
        got_fn = shard_map(
            lambda xl: timeshard.masked_average_spectrum_sharded(
                xl, mask, piece, div, fft_size, "time"
            ),
            mesh=tmesh,
            in_specs=(P("time"),),
            out_specs=P(),
            check_vma=False,
        )
        got = np.asarray(jax.jit(got_fn)(x))
        np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


class TestShardedLimiter:
    def test_limiter_sharded_matches_single_device(self, tmesh, rng):
        sr = 44100
        n = 8 * sr // 2  # 4 s, divisible by 8
        t = np.arange(n) / sr
        wave = 1.3 * np.sin(2 * np.pi * 440 * t) * (1 + 0.4 * np.sin(2 * np.pi * t))
        array = jnp.asarray(np.stack([wave, 0.95 * wave], axis=1))
        cfg = mg.Config(dtype="float64")

        expected = np.asarray(mg.limit(array, cfg))
        got_fn = shard_map(
            lambda al: timeshard.limit_sharded(al, cfg, "time"),
            mesh=tmesh,
            in_specs=(P("time", None),),
            out_specs=P("time", None),
            check_vma=False,
        )
        got = np.asarray(jax.jit(got_fn)(array))
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)


class TestShardedMaster:
    def test_master_sharded_divisible(self, tmesh, snr):
        from test_pipeline_parity import make_track

        rng = np.random.RandomState(5)
        target = make_track(rng, 16.0, kind="target")  # 16 s => divisible by 8
        reference = make_track(rng, 12.0, kind="ref")
        cfg = mg.Config(dtype="float64")

        expected = mg.master_graph(
            jnp.asarray(target), jnp.asarray(reference), cfg, need_default=True
        )
        got = timeshard.master_sharded(
            target, reference, cfg, mesh=tmesh, need_default=True
        )
        value = snr(np.asarray(expected.result), np.asarray(got.result))
        assert value > 120.0, f"sharded vs single-device SNR {value:.1f} dB"

    def test_master_sharded_padded(self, tmesh, snr):
        from test_pipeline_parity import make_track

        rng = np.random.RandomState(6)
        target = make_track(rng, 13.37, kind="target")[:-17]  # awkward length
        reference = make_track(rng, 11.11, kind="ref")[:-5]
        cfg = mg.Config(dtype="float64")

        expected = mg.master_graph(
            jnp.asarray(target), jnp.asarray(reference), cfg, need_default=True
        )
        got = timeshard.master_sharded(
            target, reference, cfg, mesh=tmesh, need_default=True
        )
        assert got.result.shape == expected.result.shape
        value = snr(np.asarray(expected.result), np.asarray(got.result))
        assert value > 100.0, f"padded sharded SNR {value:.1f} dB"


class TestShardedDsScan:
    def test_f32_sharded_lfilter_matches_f64_oracle(self, tmesh, rng, snr):
        """float32 sharded hold/release filters keep double-single accuracy."""
        from scipy import signal as ssig

        x64 = np.abs(rng.randn(8 * 100000)) * 0.01
        filt = iir.butter1_coefficients(800 / 3000, 44100)
        expected = ssig.lfilter([filt.b0, filt.b1], [1.0, filt.a1], x64)

        x32 = jnp.asarray(x64, jnp.float32)
        got = run_sharded_1d(
            tmesh,
            lambda xl: timeshard.lfilter_first_order_sharded(filt, xl, "time"),
            x32,
        )
        value = snr(expected, got.astype(np.float64))
        assert value > 120.0, f"sharded ds lfilter SNR {value:.1f} dB"


class TestMasterFarm:
    def test_farm_2d_mesh_matches_single_device(self, snr):
        """(pairs=2, time=4) farm == per-pair single-device master."""
        from test_pipeline_parity import make_track

        from matchering_tpu.parallel import make_mesh

        rng = np.random.RandomState(9)
        t1 = make_track(rng, 6.0, kind="target")
        t2 = make_track(rng, 6.0, kind="target") * 0.8
        r1 = make_track(rng, 5.0, kind="ref")
        r2 = make_track(rng, 5.0, kind="ref") * 0.9
        cfg = mg.Config(dtype="float64")
        mesh = make_mesh(pairs=2, time=4)

        out = timeshard.master_farm(
            np.stack([t1, t2]), np.stack([r1, r2]), cfg, mesh=mesh,
            need_default=True, need_no_limiter_normalized=True,
        )
        for i, (t, r) in enumerate([(t1, r1), (t2, r2)]):
            single = mg.master_graph(jnp.asarray(t), jnp.asarray(r), cfg,
                                     need_default=True,
                                     need_no_limiter_normalized=True)
            v1 = snr(np.asarray(single.result), np.asarray(out.result[i]))
            v2 = snr(
                np.asarray(single.result_no_limiter_normalized),
                np.asarray(out.result_no_limiter_normalized[i]),
            )
            assert v1 > 110.0, f"pair {i} limited SNR {v1:.1f} dB"
            assert v2 > 110.0, f"pair {i} normalized SNR {v2:.1f} dB"

    def test_farm_2d_mesh_true_lengths(self, snr):
        """VERDICT r1 item 1 at farm scale: a mixed-length bucket through
        the 2-D (pairs=2, time=4) farm with per-track lengths matches each
        per-pair single-device master at >100 dB."""
        from test_pipeline_parity import make_track

        from matchering_tpu.parallel import make_mesh
        from matchering_tpu.parallel.batch import bucket_pad

        rng = np.random.RandomState(11)
        targets = [
            make_track(rng, 9.0, kind="target"),
            make_track(rng, 14.0, kind="target") * 0.7,
        ]
        references = [
            make_track(rng, 11.0, kind="ref"),
            make_track(rng, 12.5, kind="ref") * 0.9,
        ]
        cfg = mg.Config(dtype="float64")
        mesh = make_mesh(pairs=2, time=4)

        t_batch, t_lens = bucket_pad(targets, multiple=1 << 17)
        r_batch, r_lens = bucket_pad(references, multiple=1 << 17)
        out = timeshard.master_farm(
            t_batch,
            r_batch,
            cfg,
            mesh=mesh,
            need_default=True,
            target_lengths=t_lens,
            reference_lengths=r_lens,
        )
        for i, (t, r) in enumerate(zip(targets, references)):
            single = mg.master_graph(
                jnp.asarray(t), jnp.asarray(r), cfg, need_default=True
            )
            got = np.asarray(out.result[i])
            assert np.all(got[t_lens[i] :] == 0.0), i
            value = snr(np.asarray(single.result), got[: t_lens[i]])
            assert value > 100.0, f"pair {i} SNR {value:.1f} dB"
