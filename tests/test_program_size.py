"""Program-size regression guards.

Host-built arrays that scale with track length must never be baked into the
HLO as dense literals: the 60-min master once carried six (128, 32768)
pole-power matrices (211 MB of program text, 706 s cold compile on the
remote service) and the sharded limiter embedded full-shard-length ds power
vectors (11 GB of text — over the compile service's request-size cap).
These tests lower the production graphs at multi-million-sample lengths and
bound the StableHLO text size, which is flat in track length by design.
"""

import functools

import jax
import jax.numpy as jnp
import pytest

from matchering_tpu import Config
from matchering_tpu.ops import smoothing
from matchering_tpu.stages import MasterOutput, master_graph

LIMIT_MB = 40.0  # current programs are ~8-11 MB; literals blow past 60 MB


def _interp_shapes(config):
    ops = smoothing.interpolation_operator_arrays(
        config.internal_sample_rate,
        config.fft_size,
        config.lin_log_oversampling,
        jnp.dtype(config.dtype),
    )
    return tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in ops)


@pytest.mark.parametrize("n", [1 << 23, 1 << 25])
def test_master_program_text_flat_in_length(n):
    config = Config(dtype="float32", max_length=3600.0)
    t_shape = jax.ShapeDtypeStruct((n, 2), jnp.float32)
    r_shape = jax.ShapeDtypeStruct((180 * 44100, 2), jnp.float32)

    def fn(t, r, ops):
        return master_graph(t, r, config, need_default=True, interp_ops=ops)

    txt = jax.jit(fn).lower(t_shape, r_shape, _interp_shapes(config)).as_text()
    assert len(txt) < LIMIT_MB * 1e6, f"{len(txt)/1e6:.1f} MB of StableHLO"


def test_sharded_body_program_text_bounded():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from matchering_tpu.parallel.mesh import make_mesh
    from matchering_tpu.parallel.timeshard import (
        _master_sharded_body,
        piece_division,
    )

    config = Config(dtype="float32", max_length=3600.0)
    n, n_ref = 1 << 25, 180 * 44100
    t_div, t_piece = piece_division(n, config.max_piece_size)
    r_div, r_piece = piece_division(n_ref, config.max_piece_size)
    mesh = make_mesh(pairs=1, time=len(jax.devices()))
    body = functools.partial(
        _master_sharded_body,
        t_geom=(n, t_div, t_piece),
        r_geom=(n_ref, r_div, r_piece),
        config=config,
        t_div_max=None,
        r_div_max=None,
        need_default=True,
        need_no_limiter=False,
        need_no_limiter_normalized=False,
        axis="time",
    )
    spec = P("time", None)
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, (P(), P())),
        out_specs=MasterOutput(
            result=spec,
            result_no_limiter=None,
            result_no_limiter_normalized=None,
            report=P(),
        ),
        check_vma=False,
    )
    t_shape = jax.ShapeDtypeStruct((n, 2), jnp.float32)
    r_shape = jax.ShapeDtypeStruct((n_ref, 2), jnp.float32)
    txt = jax.jit(sharded).lower(t_shape, r_shape, _interp_shapes(config)).as_text()
    assert len(txt) < LIMIT_MB * 1e6, f"{len(txt)/1e6:.1f} MB of StableHLO"
