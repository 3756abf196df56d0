"""Host-side scalar helpers (reference ``matchering/utils.py:28-59``)."""

from __future__ import annotations

import math
import os
import random
import string
from datetime import timedelta


def get_temp_folder(results: list) -> str:
    """Folder of the first result file, used for codec temp conversions."""
    return os.path.dirname(os.path.abspath(results[0].file))


def random_str(size: int = 16) -> str:
    alphabet = string.ascii_lowercase + string.digits
    return "".join(random.choices(alphabet, k=size))


def random_file(prefix: str = "", extension: str = "wav") -> str:
    head = f"{prefix}-" if prefix else ""
    return f"{head}{random_str()}.{extension}"


def to_db(value: float) -> str:
    return f"{20 * math.log10(value):.4f} dB"


def ms_to_samples(value: float, sample_rate: int) -> int:
    return int(sample_rate * value * 1e-3)


def make_odd(value: int) -> int:
    return value if value & 1 else value + 1


def time_str(length: int, sample_rate: int) -> str:
    return str(timedelta(seconds=length // sample_rate))


def enable_compile_cache(path: str = None) -> None:
    """Enable JAX's persistent compilation cache.

    The remote TPU compile service in some environments has minute-scale,
    high-variance compile latency; the on-disk cache makes every program
    shape compile once ever.  Safe to call multiple times.
    """
    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_compile_cache_checked = False


def ensure_compile_cache() -> None:
    """Default-on persistent compile cache for the library entry points.

    The reference has no compile step, so cold-start parity demands the
    cache be on for a plain ``mg.process()`` — not just for bench scripts
    (observed cold compiles on the remote TPU compile service: 623-830 s
    for the 60-min graph, ~67 s with a warm cache).  Idempotent and cheap
    after the first call.  Opt out with ``MATCHERING_TPU_NO_COMPILE_CACHE=1``;
    an explicit ``jax_compilation_cache_dir`` (config or
    ``JAX_COMPILATION_CACHE_DIR``) is respected and left untouched.

    Cache location: ``MATCHERING_TPU_CACHE_DIR`` if set, else the repo's
    ``.jax_cache`` when running from a source checkout, else
    ``~/.cache/matchering_tpu/jax_cache``.
    """
    global _compile_cache_checked
    if _compile_cache_checked:
        return
    _compile_cache_checked = True
    if os.environ.get("MATCHERING_TPU_NO_COMPILE_CACHE", "0") not in ("", "0"):
        return
    import jax

    try:
        if jax.config.jax_compilation_cache_dir:
            return  # user already configured a cache — keep it
    except AttributeError:
        pass
    path = os.environ.get("MATCHERING_TPU_CACHE_DIR")
    if path is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if os.path.isdir(os.path.join(repo, ".git")) or os.path.isdir(
            os.path.join(repo, ".jax_cache")
        ):
            path = os.path.join(repo, ".jax_cache")
        else:
            path = os.path.join(
                os.path.expanduser("~"), ".cache", "matchering_tpu", "jax_cache"
            )
    enable_compile_cache(path)


def enable_pallas_vmem_headroom(kib: int = 114688) -> None:
    """Raise libtpu's scoped-VMEM limit so the fused Pallas limiter
    front-end can compile (this backend stack-allocates every Pallas output
    in scoped VMEM; the 16 MB default rejects full-track outputs — see
    ``ops/pallas_envelope.py``).  Appends to ``LIBTPU_INIT_ARGS``, which
    libtpu reads at backend initialization — call this (or set the env var)
    BEFORE the first TPU computation or it has no effect.  112 MB leaves
    16 MB of the v5e's 128 MB VMEM for the kernels' own tiles (measured
    footprint for the envelope kernel: ~3x its output bytes).
    """
    args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "--xla_tpu_scoped_vmem_limit_kib=" not in args:
        os.environ["LIBTPU_INIT_ARGS"] = (
            f"{args} --xla_tpu_scoped_vmem_limit_kib={kib}".strip()
        )
