"""tudocomp-tpu: a TPU-native lossless compression framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the tudocomp
framework (see SURVEY.md / ARCHITECTURE.md). Compressors and coders are
composable, registered, named modules selectable at runtime from an algorithm
string such as ``lzss_lcp(coder=huff, threshold=5)``.
"""

__version__ = "0.1.0"


def _default_compile_cache() -> None:
    """Compiles over the tunneled TPU take minutes; make the persistent
    XLA compile cache the default for every entry point (CLI, library,
    bench). An explicit jax.config / env setting wins; opt out with
    TDC_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("TDC_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            # CPU runs (tests, the driver's multichip dryrun) get a
            # cache dir keyed by this host's CPU feature set: XLA:CPU
            # AOT artifacts embed machine features, and sharing them
            # across machines logs cpu_aot_loader mismatch errors and
            # can SIGILL/segfault on stale reads. TPU artifacts target
            # the chip, not the host, so the TPU dir stays shared.
            platforms = os.environ.get("JAX_PLATFORMS", "")
            if platforms.split(",")[0].strip().lower() == "cpu":
                from tudocomp_tpu.utils.cachedir import cpu_cache_dir

                cache = cpu_cache_dir(
                    os.path.expanduser("~/.cache")
                )
            else:
                cache = os.path.expanduser("~/.cache/jaxcomp")
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:
        pass


_default_compile_cache()

from tudocomp_tpu.ranges import (  # noqa: F401
    Range,
    BitRange,
    LiteralRange,
    LengthRange,
    MinDistributedRange,
    bit_r,
    literal_r,
    uliteral_r,
    len_r,
    size_r,
)
