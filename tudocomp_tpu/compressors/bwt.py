"""BWT compressor.

Reference: ``compressors/BWTCompressor.hpp`` — compress = raw BWT bytes of
the 0-sentineled input (forward transform is a pure SA gather); decompress
= LF-mapping walk, emitting the text plus the sentinel (the restriction
layer strips it).
"""

from __future__ import annotations

import numpy as np

from tudocomp_tpu.compressors.base import Compressor
from tudocomp_tpu.ds.bwt import bwt_decode, bwt_forward
from tudocomp_tpu.ds.suffix import suffix_array
from tudocomp_tpu.meta import Meta


def _on_tpu() -> bool:
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


class BWTCompressor(Compressor):
    @classmethod
    def meta(cls):
        m = Meta("compressor", "bwt", "BWT Compressor")
        m.option_dynamic("device", "false")
        m.needs_sentinel_terminator()
        return m

    #: inputs at least this long may use the device SA/BWT path on TPU.
    #: Opt-in via bwt(device=true) (env TDC_DEVICE_BWT=1 overrides):
    #: each input size compiles its own device program, so the device
    #: path only pays off for repeated same-shape workloads (and a
    #: direct-attached chip; over the axon tunnel the d2h transfer
    #: dominates).
    DEVICE_MIN = 1 << 15

    def _want_device(self) -> bool:
        import os

        env = os.environ.get("TDC_DEVICE_BWT")
        if env is not None:
            return env == "1"
        return self.env.option("device").as_bool()

    def compress(self, data: bytes) -> bytes:
        if not data.endswith(b"\x00"):
            raise ValueError("bwt requires a sentineled input")
        t = np.frombuffer(data, np.uint8)
        if (
            self._want_device()
            and len(data) >= self.DEVICE_MIN and _on_tpu()
        ):
            import jax.numpy as jnp

            from tudocomp_tpu.ops.suffix_jax import (
                bwt_device, isa_device, suffix_array_device,
            )

            td = jnp.asarray(t)
            sa = suffix_array_device(td)
            bw = bwt_device(td, isa_device(sa))
            return np.asarray(bw).tobytes()
        sa = suffix_array(t)
        return bwt_forward(t, sa).tobytes()

    def decompress(self, data: bytes) -> bytes:
        if (
            self._want_device()
            and len(data) >= self.DEVICE_MIN and _on_tpu()
        ):
            import jax.numpy as jnp

            from tudocomp_tpu import debug
            from tudocomp_tpu.ops.suffix_jax import unbwt_device

            arr = np.frombuffer(data, np.uint8)
            if debug.PARANOID:  # mirror the host path's LF invariant
                from tudocomp_tpu.ds.bwt import compute_lf

                debug.check_lf(compute_lf(arr), arr)
            out = unbwt_device(jnp.asarray(arr))
            return np.asarray(out).tobytes() + b"\x00"
        from tudocomp_tpu import native

        return native.bwt_decode(data) + b"\x00"
