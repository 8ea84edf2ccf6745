"""Pallas TPU kernel: masked 256-bin histogram over per-chunk byte buffers.

XLA's scatter-add histogram costs ~0.3 s per 1M bytes on v5e; here the
one-hot never leaves VMEM and the reduction rides the MXU:
``hist += mask_row (1,128) @ onehot(bytes_row) (128,256)`` per 128-byte
row. f32 accumulators are split over 8 sublanes (row index mod 8) so each
stays below 2^24 and the sum is exact for any realistic input.

``lengths[c]`` masks each chunk's tail (fixed-shape padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_I32 = jnp.int32


def _hist_kernel(lengths_ref, data_ref, hist_ref, acc_ref, *, rows: int,
                 tile: int):
    c = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((c == 0) & (t == 0))
    def _init():
        acc_ref[:, :] = jnp.zeros((8, 256), jnp.float32)

    data = data_ref[0]  # (rows, 128) int32 byte values
    length = lengths_ref[c]
    base = t * tile
    lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
    row = lax.broadcasted_iota(_I32, (rows, LANES), 0)
    pos = base + row * LANES + lane
    mask = (pos < length).astype(jnp.float32).astype(jnp.bfloat16)

    # one batched matmul per tile: rows are the batch dim, then a
    # rows-reduction; accumulator row (t % 8) keeps each f32 entry
    # below 2^24 (exact) for inputs up to 16M bytes per chunk set
    oh = (
        data[:, :, None]
        == lax.broadcasted_iota(_I32, (rows, LANES, 256), 2)
    ).astype(jnp.bfloat16)
    tile_hist = jnp.sum(
        lax.dot_general(
            mask[:, None, :], oh,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ),
        axis=0,
    )  # (1, 256)
    slot = (c * pl.num_programs(1) + t) % 8
    acc_ref[pl.ds(slot, 1), :] += tile_hist

    @pl.when((c == pl.num_programs(0) - 1) & (t == pl.num_programs(1) - 1))
    def _flush():
        hist_ref[:, :] = acc_ref[:, :].astype(_I32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def histogram_chunks(
    data: jnp.ndarray, lengths: jnp.ndarray, *,
    tile: int = 2048, interpret: bool | None = None,
) -> jnp.ndarray:
    """Global masked histogram over ``data: u8[C, N]`` (N % tile == 0).

    Returns u32[256]: sum over chunks of ``bincount(data[c, :lengths[c]])``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, n = data.shape
    assert n % tile == 0 and tile % LANES == 0
    rows = tile // LANES
    data_i = data.astype(jnp.int32).reshape(c, n // LANES, LANES)

    kernel = functools.partial(_hist_kernel, rows=rows, tile=tile)
    hist8 = pl.pallas_call(
        kernel,
        grid=(c, n // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, rows, LANES), lambda ci, ti: (ci, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, 256), lambda ci, ti: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 256), jnp.float32)],
        interpret=interpret,
    )(lengths.astype(jnp.int32), data_i)
    return jnp.sum(hist8, axis=0).astype(jnp.uint32)
