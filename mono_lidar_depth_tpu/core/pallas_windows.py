"""Pallas TPU kernel: per-feature rectangular window extraction.

Replaces the XLA lowering of `vmap(dynamic_slice)` in the neighbor
gather (neighbors.py).  XLA turns the vmapped slice into a device loop
of dynamic-update-slices at ~1.2 us per feature (~2.4 ms for 2048
features); here each feature's [C, Ky, Kx] window is one async DMA
HBM→VMEM, issued in flight-batches so DMA latency overlaps, with the
output block flushed once per grid step.

The planes stack stays in HBM (`memory_space=ANY`); only the windows
ever touch VMEM.  Window starts are scalar-prefetched so the DMAs can
be issued immediately at grid-step entry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_kernel(sy_ref, sx_ref, stack_ref, out_ref, sems,
                   *, block: int, Ky: int, Kx: int):
    i = pl.program_id(0)
    base = i * block

    def start(b, _):
        y = pl.multiple_of(sy_ref[base + b], 8)
        x = sx_ref[base + b]
        pltpu.make_async_copy(
            stack_ref.at[:, pl.ds(y, Ky), pl.ds(x, Kx)],
            out_ref.at[b],
            sems.at[b],
        ).start()
        return _

    jax.lax.fori_loop(0, block, start, None)

    def wait(b, _):
        y = pl.multiple_of(sy_ref[base + b], 8)
        x = sx_ref[base + b]
        pltpu.make_async_copy(
            stack_ref.at[:, pl.ds(y, Ky), pl.ds(x, Kx)],
            out_ref.at[b],
            sems.at[b],
        ).wait()
        return _

    jax.lax.fori_loop(0, block, wait, None)


@functools.partial(jax.jit, static_argnames=("Ky", "Kx", "block"))
def slice_windows_tpu(stack: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                      Ky: int, Kx: int, block: int = 128) -> jnp.ndarray:
    """[N, C, Ky, Kx] windows of `stack` [C, H, W] at rows sy / cols sx.

    Starts must be pre-clamped so the window fits: sy in [0, H-Ky],
    sx in [0, W-Kx].  N must be a multiple of `block` (the caller pads).
    """
    C, H, W = stack.shape
    N = sy.shape[0]
    assert N % block == 0, (N, block)
    grid = (N // block,)
    kernel = functools.partial(_window_kernel, block=block, Ky=Ky, Kx=Kx)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(
                (block, C, Ky, Kx),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((block,))],
        ),
        out_shape=jax.ShapeDtypeStruct((N, C, Ky, Kx), stack.dtype),
    )(sy, sx, stack)


def slice_windows(stack: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                  Ky: int, Kx: int) -> jnp.ndarray:
    """Backend-dispatching window extraction (TPU: Pallas DMA kernel;
    elsewhere: XLA vmapped dynamic_slice).

    On TPU the sliced row count is padded to the sublane tile (8) —
    Mosaic requires tile-aligned slice shapes on the sublane dim — and
    the extra rows are trimmed after the kernel (the caller's rect mask
    would ignore them anyway).
    """
    N = sy.shape[0]
    C = stack.shape[0]
    # Mosaic (as of this toolchain) requires DMA slice shapes AND start
    # offsets tile-aligned on the last two dims ((8, 128) for f32), so
    # the per-feature DMA kernel is only usable for 128-aligned window
    # columns — never true for the reference's ~8-14-cell windows.  A
    # lane-aligned variant (align starts down, slice [C, Ky+8, 256],
    # rotate in-kernel) moves ~250 MB/frame through VMEM and loses to
    # the XLA loop, so the kernel stays gated until Mosaic lifts the
    # restriction.
    if (jax.default_backend() != "cpu" and N % 128 == 0
            and Ky % 8 == 0 and Kx % 128 == 0):
        return slice_windows_tpu(stack, sy, sx, Ky, Kx)

    def one(sy_i, sx_i):
        return jax.lax.dynamic_slice(stack, (0, sy_i, sx_i), (C, Ky, Kx))

    return jax.vmap(one)(sy, sx)
