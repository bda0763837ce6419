"""Fused Pallas kernel for the VGG stage-1 stem: conv1_1 -> relu -> conv1_2
-> relu -> 2x2 maxpool in ONE kernel.

Why: profiling the batch-1 streaming step (BENCH.md round 2) shows VGG stage 1
costs ~0.39 ms of a 1.97 ms step — conv1_1 (0.07) + conv1_2 (0.11) + ~0.2 ms
of pure layout copies XLA inserts around them at 320x320 resolution, plus the
pool. Fusing the stage keeps the hot 320^2 activations in VMEM end-to-end:
one HBM read of the input patches, one HBM write of the pooled (160,160,64)
output, zero intermediate round-trips.

Formulation (MXU-native, no explicit im2col in the kernel):
  * XLA pre-builds 3x3 input patches (B, H+2, W+2, 27) — the +2 ring carries
    conv2's halo; patch channel t = (dy*3+dx)*3+ch matches
    k1.reshape(27, 64) row-major.
  * conv1_1 is ONE (rows*(W+2), 27) @ (27, 64) matmul per strip.
  * conv1_2 is 9 shifted (rows*W, 64) @ (64, 64) matmuls accumulated in fp32.
  * maxpool 2x2 via two in-VMEM max-reductions.
  * Grid: (batch, H/rows) strips of rows conv rows -> rows/2 pooled rows. The 2-row
    inter-strip halo is fetched as a second BlockSpec view of the same array
    (2-row-high view whose block index lands on the strip's last 2 rows),
    so Pallas's automatic block pipelining double-buffers both views — no
    manual DMA.

Weight-compatible with the reference stem (same conv1_1/conv1_2 params, same
SAME-padding geometry); compute is bf16 with fp32 accumulation (inference
profile — training uses the unfused stem, same parameter tree).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _stem_kernel(main_ref, halo_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    rows = main_ref.shape[1]  # conv rows per strip
    wp2 = main_ref.shape[2]  # W + 2
    w = wp2 - 2
    n = w1_ref.shape[1]  # output channels
    cdt = main_ref.dtype

    # o1 rows [rows*s, rows*s + rows + 2): strip block + 2-row halo view.
    p = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)  # (rows+2, W+2, 27)
    a = p.reshape((rows + 2) * wp2, p.shape[-1])
    o1 = jnp.dot(a, w1_ref[:], preferred_element_type=jnp.float32)
    o1 = jnp.maximum(o1 + b1_ref[:], 0.0)
    o1 = o1.reshape(rows + 2, wp2, n)
    # conv2's SAME padding: the 1-pixel ring around conv1's (H, W) output must
    # be ZERO — the matmul above evaluated conv1 beyond the image there
    # (bias+relu make that nonzero), so mask it out. Global o1 row index of
    # local row i is 32*si + i; valid conv1 outputs live at [1, H+1) x [1, W+1).
    si = pl.program_id(1)
    h_total = pl.num_programs(1) * rows  # H (conv rows)
    gi = si * rows + jax.lax.broadcasted_iota(jnp.int32, (rows + 2, wp2), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, wp2), 1)
    valid = (gi >= 1) & (gi <= h_total) & (gj >= 1) & (gj <= w)
    # (bool[:, :, None] inserts a minor dim on a 1-bit type, which Mosaic
    # rejects; multiply by an f32 mask instead.)
    o1 = (o1 * valid.astype(jnp.float32)[:, :, None]).astype(cdt)

    acc = jnp.zeros((rows * w, n), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            a2 = o1[dy:dy + rows, dx:dx + w, :].reshape(rows * w, n)
            acc = acc + jnp.dot(
                a2, w2_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    y = jnp.maximum(acc + b2_ref[:], 0.0).reshape(rows, w, n)

    # 2x2 maxpool via reshape-grouped maxes (strided slices lower to a >2D
    # gather Mosaic rejects; dim-splitting reshapes it handles).
    y = jnp.max(y.reshape(rows // 2, 2, w, n), axis=1)
    y = jnp.max(y.reshape(rows // 2, w // 2, 2, n), axis=2)
    out_ref[0] = y.astype(out_ref.dtype)


def _stage_kernel(main_ref, halo_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    """Generic two-conv+pool stage (9-shift formulation, any channel counts).

    main (1, R, W+4, Cin) + halo (1, 4, W+4, Cin) = R+4 input rows of the
    2-padded input; conv1 -> o1 rows [R*s, R*s+R+2) on the (H+2, W+2) grid
    (ring zeroed for conv2's SAME padding), conv2 -> R rows, pool -> R/2.
    """
    rows = main_ref.shape[1]
    wp4 = main_ref.shape[2]
    w = wp4 - 4
    cmid = w1_ref.shape[2]
    n = w2_ref.shape[2]
    cdt = main_ref.dtype

    x36 = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)  # (36, W+4, Cin)
    acc1 = jnp.zeros(((rows + 2) * (w + 2), cmid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            a = x36[dy:dy + rows + 2, dx:dx + w + 2, :].reshape(
                (rows + 2) * (w + 2), x36.shape[-1]
            )
            acc1 = acc1 + jnp.dot(
                a, w1_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    o1 = jnp.maximum(acc1 + b1_ref[:], 0.0).reshape(rows + 2, w + 2, cmid)
    si = pl.program_id(1)
    h_total = pl.num_programs(1) * rows
    gi = si * rows + jax.lax.broadcasted_iota(jnp.int32, (rows + 2, w + 2), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, w + 2), 1)
    valid = (gi >= 1) & (gi <= h_total) & (gj >= 1) & (gj <= w)
    # (bool[:, :, None] inserts a minor dim on a 1-bit type, which Mosaic
    # rejects; multiply by an f32 mask instead.)
    o1 = (o1 * valid.astype(jnp.float32)[:, :, None]).astype(cdt)

    acc = jnp.zeros((rows * w, n), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            a2 = o1[dy:dy + rows, dx:dx + w, :].reshape(rows * w, cmid)
            acc = acc + jnp.dot(
                a2, w2_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    y = jnp.maximum(acc + b2_ref[:], 0.0).reshape(rows, w, n)
    # 2x2 maxpool via reshape-grouped maxes (strided slices lower to a >2D
    # gather Mosaic rejects; dim-splitting reshapes it handles).
    y = jnp.max(y.reshape(rows // 2, 2, w, n), axis=1)
    y = jnp.max(y.reshape(rows // 2, w // 2, 2, n), axis=2)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "out_dtype", "rows")
)
def fused_conv_stage(
    x, k1, b1, k2, b2, *, compute_dtype=jnp.bfloat16, out_dtype=None,
    interpret=False, rows=8,
):
    """Generic fused maxpool2(relu(conv2(relu(conv1(x))))) for any channel
    counts — used for VGG stage 2 (64->128->128 at size/2 resolution), where
    the 9-shift matmuls run at K=64/128 (full MXU K-utilization vs the
    3-channel stage-1 input, which uses the patches formulation above).
    x: (B, H, W, Cin); k1: (3, 3, Cin, Cmid); k2: (3, 3, Cmid, Cout).
    """
    b, h, w, cin = x.shape
    cmid, n = k1.shape[-1], k2.shape[-1]
    # rows % 4: the 4-row halo view's block index math requires it.
    assert h % rows == 0 and w % 2 == 0 and rows % 4 == 0, (h, w, rows)
    assert k1.shape[:3] == (3, 3, cin) and k2.shape == (3, 3, cmid, n)
    out_dtype = out_dtype or x.dtype

    xp = jnp.pad(x.astype(compute_dtype), ((0, 0), (2, 2), (2, 2), (0, 0)))
    w1 = k1.reshape(9, cin, cmid).astype(compute_dtype)
    w2 = k2.reshape(9, cmid, n).astype(compute_dtype)
    b1r = b1.reshape(1, cmid).astype(jnp.float32)
    b2r = b2.reshape(1, n).astype(jnp.float32)

    return pl.pallas_call(
        _stage_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, n), out_dtype),
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec(
                (1, rows, w + 4, cin), lambda bi, si: (bi, si, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # 4-row halo view: block index 8*s+8 on 4-row blocks ==
            # element rows of the strip's trailing halo.
            pl.BlockSpec(
                (1, 4, w + 4, cin),
                lambda bi, si: (bi, (rows // 4) * si + rows // 4, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec(
            (1, rows // 2, w // 2, n), lambda bi, si: (bi, si, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(xp, xp, w1, b1r, w2, b2r)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "out_dtype", "rows")
)
def fused_stem_stage1(
    x, k1, b1, k2, b2, *, compute_dtype=jnp.bfloat16, out_dtype=None,
    interpret=False, rows=16,
):
    """maxpool2(relu(conv3x3_SAME(relu(conv3x3_SAME(x, k1) + b1), k2) + b2)).

    x: (B, H, W, 3); k1: (3, 3, 3, N); k2: (3, 3, N, N). Returns
    (B, H//2, W//2, N). H must be a multiple of ``rows`` (an even grid-strip
    height, default 16), W a multiple of 2.
    """
    b, h, w, c = x.shape
    n = k1.shape[-1]
    # rows % 2: the 2-row halo view's block index math requires it.
    assert h % rows == 0 and w % 2 == 0 and rows % 2 == 0, (h, w, rows)
    assert k1.shape[:3] == (3, 3, c) and k2.shape == (3, 3, n, n)
    out_dtype = out_dtype or x.dtype

    xp = jnp.pad(x.astype(compute_dtype), ((0, 0), (2, 2), (2, 2), (0, 0)))
    # patches[i, j, (dy*3+dx)*3+ch] = xp[i+dy, j+dx, ch]; the (H+2, W+2) grid
    # is conv1's SAME output padded by conv2's 1-pixel halo ring.
    pats = jnp.concatenate(
        [
            xp[:, dy:dy + h + 2, dx:dx + w + 2, :]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    )  # (B, H+2, W+2, 27)

    w1 = k1.reshape(9 * c, n).astype(compute_dtype)
    w2 = k2.reshape(9, n, n).astype(compute_dtype)
    b1r = b1.reshape(1, n).astype(jnp.float32)
    b2r = b2.reshape(1, n).astype(jnp.float32)

    grid = (b, h // rows)
    return pl.pallas_call(
        _stem_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, n), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, rows, w + 2, 9 * c), lambda bi, si: (bi, si, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # 2-row halo view: block index 16*s+16 on 2-row blocks ==
            # element rows [32s+32, 32s+34) of the same patches array.
            pl.BlockSpec(
                (1, 2, w + 2, 9 * c),
                lambda bi, si: (bi, (rows // 2) * si + rows // 2, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec(
            (1, rows // 2, w // 2, n), lambda bi, si: (bi, si, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(pats, pats, w1, b1r, w2, b2r)
