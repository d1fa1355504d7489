"""Fused Pallas SpMV for stencil-structured block-sparse matrices.

TPU-native replacement for the reference's CSR row-loop SpMV
(Operator.h:331-346) on ingested lattice matrices and Galerkin coarse
operators. The row-pointer machinery of a general CSR kernel has no
efficient TPU form — Mosaic's dynamic gather is a lane-local (128-wide)
register shuffle, so ``x[cols]`` with arbitrary indices cannot feed the
vector units (measured: ``jnp.take_along_axis`` lowers only along the
lane axis within one vreg; row-granularity and sublane gathers are
rejected). Instead this kernel exploits what the uniform row structure
of these matrices *is*: an ``ne x ne``-blocked periodic 9-point stencil,
whose per-row "segments" are a fixed set of K = 2*ndim+1 blocks at
neighbour offsets. The segment reduction over a block row becomes an
in-register accumulation over K slots, and the column indirection
becomes contiguous shifted windows of a VMEM-resident x:

- x lives in VMEM for the whole launch, lane-major (ne, nb), padded with
  one periodic wrap of ``P = stride(dim 0)`` lanes on each side, so every
  +-mu window is a single in-bounds dynamic lane-slice;
- inner-dim wraps select between the unwrapped and wrapped windows with
  an iota coordinate mask (no data-dependent control flow);
- the block tensor is streamed exactly once per apply, lane-major
  (K, ne_col, ne_row, nb) with the x-column index j outermost-but-one so
  every per-(s, j) block read in the compute loop is one contiguous
  (ne_row, r) tile;
- y is written exactly once; the whole SpMV is one pass, one kernel.

Measured binding constraints (benchmarks/spmv_probe.py, interleaved
in-session A/B against throttling drift): the full kernel runs at
max(dma_only, vpu_only) with the two floors EQUAL within noise — compute
and block-stream DMA are fully overlapped, and the kernel sits at the
crossover where both bind. The VPU floor is ~4x the naive
8-real-ops-per-block-element model: the 12->16 sublane pad (+33%), the
per-(s, j) broadcast/accumulate instruction mix, and single-issue vector
scheduling all land on the same ALUs. Consequences: (a) bf16 block
storage buys little here (it halves DMA but adds upcasts to an already
compute-co-bound loop — measured ~10%); (b) the remaining levers are
algorithmic: detect structure in the ingested matrix and move less —
Wilson-structured matrices route to the half-spinor streaming Dslash
(ops/ingest.py), which moves ~9x fewer value bytes per nnz.

Split re/im (cplx.CF) arrays throughout; reduced-precision (bf16) block
storage is supported and halves the dominant traffic term.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgpgcr_tpu import cplx


def _strides(dims: tuple[int, ...]) -> list[int]:
    s = [1] * len(dims)
    for i in range(len(dims) - 2, -1, -1):
        s[i] = s[i + 1] * dims[i + 1]
    return s


def _stencil_spmv_kernel(
    b_re, b_im,    # (K, ne_col, ne_row, R) block slab for this row tile
    xp_re, xp_im,  # (ne, nb + 2P) padded x, VMEM-resident (constant window)
    out_re, out_im,  # (ne, R)
    *,
    dims: tuple[int, ...],
    r: int,
    pad: int,
):
    nd = len(dims)
    strides = _strides(dims)
    ne = out_re.shape[0]
    a = pl.program_id(0) * r
    acc = jnp.asarray(0, jnp.int32)  # anchor dtype for index arithmetic

    def window(off: int) -> cplx.CF:
        # Mosaic requires dynamic lane-slice starts to be provably
        # 128-aligned: split the static offset into an aligned part
        # (folded into the dynamic start — ``a`` is a multiple of 128)
        # and a sub-vreg remainder applied as a static in-register slice
        g0 = off + pad
        q, rem = (g0 // 128) * 128, g0 % 128
        if rem == 0:
            sl = pl.ds(a + q, r)
            return cplx.CF(xp_re[:, sl], xp_im[:, sl])
        sl = pl.ds(a + q, r + 128)
        return cplx.CF(
            xp_re[:, sl][:, rem : rem + r], xp_im[:, sl][:, rem : rem + r]
        )

    lane = lax.broadcasted_iota(jnp.int32, (1, r), 1) + (a + acc)

    gathered = [window(0)]
    for d in range(nd):
        m, ext = strides[d], dims[d]
        if d == 0:
            # outermost dim: flat-index wrap IS the periodic wrap, and the
            # pad (one full dim-0 stride each side) holds exactly those
            # wrapped values — single window, no mask
            gathered.append(window(+m))
            gathered.append(window(-m))
            continue
        coord = (lane // m) % ext
        wrap_hi = coord == ext - 1
        wrap_lo = coord == 0
        g_p = cplx.where(wrap_hi, window(m - ext * m), window(+m))
        g_m = cplx.where(wrap_lo, window(ext * m - m), window(-m))
        gathered.append(g_p)
        gathered.append(g_m)

    fdt = out_re.dtype
    yr = jnp.zeros((ne, r), fdt)
    yi = jnp.zeros((ne, r), fdt)
    for s, g in enumerate(gathered):
        for j in range(ne):
            # slab is (K, ne_col, ne_row, R): [s, j] is one CONTIGUOUS
            # (ne_row, R) tile — a middle-dim j index on a row-major
            # (K, ne_row, ne_col, R) slab would be a sublane-strided
            # VMEM read repeated K*ne times per grid step
            br = b_re[s, j].astype(fdt)
            bi = b_im[s, j].astype(fdt)
            gr = g.re[j : j + 1, :]
            gi = g.im[j : j + 1, :]
            yr = yr + br * gr - bi * gi
            yi = yi + br * gi + bi * gr
    out_re[...] = yr
    out_im[...] = yi


def _pick_tile(nb: int) -> int:
    """Lane-tile: a multiple of 128 (the aligned-window scheme needs
    128-aligned tile starts) when nb allows, else the whole row range
    (interpreter-mode / tiny problems)."""
    if nb % 128 == 0:
        for cand in (512, 256, 128):
            if nb % cand == 0 and nb // cand >= 4:
                return cand
        return 128
    return nb


@functools.partial(jax.jit, static_argnames=("dims", "interpret"))
def stencil_spmv(
    blocks: cplx.CF, x: cplx.CF, dims: tuple[int, ...], interpret: bool = False
) -> cplx.CF:
    """y = A x for a block-stencil A. blocks: CF (nb, K, ne, ne) with slot
    order [self, +d0, -d0, ...]; x: CF (nb*ne,); returns CF (nb*ne,)."""
    nb = 1
    for d in dims:
        nb *= d
    ne = blocks.shape[-1]
    k = blocks.shape[1]
    assert k == 2 * len(dims) + 1, (blocks.shape, dims)
    assert blocks.shape[0] == nb and x.shape == (nb * ne,)
    pad = _strides(dims)[0]
    r = _pick_tile(nb)
    # right pad carries one extra vreg of wrap so unaligned windows can
    # over-load 128 lanes and slice in-register (see kernel ``window``)
    rpad = pad + 128

    # lane-major relayouts (loop-invariant: XLA hoists them out of solver
    # while_loops, so per-iteration cost is the kernel alone)
    # j (the x-column index) outermost-but-one so the kernel's per-(s, j)
    # block read is one contiguous (ne_row, r) tile (a middle-dim j index
    # would be a sublane-strided VMEM read repeated K*ne times per step —
    # measured 1.5x slower; pre-tiling the slab to rank-5 per-step
    # contiguous runs was measured 2x SLOWER still, Mosaic's strided
    # multi-row window DMA beats its rank-5 block handling)
    bt = cplx.transpose(blocks, (1, 3, 2, 0))  # (K, ne_col, ne_row, nb)
    xt = cplx.transpose(x.reshape(nb, ne), (1, 0))  # (ne, nb)
    reps = -(-rpad // nb)  # cyclic right pad (covers tiny interpret runs)
    right = cplx.concatenate([xt] * reps, axis=1)[:, :rpad]
    xp = cplx.concatenate(
        [xt[:, nb - pad :], xt, right], axis=1
    )  # (ne, nb + 2P + 128)

    fdt = x.dtype
    kernel = functools.partial(
        _stencil_spmv_kernel, dims=tuple(dims), r=r, pad=pad
    )
    bspec = pl.BlockSpec(
        (k, ne, ne, r), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM
    )
    xspec = pl.BlockSpec(
        (ne, nb + pad + rpad), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec((ne, r), lambda i: (0, i), memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    yr, yi = pl.pallas_call(
        kernel,
        grid=(nb // r,),
        in_specs=[bspec, bspec, xspec, xspec],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((ne, nb), fdt),
            jax.ShapeDtypeStruct((ne, nb), fdt),
        ),
        interpret=interpret,
        **kwargs,
    )(bt.re, bt.im, xp.re, xp.im)
    y = cplx.CF(yr, yi)
    return cplx.transpose(y, (1, 0)).reshape((nb * ne,))
