"""Decompose the streaming Dslash kernel's time into compute vs DMA.

Three timings with the production grid/window shapes at 32^4:
  full     — the production kernel (bf16 two-row links, f32 fields);
  compute  — same kernel body, but every index map is constant so each
             HBM window is fetched once (step 2+ pays compute only);
  dma      — trivial kernel body (copy center plane to out) with the
             production index maps, so each step pays the full window
             DMA but almost no compute.

If full ~= dma, the kernel is bandwidth-bound (done). If full ~= compute,
the VPU work (colour muls / spin algebra / rotates / SU(3) reconstruct)
is the floor and traffic tuning can't help.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.pallas.dslash import (
    _dslash_stream_kernel,
    compress_links_tmajor,
    links_to_tmajor,
)


def _build(links, psi, mesh, mode: str, fdt):
    t, z, y, xx = mesh.spacetime_dims
    v = y * xx
    nt = t
    nrow = links.shape[2]

    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    if mode == "compute":
        maps = [
            lambda i: (0, 0, 0, 0, 0),
            lambda i: (0, 0, 0, 0, 0),
            lambda i: (0, 0, 0, 0, 0),
            lambda i: (0, 0, 0, 0, 0, 0),
            lambda i: (0, 0, 0, 0, 0, 0),
        ]
        out_map = lambda i: (0, 0, 0, 0, 0)  # noqa: E731
    else:
        maps = [
            lambda i: (0, 0, (i + 1) % nt, 0, 0),
            lambda i: (0, 0, 0, 0, 0),
            lambda i: (0, 0, nt - 1, 0, 0),
            lambda i: (i, 0, 0, 0, 0, 0),
            lambda i: (nt - 1, 0, 0, 0, 0, 0),
        ]
        out_map = lambda i: (0, 0, i, 0, 0)  # noqa: E731

    shapes = [
        (4, 3, 1, z, v),
        (4, 3, 1, z, v),
        (4, 3, 1, z, v),
        (1, 4, nrow, 3, z, v),
        (1, 1, nrow, 3, z, v),
    ]
    specs = [vspec(s, m) for s, m in zip(shapes, maps)]
    out_spec = vspec((4, 3, 1, z, v), out_map)

    in_specs = [pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    for s in specs:
        in_specs += [s, s]
    k_arr = jnp.zeros((1, 2), fdt)
    flat_args = [k_arr]
    for a in [psi, psi, psi, links, links]:
        flat_args += [a.re, a.im]

    if mode == "dma":
        def kernel(k_ref, pn_re, pn_im, pf_re, pf_im, pq_re, pq_im,
                   uc_re, uc_im, ul_re, ul_im, out_re, out_im,
                   ps_re, ps_im, us_re, us_im):
            # touch every input window so the DMA can't be elided; ~no ALU
            out_re[...] = pn_re[...]
            out_im[...] = pn_im[...]
    else:
        kernel = functools.partial(
            _dslash_stream_kernel, y=y, xx=xx, fuse_dirac=False,
            compressed=nrow == 2,
        )

    call = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct(psi.re.shape, fdt),
            jax.ShapeDtypeStruct(psi.re.shape, fdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 4, 3, 1, z, v), fdt),
            pltpu.VMEM((2, 4, 3, 1, z, v), fdt),
            pltpu.VMEM((2, 3, 3, z, v), fdt),
            pltpu.VMEM((2, 3, 3, z, v), fdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    return call, flat_args


def _time(fn, args, rounds=3, inner=40):
    """Chain output -> psi input directly (no per-iteration scale pass —
    an elementwise epilogue between pallas calls costs a full extra field
    read+write per apply and pollutes the measurement). psi_0 is scaled
    tiny so 40 chained D applies stay finite in f32."""
    k_arr, links_args = args[0], args[7:]

    def chain(p_re, p_im):
        def body(_, c):
            return fn(k_arr, c[0], c[1], c[0], c[1], c[0], c[1], *links_args)

        return jax.lax.fori_loop(0, inner, body, (p_re, p_im))

    runj = jax.jit(chain)
    p0 = (args[1] * 1e-30, args[2] * 1e-30)
    out = runj(*p0)
    float(jnp.sum(out[0]))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = runj(*p0)
        float(jnp.sum(out[0]))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    dims = (32, 32, 32, 32)
    mesh = LatticeMesh((*dims, 4, 3))
    t, z, y, xx = dims
    fdt = jnp.float32
    links = cplx.random(jax.random.PRNGKey(0), (4, 3, 3, t, z, y * xx), fdt)
    lt = compress_links_tmajor(links_to_tmajor(links)).astype(jnp.bfloat16)
    psi = cplx.random(jax.random.PRNGKey(1), (4, 3, t, z, y * xx), fdt)

    for mode in ("full", "compute", "dma"):
        call, args = _build(lt, psi, mesh, mode, fdt)
        dt = _time(call, args)
        print(f"{mode:8s}: {dt*1e6:8.1f} us/apply")


if __name__ == "__main__":
    main()
