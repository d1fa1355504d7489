"""Pallas MG grid-transfer kernels: restrict (P^H x) and prolong (P xc).

The V-cycle transfer operators are pure streaming over the per-block basis
(q_field, the field-shaped prolongator columns: (ne, 4, 3, T, Z, Y*X) —
ne copies of a fine field, ~12x the field bytes at ne=12). The XLA
formulation (solvers/mg.py restrict_field / prolong_field: einsum +
reshape segment-sums) was measured ~7x off HBM bandwidth at 32^4
(15.5 / 14.2 ms vs ~2.3 ms of minimal traffic) — the segmented
reductions over the merged minor axis tile badly. These kernels stream
t-planes of the basis exactly once and do the within-block reductions /
broadcasts on resident planes:

  restrict: out[B, e] = sum_{sites in B} conj(q_e) . x
      per plane: spin/colour contraction (VPU), z-block partial sums via
      a sublane reshape, y/x-block sums as ONE small MXU matmul against a
      0/1 block-membership matrix (the merged Y*X axis never reshapes).
  prolong:  out = r + damping * sum_e q_e * c[e, B(site)]
      per plane: coefficient broadcast = the transposed matmul, then a
      fused multiply-accumulate over e; the additive base r (the
      deflation identity term) rides the same pass.

Traffic per transfer op = q_field once + one field in/out — the basis
dominates, so q_field may be stored bf16 (preconditioner-side rounding,
same rationale as bf16 gauge links for the smoother; the outer Krylov
residual never touches it).

Grid layout: restrict runs (ne_chunks, T) — for a fixed basis chunk the
output block (one Bt row) stays resident across its bt planes and
accumulates in place; x planes re-stream per chunk (ne_chunk chosen so
at most ~2 extra field passes). Prolong runs (T, ne_chunks) — the output
plane stays resident while basis chunks cycle.

Reference being replaced: MG::restrict / MG::expand (MG.h:348-403) —
serial per-block dot/axpy loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import BlockMap


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_kwargs() -> dict:
    if _interpret():
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        )
    }


def _vspec(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _ne_chunk(ne: int, z: int, v: int, itemsize: int) -> int:
    """Largest divisor of ne whose double-buffered plane window stays
    under ~28 MB (2 components x 12 spin-colour slabs per basis row)."""
    budget = 28 * 1024 * 1024
    per_row = 2 * 12 * z * v * itemsize
    for d in sorted((d for d in range(1, ne + 1) if ne % d == 0), reverse=True):
        if 2 * d * per_row <= budget:
            return d
    return 1


def _vmask(block_map: BlockMap) -> np.ndarray:
    """(V, By*Bx) 0/1 block membership of the merged y*x minor axis."""
    t, z, y, xx = block_map.mesh.spacetime_dims
    bt, bz, by, bx = block_map.block_dims
    By, Bx = y // by, xx // bx
    v_idx = np.arange(y * xx)
    blk = (v_idx // xx // by) * Bx + (v_idx % xx) // bx
    m = np.zeros((y * xx, By * Bx), np.float32)
    m[v_idx, blk] = 1.0
    return m


# ---------------------------------------------------------------------------
# restrict
# ---------------------------------------------------------------------------
def _restrict_kernel(
    q_re, q_im, x_re, x_im, vm_ref, o_re, o_im,
    *, bt: int, bz: int, nec: int, fdt,
):
    i = pl.program_id(1)  # t plane

    @pl.when(i % bt == 0)
    def _init():
        o_re[...] = jnp.zeros_like(o_re)
        o_im[...] = jnp.zeros_like(o_im)

    vm = vm_ref[...]  # (V, Bs)
    xr = [[x_re[s, c, 0].astype(fdt) for c in range(3)] for s in range(4)]
    xi = [[x_im[s, c, 0].astype(fdt) for c in range(3)] for s in range(4)]
    z = x_re.shape[-2]
    Bz = z // bz
    for e in range(nec):
        pr = jnp.zeros_like(xr[0][0])
        pi = jnp.zeros_like(xr[0][0])
        for s in range(4):
            for c in range(3):
                qr = q_re[e, s, c, 0].astype(fdt)
                qi = q_im[e, s, c, 0].astype(fdt)
                pr += qr * xr[s][c] + qi * xi[s][c]
                pi += qr * xi[s][c] - qi * xr[s][c]
        # z-block partials: sublane reshape; y/x-block sums: one matmul
        pr = pr.reshape(Bz, bz, pr.shape[-1]).sum(axis=1)
        pi = pi.reshape(Bz, bz, pi.shape[-1]).sum(axis=1)
        # HIGHEST: the MXU's default f32 path is a single bf16 pass —
        # ~1e-3 rounding on the block sums; these matmuls are tiny next
        # to the plane DMA, so full f32 precision is free
        o_re[0, e] += jax.lax.dot(
            pr, vm, preferred_element_type=fdt,
            precision=jax.lax.Precision.HIGHEST,
        )
        o_im[0, e] += jax.lax.dot(
            pi, vm, preferred_element_type=fdt,
            precision=jax.lax.Precision.HIGHEST,
        )


def restrict_pallas(q_field: cplx.CF, block_map: BlockMap, x: cplx.CF):
    """R x = P^H x on TPU-layout CF fields -> flat coarse (nb*ne,) CF,
    b-major / e-minor (same layout as solvers/mg.py restrict)."""
    t, z, y, xx = block_map.mesh.spacetime_dims
    bt, bz, by, bx = block_map.block_dims
    Bt, Bz = t // bt, z // bz
    Bs = (y // by) * (xx // bx)
    v = y * xx
    ne = q_field.shape[0]
    fdt = x.dtype
    nec = _ne_chunk(ne, z, v, jnp.dtype(q_field.dtype).itemsize)
    G = ne // nec

    qplane = _vspec((nec, 4, 3, 1, z, v), lambda g, i: (g, 0, 0, i, 0, 0))
    xplane = _vspec((4, 3, 1, z, v), lambda g, i: (0, 0, i, 0, 0))
    vmspec = _vspec((v, Bs), lambda g, i: (0, 0))
    out = _vspec((1, nec, Bz, Bs), lambda g, i: (i // bt, g, 0, 0))

    kernel = functools.partial(
        _restrict_kernel, bt=bt, bz=bz, nec=nec, fdt=fdt
    )
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=(G, t),
        in_specs=[qplane, qplane, xplane, xplane, vmspec],
        out_specs=(out, out),
        out_shape=(
            jax.ShapeDtypeStruct((Bt, ne, Bz, Bs), fdt),
            jax.ShapeDtypeStruct((Bt, ne, Bz, Bs), fdt),
        ),
        interpret=_interpret(),
        **_compiler_kwargs(),
    )(
        q_field.re.reshape(ne, 4, 3, t, z, v),
        q_field.im.reshape(ne, 4, 3, t, z, v),
        x.re.reshape(4, 3, t, z, v),
        x.im.reshape(4, 3, t, z, v),
        jnp.asarray(_vmask(block_map), fdt),
    )
    # (Bt, ne, Bz, Bs) -> b-major e-minor flat (nb * ne,): tiny transpose
    nb = block_map.n_blocks
    o_re = o_re.transpose(0, 2, 3, 1).reshape(nb * ne)
    o_im = o_im.transpose(0, 2, 3, 1).reshape(nb * ne)
    return cplx.CF(o_re, o_im)


# ---------------------------------------------------------------------------
# prolong (+ optional additive base and damping)
# ---------------------------------------------------------------------------
def _prolong_kernel(
    c_re, c_im, q_re, q_im, r_re, r_im, vm_ref, o_re, o_im,
    *, bt: int, bz: int, nec: int, damping: float, with_r: bool, fdt,
):
    g = pl.program_id(1)
    vm = vm_ref[...]  # (V, Bs)
    z = o_re.shape[-2]
    Bz = z // bz
    dmp = jnp.asarray(damping, fdt)

    # coefficient broadcast per basis row: (Bz, Bs) @ (Bs, V) -> (Bz, V),
    # then sublane-expand Bz -> Z
    def expand(cc):  # (Bz, Bs) -> (Z, V)
        # HIGHEST: each output element is exactly one coefficient (0/1
        # mask), but the MXU's default f32 path rounds through bf16
        full = jax.lax.dot(
            cc, vm.T, preferred_element_type=fdt,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.repeat(full, bz, axis=0)

    ce = [
        (expand(c_re[0, e] * dmp), expand(c_im[0, e] * dmp))
        for e in range(nec)
    ]
    for s in range(4):
        for c in range(3):
            if with_r:
                base_r = r_re[s, c, 0].astype(fdt)
                base_i = r_im[s, c, 0].astype(fdt)
            else:
                base_r = jnp.zeros((z, vm.shape[0]), fdt)
                base_i = jnp.zeros((z, vm.shape[0]), fdt)
            # chunk g == 0 starts from the additive base; later chunks
            # accumulate onto the resident output plane (element-select:
            # the unselected read of uninitialised VMEM at g == 0 is inert)
            first = g == 0
            acc_r = jnp.where(first, base_r, o_re[s, c, 0])
            acc_i = jnp.where(first, base_i, o_im[s, c, 0])
            for e in range(nec):
                qr = q_re[e, s, c, 0].astype(fdt)
                qi = q_im[e, s, c, 0].astype(fdt)
                cr, ci = ce[e]
                acc_r += qr * cr - qi * ci
                acc_i += qr * ci + qi * cr
            o_re[s, c, 0] = acc_r
            o_im[s, c, 0] = acc_i


def prolong_pallas(
    q_field: cplx.CF,
    block_map: BlockMap,
    xc: cplx.CF,
    r: cplx.CF | None = None,
    damping: float = 1.0,
):
    """out = (r if given else 0) + damping * P xc on TPU-layout CF fields.

    Fusing the additive base makes the whole deflation apply
    M r = r + damping * P C^-1 P^H r two kernel launches + the coarse
    solve."""
    t, z, y, xx = block_map.mesh.spacetime_dims
    bt, bz, by, bx = block_map.block_dims
    Bt, Bz = t // bt, z // bz
    Bs = (y // by) * (xx // bx)
    v = y * xx
    ne = q_field.shape[0]
    nb = block_map.n_blocks
    fdt = xc.dtype
    nec = _ne_chunk(ne, z, v, jnp.dtype(q_field.dtype).itemsize)
    G = ne // nec

    # flat b-major/e-minor coarse vector -> (Bt, ne, Bz, Bs), tiny
    c4_re = xc.re.reshape(Bt, Bz, Bs, ne).transpose(0, 3, 1, 2)
    c4_im = xc.im.reshape(Bt, Bz, Bs, ne).transpose(0, 3, 1, 2)

    qplane = _vspec((nec, 4, 3, 1, z, v), lambda i, g: (g, 0, 0, i, 0, 0))
    cspec = _vspec((1, nec, Bz, Bs), lambda i, g: (i // bt, g, 0, 0))
    rplane = _vspec((4, 3, 1, z, v), lambda i, g: (0, 0, i, 0, 0))
    vmspec = _vspec((v, Bs), lambda i, g: (0, 0))
    oplane = _vspec((4, 3, 1, z, v), lambda i, g: (0, 0, i, 0, 0))

    with_r = r is not None
    if not with_r:
        r = cplx.CF(
            jnp.zeros((4, 3, 1, z, v), fdt), jnp.zeros((4, 3, 1, z, v), fdt)
        )
        rplane = _vspec((4, 3, 1, z, v), lambda i, g: (0, 0, 0, 0, 0))
        r_re_arr, r_im_arr = r.re, r.im
    else:
        r_re_arr = r.re.reshape(4, 3, t, z, v)
        r_im_arr = r.im.reshape(4, 3, t, z, v)

    kernel = functools.partial(
        _prolong_kernel,
        bt=bt, bz=bz, nec=nec, damping=damping, with_r=with_r, fdt=fdt,
    )
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=(t, G),
        in_specs=[cspec, cspec, qplane, qplane, rplane, rplane, vmspec],
        out_specs=(oplane, oplane),
        out_shape=(
            jax.ShapeDtypeStruct((4, 3, t, z, v), fdt),
            jax.ShapeDtypeStruct((4, 3, t, z, v), fdt),
        ),
        interpret=_interpret(),
        **_compiler_kwargs(),
    )(
        c4_re, c4_im,
        q_field.re.reshape(ne, 4, 3, t, z, v),
        q_field.im.reshape(ne, 4, 3, t, z, v),
        r_re_arr, r_im_arr,
        jnp.asarray(_vmask(block_map), fdt),
    )
    return cplx.CF(o_re, o_im)
