"""A/B probes localising the stencil-SpMV kernel's binding constraint.

Same methodology as the round-3 Dslash probes (docs/ROADMAP.md): run, in
one session against throttling drift,

- full:      the production kernel (ops/pallas/spmv.py)
- dma_only:  identical grid/window structure, compute replaced by a
             trivial reduction of the block slab (sum over K, ne_col) —
             measures the pure block-stream DMA floor
- vpu_only:  identical compute loop on a VMEM-resident slab (grid=1 over
             a small nb, scaled) — measures the pure vector-issue cost

Prints JSON lines; us are per apply at the probe's size.
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.mesh import LatticeMesh
    from mgpgcr_tpu.ops.blockstencil import StencilBlockOperator
    from mgpgcr_tpu.ops.pallas.spmv import _pick_tile, _strides
    from mgpgcr_tpu.ops.wilson import materialize_csr, random_links_np

    dims = (8, 8, 8, 8)
    ne = 12
    mesh = LatticeMesh((*dims, 4, 3))
    csr = materialize_csr(random_links_np(0, mesh), mesh)
    st = StencilBlockOperator.from_csr(csr, dims, ne, cf=True, dtype=jnp.float32)
    interp = jax.devices()[0].platform != "tpu"

    nb = st.n_blocks
    k = st.blocks.shape[1]
    r = _pick_tile(nb)
    pad = _strides(dims)[0]
    rpad = pad + 128
    n = nb * ne

    bt = cplx.transpose(st.blocks, (1, 3, 2, 0))  # (K, ne_col, ne_row, nb)
    x = cplx.random(jax.random.PRNGKey(1), (n,), jnp.float32)
    xt = cplx.transpose(x.reshape(nb, ne), (1, 0))
    reps_pad = -(-rpad // nb)
    right = cplx.concatenate([xt] * reps_pad, axis=1)[:, :rpad]
    xp = cplx.concatenate([xt[:, nb - pad:], xt, right], axis=1)

    bspec = pl.BlockSpec((k, ne, ne, r), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((ne, nb + pad + rpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((ne, r), lambda i: (0, i), memory_space=pltpu.VMEM)
    cp = {} if interp else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    }

    def timeit(fn):
        # fn: xp (CF padded field) -> out array. The carry feeds a
        # 0-valued scalar from out back into xp so every iteration
        # genuinely depends on the previous one (no LICM hoisting).
        def body(_, xpc):
            out = fn(xpc)
            z = out[0, 0] * jnp.float32(0.0)
            return jax.tree.map(lambda v: v + z, xpc)

        run = jax.jit(lambda xp0: lax.fori_loop(0, 50, body, xp0))
        out = run(xp)
        float(jnp.sum(out.re))
        t0 = time.perf_counter()
        out = run(xp)
        float(jnp.sum(out.re))
        return (time.perf_counter() - t0) / 50

    # --- full production kernel (bare: no relayouts, xp pre-padded) --------
    from mgpgcr_tpu.ops.pallas.spmv import _stencil_spmv_kernel

    full_call = pl.pallas_call(
        functools.partial(_stencil_spmv_kernel, dims=dims, r=r, pad=pad),
        grid=(nb // r,),
        in_specs=[bspec, bspec, xspec, xspec], out_specs=(ospec, ospec),
        out_shape=(jax.ShapeDtypeStruct((ne, nb), jnp.float32),) * 2,
        interpret=interp, **cp)

    def full(xpc):
        return full_call(bt.re, bt.im, xpc.re, xpc.im)[0]

    # --- dma_only: same windows, trivial compute ---------------------------
    def dma_kernel(b_re, b_im, xp_re, xp_im, out_re, out_im):
        acc_r = jnp.zeros((ne, r), jnp.float32)
        acc_i = jnp.zeros((ne, r), jnp.float32)
        for s in range(k):
            acc_r = acc_r + b_re[s, 0] + b_re[s, ne // 2]
            acc_i = acc_i + b_im[s, 0] + b_im[s, ne // 2]
        out_re[...] = acc_r + xp_re[:, :r]
        out_im[...] = acc_i + xp_im[:, :r]

    dma_call = pl.pallas_call(
        dma_kernel, grid=(nb // r,),
        in_specs=[bspec, bspec, xspec, xspec], out_specs=(ospec, ospec),
        out_shape=(jax.ShapeDtypeStruct((ne, nb), jnp.float32),) * 2,
        interpret=interp, **cp)

    def dma_only(xpc):
        return dma_call(bt.re, bt.im, xpc.re, xpc.im)[0]

    # --- vpu_only: the full compute loop, slab resident (grid=1) -----------
    def vpu_kernel(b_re, b_im, xp_re, xp_im, out_re, out_im, *, nsteps):
        strides = _strides(dims)
        nd = len(dims)

        def step(i, acc):
            yr, yi = acc
            a = i * 0  # windows fixed; compute cost identical per step
            lane = lax.broadcasted_iota(jnp.int32, (1, r), 1) + a

            def window(off):
                g0 = off + pad
                q, rem = (g0 // 128) * 128, g0 % 128
                if rem == 0:
                    sl = pl.ds(a + q, r)
                    return cplx.CF(xp_re[:, sl], xp_im[:, sl])
                sl = pl.ds(a + q, r + 128)
                return cplx.CF(xp_re[:, sl][:, rem:rem + r],
                               xp_im[:, sl][:, rem:rem + r])

            gathered = [window(0)]
            for d in range(nd):
                m, ext = strides[d], dims[d]
                if d == 0:
                    gathered.append(window(+m))
                    gathered.append(window(-m))
                    continue
                coord = (lane // m) % ext
                g_p = cplx.where(coord == ext - 1, window(m - ext * m),
                                 window(+m))
                g_m = cplx.where(coord == 0, window(ext * m - m), window(-m))
                gathered.append(g_p)
                gathered.append(g_m)

            for s, g in enumerate(gathered):
                for j in range(ne):
                    br = b_re[s, j]
                    bi = b_im[s, j]
                    gr = g.re[j:j + 1, :]
                    gi = g.im[j:j + 1, :]
                    yr = yr + br * gr - bi * gi
                    yi = yi + br * gi + bi * gr
            return yr, yi

        yr, yi = lax.fori_loop(
            0, nsteps, step,
            (jnp.zeros((ne, r), jnp.float32), jnp.zeros((ne, r), jnp.float32)))
        out_re[...] = yr
        out_im[...] = yi

    nsteps = nb // r
    vpu_call = pl.pallas_call(
        functools.partial(vpu_kernel, nsteps=nsteps), grid=(1,),
        in_specs=[bspec, bspec, xspec, xspec], out_specs=(ospec, ospec),
        out_shape=(jax.ShapeDtypeStruct((ne, r), jnp.float32),) * 2,
        interpret=interp, **cp)

    def vpu_only(xpc):
        return vpu_call(bt.re, bt.im, xpc.re, xpc.im)[0]

    # --- production path (stencil_spmv incl. per-apply field relayouts),
    # timed exactly like benchmarks/ingested_spmv.py ------------------------
    def timeit_production():
        apply_n = jax.jit(lambda o, v: lax.fori_loop(
            0, 50, lambda _, w: cplx.scale_real(o.apply(w), 0.05), v))
        op = st.with_backend("pallas" if not interp else "pallas_interpret")
        out = apply_n(op, x)
        float(jnp.sum(out.re))
        t0 = time.perf_counter()
        out = apply_n(op, x)
        float(jnp.sum(out.re))
        return (time.perf_counter() - t0) / 50

    block_mb = k * ne * ne * nb * 4 * 2 / 1e6
    print(f"# nb={nb} r={r} grid={nb // r} block tensor {block_mb:.1f} MB "
          f"(+sublane pad 4/3)", file=sys.stderr)
    # two interleaved rounds so throttling drift shows up as round-to-round
    # disagreement instead of silently biasing one probe
    for rnd in range(2):
        dt = timeit_production()
        print(json.dumps({"probe": "production", "round": rnd,
                          "us": round(dt * 1e6, 1)}))
        for name, fn in [("full", full), ("dma_only", dma_only),
                         ("vpu_only", vpu_only)]:
            dt = timeit(fn)
            print(json.dumps({"probe": name, "round": rnd,
                              "us": round(dt * 1e6, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
