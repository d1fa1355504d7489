"""Ingested-matrix SpMV on TPU: ELL/XLA gather vs block-stencil kernels.

The reference's ingested compute format is CSR with a serial row loop
(Operator.h:331-346). This harness measures, on the current device, every
device path this framework offers for an ingested Wilson--Dirac matrix
(the generated 8^4 system by default — same sparsity as the reference's
missing 8x8parsed.txt blob):

- ell_gather:     ELLOperator, XLA gather + reduce (x[cols] einsum)
- stencil_xla:    StencilBlockOperator, 9x roll + batched einsum
- stencil_pallas: fused single-pass Pallas kernel (f32 blocks)
- stencil_pallas_bf16: same, bf16 block storage (half the HBM traffic)

Prints JSON lines {variant, us_per_apply, gnnz_per_s, vs_min_traffic,
vs_block_stream, vs_vpu}; three bounds per variant:

- ``vs_min_traffic``: the true-nnz minimal-traffic roofline (vals+cols+
  x+y once at the variant's value precision) — the honest SOL for ANY
  ingested-format SpMV. The block-stencil format cannot reach it: dense
  12x12 blocks store 144/39 = 3.7x the true nnz (the price of removing
  the index stream and the serial row loop, Operator.h:331-346).
- ``vs_block_stream``: streaming the variant's OWN block tensor + x + y
  once at the measured multi-window DMA ceiling — the format-specific
  memory bound the kernel can actually approach.
- ``vs_vpu``: the compute ceiling — the kernel's complex MACs are VPU
  work (ne=12 blocks never touch the MXU: a 12x12 systolic matmul wastes
  99% of the 128x128 array), 8 real ops per stored block element on
  (16, r)-shaped vregs (ne=12 pads to 16 sublanes). Whichever of
  vs_block_stream / vs_vpu is larger names the binding constraint at
  that precision: f32 blocks are DMA-bound, bf16 blocks flip to
  VPU-bound (halving the bytes doubles arithmetic intensity).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lattice", type=int, nargs=4, default=[8, 8, 8, 8])
    ap.add_argument("--platform")
    ap.add_argument("--matrix", help="ingest a parsed.txt instead of generating")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.mesh import LatticeMesh
    from mgpgcr_tpu.ops.blockstencil import StencilBlockOperator

    dims = tuple(args.lattice)
    if args.matrix:
        from mgpgcr_tpu.io.parsed_txt import read_parsed_txt

        csr = read_parsed_txt(args.matrix)
    else:
        from mgpgcr_tpu.ops.wilson import materialize_csr, random_links_np

        mesh = LatticeMesh((*dims, 4, 3))
        csr = materialize_csr(random_links_np(0, mesh), mesh)
    n = csr.shape[0]
    nnz = csr.nnz
    print(f"# matrix {n}x{n}, nnz={nnz}", file=sys.stderr)

    rdt = jnp.float32
    # cf=True: re/im split host-side — a complex jnp.asarray would enqueue
    # an unimplemented complex HBM transfer that poisons every later sync
    ell = csr.to_ell(dtype=rdt, cf=True)
    st = StencilBlockOperator.from_csr(csr, dims, 12, cf=True, dtype=rdt)
    assert st is not None, "matrix is not a 12-blocked stencil on dims"
    on_tpu = jax.devices()[0].platform == "tpu"
    backend = "pallas" if on_tpu else "pallas_interpret"
    # ell_gather last: on some backends (this tunneled chip) XLA's gather
    # is UNIMPLEMENTED and poisons the device afterwards
    variants = {
        "stencil_xla": st,
        "stencil_pallas": st.with_backend(backend),
        "stencil_pallas_bf16": st.with_backend(backend).with_block_dtype(
            jnp.bfloat16
        ),
        "ell_gather": ell,
    }

    x = cplx.random(jax.random.PRNGKey(1), (n,), rdt)

    # minimal ingested-format traffic: vals (8B) + cols (4B) per nnz,
    # x + y once (8B per element); measured v5e DMA ceiling ~475 GB/s
    bw = 8.19e11 if on_tpu else 5e10
    min_bytes = nnz * 12 + 2 * n * 8
    sol_apps = bw / min_bytes

    def timeit(op):
        apply_n = jax.jit(
            lambda o, v: jax.lax.fori_loop(
                0, 50, lambda _, w: cplx.scale_real(o.apply(w), 0.05), v
            )
        )
        out = apply_n(op, x)
        float(jnp.sum(out.re))
        reps = 5
        t0 = time.perf_counter()
        out = x
        for _ in range(reps):
            out = apply_n(op, out)
        float(jnp.sum(out.re))
        return (time.perf_counter() - t0) / (50 * reps)

    for name, op in variants.items():
        try:
            dt = timeit(op)
        except Exception as e:  # noqa: BLE001
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            continue
        print(
            json.dumps(
                {
                    "variant": name,
                    "us_per_apply": round(dt * 1e6, 1),
                    "gnnz_per_s": round(nnz / dt / 1e9, 3),
                    "vs_min_traffic": round(1.0 / (dt * sol_apps), 4),
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
