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
- detected_dslash: ops/ingest.py factorises the matrix back into gauge
  links + spin projectors (verified element-by-element) and routes the
  apply through the half-spinor streaming Dslash — the format-blind
  SpMV ceiling does not apply once the structure is recovered, because
  the kernel moves 18 link values per hop instead of a 144-value block
  (timed as the full A = I - kD apply, i.e. including the axpy the
  other variants don't even do)

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


def measure_vpu_rate() -> float:
    """Measured f32 VPU mul+add rate (real ops/s): one fused elementwise
    kernel running a 128-deep multiply-add chain (2 ops per element per
    step) over a 4M-element array — 256 ops per byte-pair of HBM traffic,
    so the fusion is compute-bound by >3x on any TPU generation. This is
    the practical ceiling for the SpMV kernel's op mix (the VPU does the
    complex MACs; 12x12 blocks never touch the MXU)."""
    import jax
    import jax.numpy as jnp

    elems = 4 * 1024 * 1024
    depth = 128
    inner = 50
    xx = jnp.arange(elems, dtype=jnp.float32) * 1e-7
    a = jnp.float32(0.999)
    b = jnp.float32(1e-6)

    @jax.jit
    def chain(v, a, b):
        # 50 fused 128-deep mul-add chains in ONE dispatch — per-call
        # tunnel latency amortised the same way ``timeit`` does below
        def body(_, w):
            for _ in range(depth):
                w = w * a + b
            return w

        return jax.lax.fori_loop(0, inner, body, v)

    out = chain(xx, a, b)
    float(jnp.sum(out))  # true sync through the tunnel
    reps = 5
    t0 = time.perf_counter()
    v = xx
    for _ in range(reps):
        v = chain(v, a, b)
    float(jnp.sum(v))
    dt = (time.perf_counter() - t0) / (reps * inner)
    return elems * depth * 2 / dt


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

    bw = 8.19e11 if on_tpu else 5e10
    vpu_rate = measure_vpu_rate()
    print(f"# measured VPU f32 rate: {vpu_rate/1e12:.2f} Top/s", file=sys.stderr)

    nb = st.n_blocks
    k_slots, ne = st.blocks.shape[1], st.ne
    block_elems = nb * k_slots * ne * ne
    # kernel compute: per stored block element, 4 real mul + 4 real add
    # (complex MAC), issued j-column-at-a-time on (ne, r) vregs that pad
    # ne=12 -> 16 sublanes (spmv.py kernel loop)
    ne_pad = -(-ne // 8) * 8
    vpu_ops = nb * k_slots * ne * ne_pad * 8

    def bounds(value_bytes: float) -> dict:
        # min_traffic: true-nnz vals at this precision + 4B cols + x,y once
        min_bytes = nnz * (value_bytes + 4) + 2 * n * 8
        # block_stream: this variant's own dense block tensor + x,y once
        stream_bytes = block_elems * value_bytes + 2 * n * 8
        return {
            "min_apps": bw / min_bytes,
            "stream_apps": bw / stream_bytes,
            "vpu_apps": vpu_rate / vpu_ops,
        }

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

    # detection-routed native path: factorise D and stream links instead
    # of blocks (structure verified, not presumed — ops/ingest.py)
    from mgpgcr_tpu.ops.ingest import wilson_operator_from_csr
    from mgpgcr_tpu.ops.wilson_tpu import field_to_tpu

    mesh_f = LatticeMesh((*dims, 4, 3))
    a_routed = wilson_operator_from_csr(
        csr, dims, 0.1, dtype=rdt,
        backend="pallas" if on_tpu else "tpu",
        tol=1e-5,
    )
    x_tpu = field_to_tpu(x, mesh_f) if a_routed is not None else None
    if a_routed is None:
        print("# detected_dslash: matrix did not factorise", file=sys.stderr)

    def timeit_routed():
        apply_n = jax.jit(
            lambda o, v: jax.lax.fori_loop(
                0, 50, lambda _, w: cplx.scale_real(o.apply(w), 0.05), v
            )
        )
        out = apply_n(a_routed, x_tpu)
        float(jnp.sum(out.re))
        reps = 5
        t0 = time.perf_counter()
        out = x_tpu
        for _ in range(reps):
            out = apply_n(a_routed, out)
        float(jnp.sum(out.re))
        return (time.perf_counter() - t0) / (50 * reps)

    if a_routed is not None:
        dt = timeit_routed()
        # the honest traffic floor for the ROUTED form: links once
        # (4 dirs * 9 values * 8B CF per site) + x + y once
        n_sites = nb
        link_bytes = 4 * 9 * 8 * n_sites + 2 * n * 8
        print(
            json.dumps(
                {
                    "variant": "detected_dslash",
                    "us_per_apply": round(dt * 1e6, 1),
                    "gnnz_per_s": round(nnz / dt / 1e9, 3),
                    "vs_min_traffic": round(
                        1.0 / (dt * bw / link_bytes), 4
                    ),
                }
            )
        )

    for name, op in variants.items():
        try:
            dt = timeit(op)
        except Exception as e:  # noqa: BLE001
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            continue
        # CF split re/im: 2 planes per value
        vb = 2 * (2 if "bf16" in name else 4)
        b = bounds(vb)
        binding = (
            "hbm" if b["stream_apps"] < b["vpu_apps"] else "vpu"
        )
        print(
            json.dumps(
                {
                    "variant": name,
                    "us_per_apply": round(dt * 1e6, 1),
                    "gnnz_per_s": round(nnz / dt / 1e9, 3),
                    "vs_min_traffic": round(1.0 / (dt * b["min_apps"]), 4),
                    "vs_block_stream": round(
                        1.0 / (dt * b["stream_apps"]), 4
                    ),
                    "vs_vpu": round(1.0 / (dt * b["vpu_apps"]), 4),
                    "binding": binding,
                    "vs_binding": round(
                        1.0 / (dt * min(b["stream_apps"], b["vpu_apps"])), 4
                    ),
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
