"""Profiling utilities: annotations are safe no-ops without a trace, and
roofline counters compute the documented traffic model. (The reference has
no profiler; SURVEY.md §5 names tracing/metrics as an aux subsystem.)"""

import jax.numpy as jnp

from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.utils import (
    RunLogger,
    annotate,
    chip_bandwidth,
    dslash_roofline,
    gcr_iteration_roofline,
    roofline,
)


def test_annotate_noop_without_trace():
    with annotate("setup"):
        x = jnp.arange(4.0) * 2
    assert float(x.sum()) == 12.0


def test_roofline_counters():
    r = roofline("k", seconds=1e-3, bytes_moved=5e8, flops=1e9, nnz=2e9)
    assert r.gbytes_per_s == 500.0
    assert r.gflops_per_s == 1000.0
    assert r.gnnz_per_s == 2000.0
    assert 0 < r.vs_hbm_roofline
    d = r.asdict()
    assert d["kernel"] == "k" and d["gbytes_per_s"] == 500.0


def test_dslash_roofline_traffic_model():
    mesh = LatticeMesh((8, 8, 8, 8, 4, 3))
    v = 8**4
    r = dslash_roofline(mesh, seconds=1.0, field_itemsize=4, link_itemsize=4)
    # 36 link + 24 field complex elements/site, all f32 (8 bytes/complex)
    assert r.bytes_moved == v * (36 + 24) * 8
    assert r.nnz == 39 * 12 * v
    # bf16 links shrink only the link bytes
    r16 = dslash_roofline(mesh, seconds=1.0, link_itemsize=2)
    assert r16.bytes_moved == v * (36 * 4 + 24 * 8)


def test_gcr_iteration_roofline_scales_with_restart():
    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    r5 = gcr_iteration_roofline(mesh, 1.0, restart=5)
    r10 = gcr_iteration_roofline(mesh, 1.0, restart=10)
    assert r10.bytes_moved > r5.bytes_moved
    assert chip_bandwidth() > 0


def test_roofline_logs_through_runlogger(tmp_path):
    p = tmp_path / "run.jsonl"
    with RunLogger(path=str(p)) as log:
        r = roofline("k", 1e-3, 1e6)
        log.log("kernel_roofline", **r.asdict())
    import json

    rec = json.loads(p.read_text().strip())
    assert rec["event"] == "kernel_roofline" and rec["kernel"] == "k"
