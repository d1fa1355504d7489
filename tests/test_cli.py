"""CLI / config / observability subsystems."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.environ.get(
    "MGPGCR_REFERENCE_MATRIX",
    "/root/reference/data/sample_matrix/4x4parsed.txt",
)


def _run(args, timeout=300):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "mgpgcr_tpu.cli", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )


def test_info():
    r = _run(["info", "--platform", "cpu"])
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["backend"] == "cpu"


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture unavailable")
def test_solve_fixture_with_trace_and_log(tmp_path):
    trace = tmp_path / "trace.npz"
    log = tmp_path / "run.jsonl"
    r = _run(
        [
            "solve", "--platform", "cpu",
            "--matrix", FIXTURE,
            "--k", "0.15", "--tol", "1e-9", "--max-iter", "1000",
            "--restart", "5",
            "--trace", str(trace), "--log", str(log),
        ]
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["converged"] and out["indep_relres"] < 2e-9

    from mgpgcr_tpu.utils.trace import load_residual_trace

    hist, meta = load_residual_trace(str(trace))
    assert meta["k"] == 0.15
    assert len(hist) == out["iters"] + 1
    assert hist[-1] <= 1e-9 * 1.01

    events = [json.loads(l) for l in log.read_text().splitlines()]
    names = [e["event"] for e in events]
    assert "config" in names and "result" in names and "timer" in names


def test_solve_synthetic_logs_roofline(tmp_path):
    """Roofline counters are archived as RunLogger events for synthetic
    lattice solves (round-1/2 observability obligation: profiling wired
    into the production driver, not just the library)."""
    log = tmp_path / "run.jsonl"
    r = _run(
        [
            "solve", "--platform", "cpu",
            "--lattice", "2", "2", "2", "2",
            "--k", "0.05", "--dtype", "complex128",
            "--tol", "1e-8", "--max-iter", "200", "--restart", "5",
            "--log", str(log),
        ]
    )
    assert r.returncode == 0, r.stderr
    events = [json.loads(l) for l in log.read_text().splitlines()]
    rl = [e for e in events if e["event"] == "roofline"]
    kernels = {e["kernel"] for e in rl}
    assert "wilson_dslash" in kernels
    # gcr_iteration_algebra is emitted only when the per-iteration
    # estimate is positive (2^4 on CPU is dispatch-bound, so a warm solve
    # iteration can beat one cold apply and the estimate is skipped)
    for e in rl:
        assert e["bytes"] > 0 and e["seconds"] > 0
        assert e["vs_hbm_roofline"] >= 0


def test_solve_config_file(tmp_path):
    cfg = {
        "problem": {"lattice": [2, 2, 2, 2], "k": 0.05, "dtype": "complex128"},
        "gcr": {"tol": 1e-8, "max_iter": 200, "restart": 5},
    }
    p = tmp_path / "run.json"
    p.write_text(json.dumps(cfg))
    r = _run(["solve", "--platform", "cpu", "--config", str(p)])
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["converged"]


def test_parse_roundtrip(tmp_path):
    mtx = tmp_path / "m.mtx"
    mtx.write_text(
        "%%MatrixMarket matrix coordinate complex general\n"
        "2 2 2\n"
        "1 1 1.0 0.5\n"
        "2 2 -2.0 0.0\n"
    )
    out = tmp_path / "parsed.txt"
    r = _run(["parse", str(mtx), str(out)])
    assert r.returncode == 0, r.stderr
    from mgpgcr_tpu.io import read_parsed_txt

    m = read_parsed_txt(out)
    assert m.shape == (2, 2) and m.nnz == 2
    np.testing.assert_allclose(m.data, [1.0 + 0.5j, -2.0 + 0j])


@pytest.mark.slow
def test_solve_mg_cf_lattice():
    """--mg with the TPU representation (cf32 lattice problem): the MG setup
    must use the TPU field layout (advisor finding: it previously drew a
    flat complex b0 and crashed against the TpuWilsonDirac operator)."""
    r = _run(
        [
            "solve", "--platform", "cpu",
            "--lattice", "4", "4", "4", "4",
            "--dtype", "cf32", "--k", "0.10",
            "--tol", "1e-5", "--max-iter", "300", "--restart", "8",
            "--mg", "--block", "2", "--nullvecs", "2",
        ],
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["converged"] and out["indep_relres"] < 1e-4


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture unavailable")
@pytest.mark.slow
def test_solve_mg_cf_matrix():
    """--mg with cf64 flat fields on the ingested fixture matrix."""
    r = _run(
        [
            "solve", "--platform", "cpu",
            "--matrix", FIXTURE,
            "--dtype", "cf64", "--k", "0.10",
            "--tol", "1e-6", "--max-iter", "300", "--restart", "8",
            "--mg", "--block", "2", "--nullvecs", "2",
        ],
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["converged"] and out["indep_relres"] < 1e-5


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture unavailable")
@pytest.mark.slow
def test_solve_matrix_detection_routes_to_stencil():
    """cf dtypes factorise the ingested fixture into links + projectors
    (ops/ingest.py) and solve on the streaming stencil kernels; the
    independent residual proves the routed operator IS the ingested
    matrix (gamma_t-conjugated basis and all)."""
    args = [
        "solve", "--platform", "cpu",
        "--matrix", FIXTURE,
        "--dtype", "cf64", "--k", "0.12",
        "--tol", "1e-8", "--max-iter", "300", "--restart", "5",
    ]
    r = _run(args, timeout=600)
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out.get("detected_wilson") is True
    assert out["converged"] and out["indep_relres"] < 1e-7

    r2 = _run(args + ["--no-detect"], timeout=600)
    assert r2.returncode == 0, r2.stderr
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert "detected_wilson" not in out2
    assert out2["converged"]
    # same spectrum => same iteration count (the routed operator is a
    # unitary conjugation of the ingested one; rhs seeds differ in layout
    # so allow a couple of iterations of slack)
    assert abs(out["iters"] - out2["iters"]) <= 3


def test_config_roundtrip(tmp_path):
    from mgpgcr_tpu.config import (
        RunConfig,
        config_from_dict,
        config_to_dict,
        load_config,
        save_config,
    )
    from mgpgcr_tpu.solvers.params import MGParams

    cfg = RunConfig(mg=MGParams(block=2, n_nullvecs=3))
    d = config_to_dict(cfg)
    cfg2 = config_from_dict(json.loads(json.dumps(d)))
    assert cfg2.mg.block == 2 and cfg2.mg.n_nullvecs == 3
    assert cfg2.mg.coarse_gcr == cfg.mg.coarse_gcr
    p = tmp_path / "c.json"
    save_config(str(p), cfg)
    cfg3 = load_config(str(p))
    assert cfg3 == cfg2


def test_toml_config(tmp_path):
    from mgpgcr_tpu.config import load_config

    p = tmp_path / "c.toml"
    p.write_text(
        '[problem]\nlattice = [4, 4, 4, 4]\nk = 0.12\n\n'
        '[gcr]\ntol = 1e-7\nmax_iter = 50\nrestart = 4\n'
    )
    cfg = load_config(str(p))
    assert cfg.problem.lattice == (4, 4, 4, 4)
    assert cfg.gcr.tol == 1e-7 and cfg.gcr.restart == 4


def test_generate_fixture(tmp_path):
    """Synthetic fixture generation: the replacement for the reference's
    missing 8x8parsed.txt blob (4^4-sized for test speed; extents of 2
    would merge the ±mu neighbours and change the nnz count)."""
    out = tmp_path / "gen.txt"
    r = _run(["generate", str(out), "--lattice", "4", "4", "4", "4", "--seed", "3"])
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout.strip().splitlines()[-1])
    n = 4**4 * 12
    assert info["rows"] == n and info["nnz"] == n * 39

    from mgpgcr_tpu.io import read_parsed_txt

    m = read_parsed_txt(out)
    assert m.shape == (n, n) and m.nnz == n * 39


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture unavailable")
def test_solve_mg_reference_config_of_record():
    """The reference's MG config of record (main.cpp:840-858: smoother off,
    coarse 50 it / tol 1e-2 / restart 10, block 4, 10 nullvecs) expressed
    entirely as command-line flags."""
    r = _run(
        [
            "solve", "--platform", "cpu",
            "--matrix", FIXTURE,
            "--k", "0.205", "--tol", "1e-8", "--max-iter", "600",
            "--restart", "10",
            "--mg", "--block", "4", "--nullvecs", "4",
            "--no-smoother",
            "--coarse-tol", "1e-2", "--coarse-max-iter", "50",
            "--coarse-restart", "10",
            "--coarse-format", "dense", "--assembly", "columns",
            "--n-level", "2",
        ],
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["converged"] and out["indep_relres"] < 1e-7


@pytest.mark.slow
def test_solve_eo_antiperiodic_solves_requested_system():
    """--eo + --antiperiodic: the Schur half-system must be built from
    links with the temporal boundary sign folded in, not the pristine
    periodic links (advisor r4 high finding: the combination previously
    reported converged while the reconstructed x had relres ~0.27 against
    the anti-periodic operator the user asked for). indep_relres is
    computed by the CLI against the anti-periodic `a` — small means the
    right system was solved."""
    r = _run(
        [
            "solve", "--platform", "cpu",
            "--lattice", "4", "4", "2", "2",
            "--dtype", "cf32", "--k", "0.08",
            "--tol", "1e-5", "--max-iter", "300", "--restart", "8",
            "--eo", "--antiperiodic",
        ],
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["eo"] and out["converged"]
    assert out["indep_relres"] < 1e-4


@pytest.mark.slow
def test_solve_eo_from_config_file_disables_compression(tmp_path):
    """eo: true in a config file (not argv) must disable two-row link
    compression exactly as --eo does (advisor r4 low finding: the merged
    flag was read after the compress decision, so config-file eo died at
    solve time with '--eo needs uncompressed (3-row) links')."""
    cfgf = tmp_path / "eo.json"
    cfgf.write_text(json.dumps({
        "problem": {
            "lattice": [4, 4, 2, 2], "dtype": "cf32", "k": 0.08,
            "compress": True,
        },
        "gcr": {"tol": 1e-5, "max_iter": 300, "restart": 8,
                "truncation": 0},
        "eo": True,
    }))
    r = _run(
        ["solve", "--platform", "cpu", "--config", str(cfgf)],
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["eo"] and out["converged"] and out["indep_relres"] < 1e-4


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture unavailable")
@pytest.mark.slow
def test_solve_eo_ingested_fixture():
    """--eo on the INGESTED reference matrix: the Wilson detection's
    spin-conjugated operator routes through the Schur solve (rhs rotated
    into the native basis, x rotated back) — previously rejected
    (r4 roadmap: ingested-matrix route for --eo). indep_relres is checked
    against the ingested-basis operator."""
    r = _run(
        [
            "solve", "--platform", "cpu",
            "--matrix", FIXTURE,
            "--dtype", "cf64", "--k", "0.15",
            "--tol", "1e-8", "--max-iter", "400", "--restart", "8",
            "--eo",
        ],
        timeout=900,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["eo"] and out["detected_wilson"] and out["converged"]
    assert out["indep_relres"] < 1e-7
