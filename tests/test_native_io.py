"""Native C++ ingestion layer (native/parse.cpp via ctypes): parity with
the numpy fallback parsers on every supported format.

The library is built on demand (``make -C native``); tests skip when no
C++ toolchain is present.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.environ.get(
    "MGPGCR_REFERENCE_MATRIX",
    "/root/reference/data/sample_matrix/4x4parsed.txt",
)


@pytest.fixture(scope="module")
def native():
    from mgpgcr_tpu.io import native_parse

    if not native_parse.available():
        if shutil.which("g++") is None and shutil.which("make") is None:
            pytest.skip("no native toolchain")
        subprocess.run(
            ["make", "-C", os.path.join(REPO, "native")], check=True, capture_output=True
        )
        native_parse._TRIED = False
        native_parse._LIB = None
    if not native_parse.available():
        pytest.skip("native library unavailable")
    return native_parse


def _python_parse(path):
    """Force the pure-numpy fallback."""
    from mgpgcr_tpu.io import native_parse, parsed_txt

    saved = (native_parse._LIB, native_parse._TRIED)
    native_parse._LIB, native_parse._TRIED = None, True
    try:
        return parsed_txt.read_parsed_txt(path)
    finally:
        native_parse._LIB, native_parse._TRIED = saved


def test_parsed_txt_parity(native):
    if not os.path.exists(FIXTURE):
        pytest.skip("reference fixture unavailable")
    got = native.read_parsed_txt_native(FIXTURE)
    assert got is not None
    indptr, indices, data, shape = got
    ref = _python_parse(FIXTURE)
    assert shape == ref.shape
    np.testing.assert_array_equal(indptr, ref.indptr)
    np.testing.assert_array_equal(indices, ref.indices)
    np.testing.assert_array_equal(data, ref.data)


def test_parsed_txt_roundtrip(native, tmp_path):
    from mgpgcr_tpu.ops.csr import CSRMatrix
    from mgpgcr_tpu.io.parsed_txt import read_parsed_txt, write_parsed_txt

    rng = np.random.default_rng(0)
    dense = np.zeros((6, 6), dtype=np.complex128)
    idx = rng.choice(36, size=12, replace=False)
    dense.flat[idx] = rng.standard_normal(12) + 1j * rng.standard_normal(12)
    m = CSRMatrix.from_dense(dense)
    p = tmp_path / "cache.txt"
    write_parsed_txt(p, m)  # native writer when available
    m2 = read_parsed_txt(p)  # native reader
    np.testing.assert_array_equal(m.indptr, m2.indptr)
    np.testing.assert_array_equal(m.indices, m2.indices)
    np.testing.assert_allclose(m.data, m2.data, rtol=0, atol=0)


def test_mtx_native_parity(native, tmp_path):
    from mgpgcr_tpu.io.matrix_market import read_matrix_market
    from mgpgcr_tpu.io import native_parse

    p = tmp_path / "m.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate complex general\n"
        "% comment line\n"
        "3 3 4\n"
        "1 1 1.5 -2.5\n"
        "2 3 0.25 0.75\n"
        "3 1 -1.0 0.0\n"
        "3 3 4.0 1.0\n"
    )
    got = read_matrix_market(p)  # native fast path
    saved = (native_parse._LIB, native_parse._TRIED)
    native_parse._LIB, native_parse._TRIED = None, True
    try:
        ref = read_matrix_market(p)  # numpy fallback
    finally:
        native_parse._LIB, native_parse._TRIED = saved
    np.testing.assert_array_equal(np.asarray(got.rows), np.asarray(ref.rows))
    np.testing.assert_array_equal(np.asarray(got.cols), np.asarray(ref.cols))
    np.testing.assert_array_equal(np.asarray(got.vals), np.asarray(ref.vals))
    assert got.shape == ref.shape


@pytest.mark.parametrize(
    "kind", ["general", "symmetric", "skew-symmetric", "hermitian"]
)
def test_mtx_symmetry_kinds(native, tmp_path, kind):
    """Mirroring semantics per MatrixMarket symmetry kind, native and
    numpy-fallback paths agreeing with a dense oracle. In particular
    skew-symmetric must negate the mirrored values (a substring match on
    'symmetric' silently mis-mirrors it)."""
    from mgpgcr_tpu.io.matrix_market import read_matrix_market
    from mgpgcr_tpu.io import native_parse

    entries = [(1, 1, 0.0, 0.0), (2, 1, 1.5, -0.5), (3, 2, -2.0, 1.0)]
    if kind in ("skew-symmetric",):
        entries = entries[1:]  # no diagonal for skew
    p = tmp_path / "m.mtx"
    p.write_text(
        f"%%MatrixMarket matrix coordinate complex {kind}\n"
        f"3 3 {len(entries)}\n"
        + "".join(f"{r} {c} {re} {im}\n" for r, c, re, im in entries)
    )

    dense = np.zeros((3, 3), dtype=np.complex128)
    for r, c, re, im in entries:
        dense[r - 1, c - 1] = re + 1j * im
        if r != c:
            if kind == "symmetric":
                dense[c - 1, r - 1] = re + 1j * im
            elif kind == "skew-symmetric":
                dense[c - 1, r - 1] = -(re + 1j * im)
            elif kind == "hermitian":
                dense[c - 1, r - 1] = re - 1j * im

    for use_native in (True, False):
        saved = (native_parse._LIB, native_parse._TRIED)
        if not use_native:
            native_parse._LIB, native_parse._TRIED = None, True
        try:
            m = read_matrix_market(p)
        finally:
            native_parse._LIB, native_parse._TRIED = saved
        got = np.zeros((3, 3), dtype=np.complex128)
        got[np.asarray(m.rows), np.asarray(m.cols)] = np.asarray(m.vals)
        np.testing.assert_allclose(got, dense, atol=0, err_msg=f"{kind} native={use_native}")
