from mgpgcr_tpu.io.parsed_txt import read_parsed_txt, write_parsed_txt
from mgpgcr_tpu.io.matrix_market import read_matrix_market
from mgpgcr_tpu.io.npz_cache import load_ell_npz, save_ell_npz

__all__ = [
    "read_parsed_txt",
    "write_parsed_txt",
    "read_matrix_market",
    "load_ell_npz",
    "save_ell_npz",
]
