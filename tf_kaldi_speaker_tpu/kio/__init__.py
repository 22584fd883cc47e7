"""Kaldi ark/scp I/O — the interchange contract with Kaldi-prepared data."""

from .ark import (
    compress_matrix,
    read_ali_ark,
    read_mat,
    read_mat_ark,
    read_mat_rspec,
    read_mat_scp,
    read_post,
    read_post_ark,
    read_vec_flt,
    read_vec_flt_ark,
    read_vec_flt_scp,
    read_vec_int,
    read_vec_int_ark,
    write_mat,
    write_post,
    write_vec_flt,
    write_vec_int,
)
from .fst import StdFst, build_fst, read_fst, read_words_txt, write_fst
from .native_decode import native_available
from .reader import FeatureReader, FeatureReaderV2
from .rspecifier import open_or_fd, popen, read_key, SubprocessFailed

__all__ = [
    "FeatureReader",
    "FeatureReaderV2",
    "SubprocessFailed",
    "StdFst",
    "build_fst",
    "compress_matrix",
    "native_available",
    "read_fst",
    "read_words_txt",
    "write_fst",
    "open_or_fd",
    "popen",
    "read_ali_ark",
    "read_key",
    "read_mat",
    "read_mat_ark",
    "read_mat_rspec",
    "read_mat_scp",
    "read_post",
    "read_post_ark",
    "read_vec_flt",
    "read_vec_flt_ark",
    "read_vec_flt_scp",
    "read_vec_int",
    "read_vec_int_ark",
    "write_mat",
    "write_post",
    "write_vec_flt",
    "write_vec_int",
]
