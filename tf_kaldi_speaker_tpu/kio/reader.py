"""Persistent-descriptor feature readers over Kaldi data directories.

Behavioral spec: reference dataset/kaldi_io.py:40-338 (FeatureReader,
FeatureReaderV2). Keeps one open fd per ark file, supports random-chunk
segment reads via utt2num_frames, and (V2) joint feature+VAD+alignment reads
with left/right context expansion by edge-frame tiling.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Optional, Tuple

import numpy as np

from . import ark
from .native_decode import read_submat_fast


class FeatureReader:
    """Random-access reader for the features of one Kaldi data directory."""

    def __init__(self, data: str):
        self.fd: Dict[str, object] = {}
        self.data = data
        self.utt2num_frames: Dict[str, int] = {}
        path = os.path.join(data, "utt2num_frames")
        if not os.path.exists(path):
            raise FileNotFoundError("Expect utt2num_frames in %s" % data)
        with open(path) as f:
            for line in f:
                utt, length = line.strip().split(" ")
                self.utt2num_frames[utt] = int(length)
        self.dim = self.get_dim()

    def get_dim(self) -> int:
        with open(os.path.join(self.data, "feats.scp")) as f:
            mat, _ = self.read(f.readline().strip())
        return mat.shape[1]

    def close(self) -> None:
        for fd in self.fd.values():
            fd.close()
        self.fd.clear()

    def _fd_at(self, filename: str, offset: int):
        fd = self.fd.get(filename)
        if fd is None:
            fd = open(filename, "rb")
            self.fd[filename] = fd
        fd.seek(offset)
        return fd

    def read(
        self,
        segment: str,
        length: Optional[int] = None,
        shuffle: bool = False,
        start: Optional[int] = None,
        rng: Optional[random.Random] = None,
    ) -> Tuple[np.ndarray, Optional[int]]:
        """Read a full matrix, then (optionally) slice a chunk from it.

        ``segment`` is "utt filename:offset" as stored in feats.scp.
        """
        utt, rxfile = segment.split(" ")
        filename, offset = rxfile.rsplit(":", 1)
        fd = self._fd_at(filename, int(offset))
        if fd.read(2).decode() != "\0B":
            raise IOError("Cannot read features from %s" % segment)
        mat = ark._read_mat_binary(fd)
        if length is not None:
            if start is None:
                n = mat.shape[0]
                length = min(length, n)
                r = rng if rng is not None else random
                start = r.randint(0, n - length) if shuffle else 0
            mat = mat[start : start + length, :]
        return mat, start

    def read_segment(
        self,
        segment: str,
        length: Optional[int] = None,
        shuffle: bool = False,
        start: Optional[int] = None,
        rng: Optional[random.Random] = None,
    ) -> Tuple[np.ndarray, Optional[int]]:
        """Read only the requested row range from disk (partial ark read)."""
        utt, rxfile = segment.split(" ")
        filename, offset = rxfile.rsplit(":", 1)
        if length is not None and start is None:
            n = self.utt2num_frames[utt]
            length = min(length, n)
            r = rng if rng is not None else random
            start = r.randint(0, n - length) if shuffle else 0
        if length is not None:
            fast = read_submat_fast(filename, int(offset), start, length)
            if fast is not None:
                return fast, start
        fd = self._fd_at(filename, int(offset))
        if fd.read(2).decode() != "\0B":
            raise IOError("Cannot read features from %s" % segment)
        if length is None:
            return ark._read_mat_binary(fd), start
        return ark._read_submat_binary(fd, start, length), start

    def read_segment_codes(
        self,
        segment: str,
        length: Optional[int] = None,
        shuffle: bool = False,
        start: Optional[int] = None,
        rng: Optional[random.Random] = None,
    ):
        """Raw compressed codes for decode-on-device: (codes [L, D] uint8,
        headers [4, D] float32, start). Requires a compressed ('CM ') ark."""
        utt, rxfile = segment.split(" ")
        filename, offset = rxfile.rsplit(":", 1)
        if length is not None and start is None:
            n = self.utt2num_frames[utt]
            length = min(length, n)
            r = rng if rng is not None else random
            start = r.randint(0, n - length) if shuffle else 0
        fd = self._fd_at(filename, int(offset))
        if fd.read(2).decode() != "\0B":
            raise IOError("Cannot read features from %s" % segment)
        fmt = fd.read(3).decode()
        codes, headers = ark._read_compressed_codes(fd, fmt, start, length)
        return codes, headers, start


class FeatureReaderV2:
    """Joint feature + VAD + alignment segment reader (multitask training).

    Features are expanded by ``left_context``/``right_context`` frames via
    edge tiling; VAD and alignment are returned for the un-expanded range
    (parity with reference kaldi_io.py:152-338).
    """

    def __init__(self, data_dir: str, ali_dir: str, left_context: int, right_context: int):
        self.fd: Dict[str, object] = {}
        self.vad_fd: Dict[str, object] = {}
        self.ali_fd: Dict[str, object] = {}
        self.left_context = left_context
        self.right_context = right_context
        self.data_dir = data_dir
        self.ali_dir = ali_dir

        self.utt2num_frames = _load_utt2int(os.path.join(data_dir, "utt2num_frames"))
        self.utt2feats_offset = _load_scp_offsets(os.path.join(data_dir, "feats.scp"))
        self.utt2vad_offset = _load_scp_offsets(os.path.join(data_dir, "vad.scp"))
        self.utt2ali_offset = _load_scp_offsets(os.path.join(ali_dir, "pdf.scp"))
        self.dim = self.get_dim()

    def get_dim(self) -> int:
        utt = next(iter(self.utt2feats_offset))
        mat, _, _, _ = self.read_segment(utt)
        return mat.shape[1]

    def close(self) -> None:
        for d in (self.fd, self.vad_fd, self.ali_fd):
            for fd in d.values():
                fd.close()
            d.clear()

    def _fd_at(self, cache: Dict[str, object], filename: str, offset: int):
        fd = cache.get(filename)
        if fd is None:
            fd = open(filename, "rb")
            cache[filename] = fd
        fd.seek(offset)
        return fd

    def read_segment(
        self,
        utt: str,
        length: Optional[int] = None,
        shuffle: bool = False,
        start: Optional[int] = None,
        rng: Optional[random.Random] = None,
    ):
        num_features = self.utt2num_frames[utt]
        if length is not None:
            if start is None:
                length = min(length, num_features)
                if shuffle:
                    r = rng if rng is not None else random
                    start = r.randint(0, num_features - 1)
                    if start + length > num_features:
                        start = num_features - length
                else:
                    start = 0
            else:
                if start + length > num_features:
                    length = num_features - start
        else:
            start = 0
            length = num_features
        real_start = start - self.left_context
        real_length = length + self.left_context + self.right_context

        feats_filename, feats_offset = self.utt2feats_offset[utt]
        fd = self._fd_at(self.fd, feats_filename, feats_offset)
        if fd.read(2).decode() != "\0B":
            raise IOError("Cannot read features from %s" % feats_filename)
        tmp_start = max(real_start, 0)
        tmp_end = min(real_start + real_length, num_features)
        mat = ark._read_submat_binary(fd, tmp_start, tmp_end - tmp_start)
        if real_start < 0:
            mat = np.concatenate([np.tile(mat[0, :], [-real_start, 1]), mat], axis=0)
        if real_start + real_length > num_features:
            pad = real_start + real_length - num_features
            mat = np.concatenate([mat, np.tile(mat[-1, :], [pad, 1])], axis=0)
        assert mat.shape[0] == real_length

        vad_filename, vad_offset = self.utt2vad_offset[utt]
        vfd = self._fd_at(self.vad_fd, vad_filename, vad_offset)
        if vfd.read(2).decode() != "\0B":
            raise IOError("Cannot read vad from %s" % vad_filename)
        vad = ark._read_subvec_flt_binary(vfd, start, length)

        ali_filename, ali_offset = self.utt2ali_offset[utt]
        afd = self._fd_at(self.ali_fd, ali_filename, ali_offset)
        if afd.read(2).decode() != "\0B":
            raise IOError("Cannot read ali from %s" % ali_filename)
        ali = ark._read_subvec_int_binary(afd, start, length)

        assert mat.shape[0] == vad.shape[0] + self.left_context + self.right_context
        assert mat.shape[0] == ali.shape[0] + self.left_context + self.right_context
        return mat, vad, ali, start


def _load_utt2int(path: str) -> Dict[str, int]:
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    out = {}
    with open(path) as f:
        for line in f:
            utt, v = line.strip().split(" ")
            out[utt] = int(v)
    return out


def _load_scp_offsets(path: str) -> Dict[str, Tuple[str, int]]:
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    out = {}
    with open(path) as f:
        for line in f:
            utt, info = line.strip().split(" ")
            filename, offset = info.rsplit(":", 1)
            out[utt] = (filename, int(offset))
    return out
