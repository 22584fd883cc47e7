"""Decode-on-device extraction: the host ships raw CM codes, the TPU does
dequantize + sliding CMVN + energy VAD + voiced-frame compaction + forward
as ONE fused program.

Beyond-reference input path (SURVEY.md §7 names decode-on-device as the
input-throughput stretch goal; the training side is data/device_pool.py).
The reference extraction pipe is three host processes per job
(apply-cmvn-sliding | select-voiced-frames | extract.py feed_dict,
run_extract_embeddings.sh:47). Here the host reads 1 byte/element from the
compressed ark and ships it untouched; everything else happens on device:

- piecewise CM dequantization (ops/cm_dequant_pallas.py, the same kernel
  the training pool uses),
- sliding-window CMVN over ALL frames with per-utterance window clipping
  (ops/cmvn.py:sliding_cmvn_jax_masked — Kaldi apply-cmvn-sliding),
- energy VAD computed from the RAW features (ops/vad.py:
  compute_vad_energy_jax — Kaldi compute-vad semantics, matching the
  vad.scp-from-unnormalized-MFCC data-prep convention),
- voiced-frame COMPACTION: a stable argsort moves voiced frames to the
  front in original order — exactly select-voiced-frames' frame removal
  (the convolution stack sees the same compacted sequence), with the
  remainder zeroed and masked out of pooling.

Cuts host→device bytes 4x vs bf16 features (8x vs f32) on the link that
bounds extraction throughput, and removes the per-utterance host
featurization entirely.
"""

from __future__ import annotations

import logging
from typing import Dict, Iterable, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cm_dequant_pallas import cm_dequantize
from ..ops.cmvn import sliding_cmvn_jax_masked
from ..ops.vad import compute_vad_energy_jax
from .extractor import Extractor

log = logging.getLogger("tfks.extract.device_pipe")


class DevicePipeExtractor(Extractor):
    """Extractor whose input is raw CM codes instead of float features."""

    def __init__(
        self,
        model_dir: str,
        cmvn: bool = True,
        vad: bool = True,
        cmn_window: int = 300,
        **kwargs,
    ):
        super().__init__(model_dir, **kwargs)
        self.cmvn = cmvn
        self.vad = vad
        self.cmn_window = int(cmn_window)
        bf16 = self.params.dict.get("compute_dtype", "float32") == "bfloat16"

        def fwd_codes(variables, codes, headers, lengths):
            B, L, D = codes.shape
            t = jnp.arange(L, dtype=jnp.int32)[None, :]
            n = lengths.astype(jnp.int32)[:, None]
            valid = t < n
            raw = cm_dequantize(codes, headers) * valid[:, :, None].astype(
                jnp.float32
            )
            feats = raw
            if self.cmvn:
                feats = sliding_cmvn_jax_masked(
                    raw, lengths, window=self.cmn_window
                )
                feats = feats * valid[:, :, None].astype(jnp.float32)
            if self.vad:
                voiced = compute_vad_energy_jax(raw, lengths)
                # Stable sort on NOT-voiced: voiced frames first, original
                # order preserved == select-voiced-frames' frame removal.
                order = jnp.argsort(
                    jnp.logical_not(voiced), axis=1, stable=True
                )
                feats = jnp.take_along_axis(feats, order[:, :, None], axis=1)
                n_out = jnp.sum(voiced, axis=1).astype(jnp.int32)
            else:
                n_out = lengths.astype(jnp.int32)
            mask = (t < n_out[:, None]).astype(jnp.float32)
            feats = feats * mask[:, :, None]
            if bf16:
                variables = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                    variables,
                )
                feats = feats.astype(jnp.bfloat16)
            _, endpoints = self.net.apply(variables, feats, False, mask=mask)
            return endpoints[self.node].astype(jnp.float32), n_out

        self._fwd_codes = jax.jit(
            fwd_codes,
            in_shardings=(None, self._bsh, self._bsh, self._bsh),
            out_shardings=(self._bsh, self._bsh),
        )

    # ------------------------------------------------------------------
    def embed_codes_stream(
        self, stream: Iterable[Tuple[str, np.ndarray, np.ndarray]]
    ) -> Iterator[Tuple[str, np.ndarray]]:
        """Yield (key, embedding) for (key, codes [T, D] uint8,
        headers [4, D] float32) triples (see kio.ark.read_codes_scp).

        Utterances whose POST-pipe length lands below ``min_chunk_size``
        are skipped with a log line (host-path parity); utterances longer
        than ``chunk_size`` must be routed through the host path by the
        caller (cli/extract.py does)."""
        pending: Dict[int, List[Tuple[str, np.ndarray, np.ndarray]]] = {}
        in_flight: List[tuple] = []  # one-deep pipeline (see embed_stream)

        def dispatch(bucket: int):
            items = pending.pop(bucket, [])
            if not items:
                return
            rows = self._rows_for(len(items))
            codes = np.zeros((rows, bucket, self.dim), np.uint8)
            headers = np.zeros((rows, 4, self.dim), np.float32)
            lengths = np.zeros((rows,), np.int32)
            for i, (_, c, h) in enumerate(items):
                codes[i, : c.shape[0]] = c
                headers[i] = h
                lengths[i] = c.shape[0]
            out = self._fwd_codes(
                self.variables,
                jax.device_put(codes, self._bsh),
                jax.device_put(headers, self._bsh),
                jax.device_put(lengths, self._bsh),
            )
            in_flight.append((items, out))

        def drain(entry):
            items, (emb_dev, n_dev) = entry
            # One fetch for both outputs: through a high-RTT link two
            # np.asarray calls cost two round trips.
            emb, n_out = jax.device_get((emb_dev, n_dev))
            for i, (key, _, _) in enumerate(items):
                if n_out[i] < self.min_chunk_size:
                    log.info(
                        "Key %s length too short after pipe, %d < %d, skip.",
                        key, int(n_out[i]), self.min_chunk_size,
                    )
                    continue
                e = emb[i]
                if self.normalize:
                    # same final L2 as the float-feature flush path
                    e = e / np.sqrt(np.sum(np.square(e)))
                yield key, e

        for key, c, h in stream:
            T = int(c.shape[0])
            if T > self.chunk_size:
                raise ValueError(
                    "utterance %s has %d frames > chunk_size=%d; route long "
                    "utterances through the host path" % (key, T, self.chunk_size)
                )
            if T < self.min_chunk_size:
                log.info("Key %s length too short, %d < %d, skip.",
                         key, T, self.min_chunk_size)
                continue
            bucket = self._bucket_for(T)
            pending.setdefault(bucket, []).append((key, c, h))
            if len(pending[bucket]) == self.batch_size:
                dispatch(bucket)
                while len(in_flight) > 1:
                    yield from drain(in_flight.pop(0))
        for bucket in sorted(pending):
            dispatch(bucket)
        for entry in in_flight:
            yield from drain(entry)
