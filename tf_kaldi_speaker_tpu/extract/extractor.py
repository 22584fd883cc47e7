"""Batched TPU embedding extraction with length bucketing.

Replaces the reference's nj×single-CPU extraction jobs (extract.py +
run_extract_embeddings.sh) with ONE device program: utterances are grouped
into geometric length buckets, padded + masked (masked pooling makes padded
forward == unpadded forward exactly, see models/pooling.py), and embedded in
large batches. Very long utterances keep the reference's semantics
bit-for-bit: split into 50%-overlapping windows of ``chunk_size``, embed,
length-weighted average, optional L2 norm (extract.py:69-93).

Bucket batches are sharded over the mesh's data axis (SURVEY §2.5: DP over
ICI replaces the nj-way extraction farm), so every local chip works on the
same batch; parameters are replicated. The rows of a batch are independent
forwards, so sharded == single-device output exactly.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import EntireNetwork
from ..train import checkpoints
from ..utils.params import Params

log = logging.getLogger("tfks.extract")


def make_length_buckets(min_len: int, max_len: int, ratio: float = 1.27) -> List[int]:
    """Geometric grid of pad-to lengths, multiples of 8."""
    out = []
    x = float(max(min_len, 8))
    while x < max_len:
        out.append(int(np.ceil(x / 8.0) * 8))
        x *= ratio
    out.append(int(np.ceil(max_len / 8.0) * 8))
    return sorted(set(out))


class Extractor:
    """Loads a trained model dir and embeds utterances in device batches."""

    def __init__(
        self,
        model_dir: str,
        node: Optional[str] = None,
        batch_size: int = 32,
        chunk_size: int = 10000,
        min_chunk_size: int = 25,
        normalize: bool = False,
        mesh=None,
    ):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS, make_mesh
        from ..utils.jax_cache import enable_persistent_cache

        enable_persistent_cache()
        nnet_dir = os.path.join(model_dir, "nnet")
        if not os.path.isdir(nnet_dir):
            nnet_dir = model_dir  # allow passing the nnet dir directly
        self.params = Params(os.path.join(nnet_dir, "config.json"))
        if node:
            self.params.dict["embedding_node"] = node
        self.node = self.params.dict.get("embedding_node", "tdnn6_dense")
        with open(os.path.join(nnet_dir, "feature_dim")) as f:
            self.dim = int(f.read().strip())
        self.mesh = make_mesh() if mesh is None else mesh
        n_data = self.mesh.shape[DATA_AXIS]
        # Bucket batches are sharded over the data axis; round the batch up
        # so every device gets equal rows (padding rows are masked, and
        # flush() only reads back the filled rows).
        self.batch_size = -(-batch_size // n_data) * n_data
        self._bsh = NamedSharding(self.mesh, P(DATA_AXIS))
        self._rep = NamedSharding(self.mesh, P())
        self.chunk_size = chunk_size
        self.min_chunk_size = min_chunk_size
        self.normalize = normalize
        self.buckets = make_length_buckets(min_chunk_size, chunk_size)

        raw, step = checkpoints.load_checkpoint(nnet_dir)
        log.info("Loaded checkpoint step %d from %s (node %s)", step, nnet_dir, self.node)
        # Pin the params on device ONCE (replicated over the mesh) — numpy
        # leaves would be re-uploaded on every jit call.
        self.variables = jax.device_put({
            "params": raw["params"]["network"],
            "batch_stats": raw.get("batch_stats", {}).get("network", {}),
        }, self._rep)
        self.net = EntireNetwork(
            config=self.params.dict,
            network_type=self.params.dict.get("network_type", "tdnn"),
        )

        bf16 = self.params.dict.get("compute_dtype", "float32") == "bfloat16"
        # bf16 models: cast features on the HOST and ship 2 bytes/element
        # instead of 4 — the host→device link is the extraction bottleneck
        # (the device cast this replaces is the same round-to-nearest-even,
        # so embeddings are bit-identical).
        import ml_dtypes

        self._feed_dtype = ml_dtypes.bfloat16 if bf16 else np.float32

        def fwd(variables, feats, mask):
            if bf16:
                variables = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                    variables,
                )
                feats = feats.astype(jnp.bfloat16)
            _, endpoints = self.net.apply(variables, feats, False, mask=mask)
            return endpoints[self.node].astype(jnp.float32)

        self._fwd = jax.jit(
            fwd, in_shardings=(None, self._bsh, self._bsh), out_shardings=self._bsh
        )

    # ------------------------------------------------------------------
    def _embed_batch_async(self, feats: np.ndarray, mask: np.ndarray):
        """Dispatch one batch; returns the (unmaterialized) device result.
        JAX dispatch is async, so callers can assemble/dispatch the next
        batch before forcing this one with np.asarray."""
        from ..parallel.mesh import DATA_AXIS

        n = self.mesh.shape[DATA_AXIS]
        b = feats.shape[0]
        if feats.dtype != self._feed_dtype:  # long-chunk path passes f32
            feats = feats.astype(self._feed_dtype)
        if b % n:  # e.g. the batch-of-1 long-utterance chunk path
            pad = n - b % n
            feats = np.concatenate(
                [feats, np.zeros((pad,) + feats.shape[1:], feats.dtype)], 0
            )
            mask = np.concatenate(
                [mask, np.zeros((pad,) + mask.shape[1:], mask.dtype)], 0
            )
        return self._fwd(
            self.variables,
            jax.device_put(feats, self._bsh),
            jax.device_put(mask, self._bsh),
        )

    def _embed_batch(self, feats: np.ndarray, mask: np.ndarray) -> np.ndarray:
        b = feats.shape[0]
        return np.asarray(self._embed_batch_async(feats, mask))[:b]

    def _bucket_for(self, length: int) -> int:
        for b in self.buckets:
            if length <= b:
                return b
        return self.buckets[-1]

    def _rows_for(self, b: int) -> int:
        """Row count to allocate for a b-item dispatch: the smallest
        ``n_data * 2^k`` >= b, capped at batch_size. Streaming batches are
        always full; only each bucket's final flush is partial, and the
        host->device link is the extraction bottleneck — shipping
        batch_size rows for a handful of stragglers doubles the bytes of
        the tail. Power-of-two quantization bounds the number of compiled
        shapes to log2(batch_size/n_data) per bucket, and only shapes
        actually hit are compiled (persistent jax cache holds them across
        runs)."""
        from ..parallel.mesh import DATA_AXIS

        r = self.mesh.shape[DATA_AXIS]
        while r < b and r < self.batch_size:
            r *= 2
        return min(r, self.batch_size)

    def embed_stream(
        self, stream: Iterable[Tuple[str, np.ndarray]]
    ) -> Iterator[Tuple[str, np.ndarray]]:
        """Yield (key, embedding) for a stream of (key, features [T, D]).

        Ordering note: results are emitted as buckets fill, i.e. not in input
        order; callers that need order should collect into a dict.

        Batches are pipelined one deep: a dispatched batch's result is only
        materialized after the NEXT batch has been assembled and dispatched
        (JAX dispatch is async), so host assembly + H2D transfer overlap the
        in-flight device compute and result sync."""
        pending: Dict[int, List[Tuple[str, np.ndarray]]] = {}
        in_flight: List[tuple] = []  # [(items, emb_device)]

        def dispatch(bucket: int):
            items = pending.pop(bucket, [])
            if not items:
                return
            rows = self._rows_for(len(items))
            feats = np.zeros((rows, bucket, self.dim), self._feed_dtype)
            mask = np.zeros((rows, bucket), np.float32)
            for i, (_, f) in enumerate(items):
                feats[i, : f.shape[0]] = f
                mask[i, : f.shape[0]] = 1.0
            in_flight.append((items, self._embed_batch_async(feats, mask)))

        def drain(entry):
            items, out = entry
            emb = np.asarray(out)[: len(items)]
            if self.normalize:
                # the reference applies a FINAL L2 norm to both paths
                # (extract.py:92-93), not just inside the chunk average
                emb = emb / np.sqrt(
                    np.sum(np.square(emb), axis=1, keepdims=True))
            for i, (key, _) in enumerate(items):
                yield key, emb[i]

        for key, feature in stream:
            T = feature.shape[0]
            if T < self.min_chunk_size:
                log.info("Key %s length too short, %d < %d, skip.", key, T, self.min_chunk_size)
                continue
            if T > self.chunk_size:
                yield key, self._embed_long(key, feature)
                continue
            bucket = self._bucket_for(T)
            pending.setdefault(bucket, []).append((key, feature))
            if len(pending[bucket]) == self.batch_size:
                dispatch(bucket)
                while len(in_flight) > 1:
                    yield from drain(in_flight.pop(0))
        for bucket in sorted(pending):
            dispatch(bucket)
        for entry in in_flight:
            yield from drain(entry)

    def _embed_long(self, key: str, feature: np.ndarray) -> np.ndarray:
        """50%-overlap chunking + length-weighted average (extract.py:69-93)."""
        T = feature.shape[0]
        half = self.chunk_size // 2
        num_chunks = int(np.ceil(float(T - self.chunk_size) / half)) + 1
        log.info("Key %s length %d > %d, split to %d chunks.", key, T, self.chunk_size, num_chunks)
        chunks, lengths = [], []
        for i in range(num_chunks):
            start = i * half
            this = self.chunk_size if T - start > self.chunk_size else T - start
            lengths.append(this)
            chunks.append(feature[start : start + this])
        # Batch chunks per bucket (the reference batches all full chunks in
        # one predict, extract.py:82) instead of one padded forward each.
        by_bucket: Dict[int, List[int]] = {}
        for idx, c in enumerate(chunks):
            by_bucket.setdefault(self._bucket_for(c.shape[0]), []).append(idx)
        results: List[Optional[np.ndarray]] = [None] * num_chunks
        for bucket in sorted(by_bucket):
            idxs = by_bucket[bucket]
            for i0 in range(0, len(idxs), self.batch_size):
                sel = idxs[i0 : i0 + self.batch_size]
                # Same power-of-two shape quantization as the stream-flush
                # path: without it each distinct chunk count compiles its
                # own XLA program (padding rows are masked, no numeric
                # effect).
                rows = self._rows_for(len(sel))
                feats = np.zeros((rows, bucket, self.dim), np.float32)
                mask = np.zeros((rows, bucket), np.float32)
                for j, idx in enumerate(sel):
                    c = chunks[idx]
                    feats[j, : c.shape[0]] = c
                    mask[j, : c.shape[0]] = 1.0
                out = self._embed_batch(feats, mask)
                for j, idx in enumerate(sel):
                    results[idx] = out[j]
        embs = np.stack(results)
        lengths = np.asarray(lengths, np.float64)[:, None]
        if self.normalize:
            embs = embs / np.sqrt(np.sum(np.square(embs), axis=1, keepdims=True))
        emb = (np.sum(embs * lengths, axis=0) / np.sum(lengths)).astype(np.float32)
        if self.normalize:
            # final L2 norm, applied to both paths (extract.py:92-93)
            emb = emb / np.sqrt(np.sum(np.square(emb)))
        return emb

    def embed_utterance(self, feature: np.ndarray) -> np.ndarray:
        """Single-utterance path (same numbers as embed_stream)."""
        out = list(self.embed_stream([("utt", feature)]))
        assert out, "utterance shorter than min_chunk_size"
        emb = out[0][1]
        return emb

    # ------------------------------------------------------------------
    # Exact long-utterance path: statistics pooling is associative, so a
    # streamed accumulation of (count, sum, sumsq) over overlapping chunks
    # equals ONE forward over the whole utterance — unlike the reference's
    # 50%-overlap chunk-embedding average (extract.py:69-87), this is exact
    # at any length with bounded memory.
    # ------------------------------------------------------------------
    def _build_exact_long(self):
        if getattr(self, "_frames_jit", None) is not None:
            return
        from ..models.tdnn import TDNN_TOTAL_CONTEXT, TDNNFrames, TDNNTail

        cfg = self.params.dict
        if cfg.get("network_type", "tdnn") != "tdnn":
            raise ValueError(
                "exact long-utterance extraction requires the TDNN network "
                "(network_type=%r)" % cfg.get("network_type"))
        assert cfg.get("pooling_type") == "statistics_pooling", (
            "exact long-utterance extraction requires statistics pooling"
        )
        frames = TDNNFrames(config=cfg)
        tail = TDNNTail(config=cfg)
        node = self.node
        tdnn_vars = {
            "params": self.variables["params"]["tdnn"],
            "batch_stats": self.variables["batch_stats"].get("tdnn", {}),
        }
        # Follow the model's compute dtype like the normal forward (fwd
        # above): a bf16 model must not emit fp32-numerics embeddings for
        # long utterances and bf16 ones for short — one embedding space.
        bf16 = cfg.get("compute_dtype", "float32") == "bfloat16"

        def cast(v):
            if not bf16:
                return v
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, v)

        def frames_h(feats):
            h = frames.apply(
                cast(tdnn_vars),
                feats.astype(jnp.bfloat16) if bf16 else feats, False)[0]
            return h.astype(jnp.float32)  # accumulate stats in f32

        def frames_fn(feats):  # [1, chunk, D] -> (count, sum, sumsq)
            h = frames_h(feats)
            return (
                jnp.float32(h.shape[0]),
                jnp.sum(h, axis=0),
                jnp.sum(jnp.square(h), axis=0),
            )

        def frames_masked_fn(feats, n_valid):
            # n_valid is TRACED (one compile per pad bucket, not per tail
            # length): rows >= n_valid involve pad frames and are masked.
            h = frames_h(feats)
            m = (jnp.arange(h.shape[0]) < n_valid).astype(h.dtype)[:, None]
            return (
                n_valid.astype(jnp.float32),
                jnp.sum(h * m, axis=0),
                jnp.sum(jnp.square(h) * m, axis=0),
            )

        def tail_fn(pooled):  # [2W] f32 -> embedding
            p = pooled[None]
            endpoints = tail.apply(
                cast(tdnn_vars), p.astype(jnp.bfloat16) if bf16 else p, False)
            return endpoints[node][0].astype(jnp.float32)

        self._frames_jit = jax.jit(frames_fn)
        self._frames_masked = jax.jit(frames_masked_fn)
        self._tail_jit = jax.jit(tail_fn)
        self._tdnn_context = TDNN_TOTAL_CONTEXT

    def embed_long_exact(self, feature: np.ndarray) -> np.ndarray:
        """Exact embedding for arbitrarily long utterances, O(chunk) memory.

        Sufficient statistics are accumulated across chunks in float64 on
        the host (a one-pass E[x^2]-mean^2 in float32 would cancel
        catastrophically over hour-scale inputs)."""
        from ..models.pooling import VAR2STD_EPSILON

        self._build_exact_long()
        ctx = self._tdnn_context
        T = feature.shape[0]
        if T <= ctx:
            raise ValueError(
                "utterance too short for the exact long path "
                "(%d frames <= TDNN context %d)" % (T, ctx))
        chunk = min(self.chunk_size, max(self.min_chunk_size, 4096))
        step = chunk - ctx
        count = 0.0
        s1 = s2 = None
        start = 0
        while start < T - ctx:
            end = min(start + chunk, T)
            piece = feature[start:end]
            if piece.shape[0] == chunk:
                c, a, b = self._frames_jit(jnp.asarray(piece[None]))
            else:
                # trailing short piece: pad to a bucket, mask the pad rows
                c, a, b = self._frames_jit_dynamic(piece)
            count += float(c)
            a64 = np.asarray(a, np.float64)
            b64 = np.asarray(b, np.float64)
            s1 = a64 if s1 is None else s1 + a64
            s2 = b64 if s2 is None else s2 + b64
            start += step
        mean = s1 / count
        var = np.maximum(s2 / count - mean * mean, 0.0)
        std = np.sqrt(np.where(var <= VAR2STD_EPSILON, VAR2STD_EPSILON, var))
        pooled = np.concatenate([mean, std]).astype(np.float32)
        emb = np.asarray(self._tail_jit(jnp.asarray(pooled)))
        if self.normalize:
            emb = emb / np.sqrt(np.sum(np.square(emb)))
        return emb

    def _frames_jit_dynamic(self, piece: np.ndarray):
        """Pad the trailing short chunk to a length bucket and mask — one
        extra compile per distinct pad BUCKET (n_valid is traced)."""
        bucket = self._bucket_for(piece.shape[0])
        padded = np.zeros((bucket, piece.shape[1]), piece.dtype)
        padded[: piece.shape[0]] = piece
        n_valid = piece.shape[0] - self._tdnn_context
        return self._frames_masked(
            jnp.asarray(padded[None]), jnp.int32(n_valid))
