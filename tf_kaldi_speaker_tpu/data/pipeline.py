"""Host-side prefetching pipeline feeding device-resident batches.

Replaces the reference's multiprocessing producer queues
(dataset/data_loader.py:310-414): worker *threads* (the decode hot path is
numpy / native C++ and releases the GIL) fill a bounded queue, and an async
``jax.device_put`` double-buffer hides host→device transfer behind compute.
Deterministic: worker i uses seed ``base_seed + i``.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import jax

from .sampler import DataOutOfRange


class PrefetchLoader:
    """Threaded batch producer with the reference queue API (start/fetch/stop).

    Args:
        sampler_factory: ``f(worker_seed) -> iterable`` creating one sampler
            per worker (each opens its own FeatureReader fds).
        num_parallel: number of worker threads (``num_parallel_datasets``).
        max_qsize: bounded queue capacity (``max_queue_size``).
        finite: if True, fetch() raises DataOutOfRange once all workers are
            exhausted and the queue has drained (sequential/validation mode).
    """

    def __init__(
        self,
        sampler_factory: Callable[[int], object],
        num_parallel: int = 4,
        max_qsize: int = 10,
        base_seed: int = 0,
        finite: bool = False,
    ):
        self.sampler_factory = sampler_factory
        self.num_parallel = num_parallel
        self.base_seed = base_seed
        self.finite = finite
        self.queue: queue.Queue = queue.Queue(max_qsize)
        self.stop_event = threading.Event()
        self.threads = []
        self._done = 0
        self._done_lock = threading.Lock()
        self._samplers = []

    def _work(self, worker_id: int) -> None:
        sampler = self.sampler_factory(self.base_seed + worker_id)
        self._samplers.append(sampler)
        try:
            for batch in sampler:
                while not self.stop_event.is_set():
                    try:
                        self.queue.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self.stop_event.is_set():
                    return
        finally:
            with self._done_lock:
                self._done += 1

    def start(self) -> "PrefetchLoader":
        self.threads = [
            threading.Thread(target=self._work, args=(i,), daemon=True)
            for i in range(self.num_parallel)
        ]
        for t in self.threads:
            t.start()
        return self

    def fetch(self):
        while True:
            try:
                return self.queue.get(timeout=0.2)
            except queue.Empty:
                with self._done_lock:
                    finished = self._done >= self.num_parallel
                if finished and self.queue.empty():
                    if self.finite:
                        raise DataOutOfRange
                    raise RuntimeError("All data workers exited unexpectedly")

    def __iter__(self, _done=DataOutOfRange):
        # _done bound at def time: when a leftover generator is finalized
        # during interpreter shutdown, module globals may already be None
        # and `except DataOutOfRange` would itself raise.
        try:
            while True:
                yield self.fetch()
        except _done:
            return

    def stop(self) -> None:
        self.stop_event.set()
        # Drain so producers blocked on put() observe the stop event.
        try:
            while True:
                self.queue.get_nowait()
        except queue.Empty:
            pass
        for t in self.threads:
            t.join(timeout=5.0)
        for s in self._samplers:
            close = getattr(s, "close", None)
            if close:
                close()
        self._samplers = []


def device_prefetch(
    iterator: Iterator,
    sharding=None,
    depth: int = 2,
    put_fn=None,
    threaded: bool = None,
) -> Iterator:
    """Keep ``depth`` batches in flight onto the device ahead of consumption.

    ``put_fn`` overrides the placement (multi-host: assemble the global
    array from this process's local rows).

    By default the host→device copies run on a dedicated transfer thread:
    over a remote/tunneled device ``jax.device_put`` largely blocks on the
    copy, and issuing it inline serializes transfer with step dispatch —
    measured on the axon tunnel that turns a ~9 ms/batch copy + ~3 ms step
    into a ~20 ms/step loop. With the transfer thread the loop runs at
    ``max(copy, compute)``. Set ``threaded=False`` (or
    ``TFKS_TRANSFER_THREAD=0``) for the inline double-buffer, e.g. when the
    put must happen on the caller's thread.
    """
    import os

    if threaded is None:
        threaded = os.environ.get("TFKS_TRANSFER_THREAD", "1") == "1"

    def _put(x):
        if put_fn is not None:
            return put_fn(x)
        return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)

    if not threaded:
        buf = []
        it = iter(iterator)
        try:
            for _ in range(depth):
                buf.append(jax.tree.map(_put, next(it)))
        except StopIteration:
            pass
        while buf:
            out = buf.pop(0)
            try:
                buf.append(jax.tree.map(_put, next(it)))
            except StopIteration:
                pass
            yield out
        return

    q: queue.Queue = queue.Queue(depth)
    stop = threading.Event()
    DONE = object()

    def _work():
        try:
            for batch in iterator:
                dev = jax.tree.map(_put, batch)
                while not stop.is_set():
                    try:
                        q.put(dev, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            item = DONE
        except BaseException as e:  # re-raised on the consumer thread
            item = e
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return
            except queue.Full:
                continue

    t = threading.Thread(target=_work, daemon=True)
    t.start()
    # Bound now: if a leftover generator is finalized at interpreter
    # shutdown, the `queue` module global may already be None.
    empty_exc = queue.Empty
    try:
        while True:
            item = q.get()
            if item is DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except empty_exc:
            pass
        t.join(timeout=5.0)
