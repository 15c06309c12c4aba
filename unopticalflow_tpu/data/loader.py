"""Threaded batch loading + double-buffered device prefetch.

TPU-native replacement for the reference's ``DataLoader(num_workers=4)``
(/root/reference/train.py:110): samples are pure functions of their index
(idx-seeded, see datasets.py), so a thread pool decodes/resizes batches ahead
of time (cv2 releases the GIL) while ``device_prefetch`` keeps the *next*
batch in flight to the device as the current step runs — compute never waits
on host IO.  Epoch semantics match the reference: dataset length is
``num_iterations * batch_size`` and indices run 0..N-1 (the torch loader
shuffles indices, but with idx-seeded sampling both orderings draw iid
uniform samples — documented deviation).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax


class BatchLoader:
    """Iterate stacked numpy batches of ``dataset`` with background workers."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 4,
        prefetch_batches: int = 2,
        drop_last: bool = False,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """``batch_size`` is the GLOBAL batch.

        Multi-host (``process_count > 1``): every process constructs the SAME
        global index schedule, then loads only its own contiguous block of
        each batch — block ``process_index`` of size
        ``batch_size // process_count``.  Contiguous blocks (not a stride)
        because on a 1-D data mesh process ``p`` owns devices
        ``[p*d .. (p+1)*d)``, which hold the global batch rows in order —
        exactly what ``jax.make_array_from_process_local_data`` assembles
        without resharding (see ``device_prefetch``).  Trailing batches that
        cannot fill the global batch are dropped (they cannot be divided
        evenly across processes).
        """
        if batch_size % max(1, process_count):
            raise ValueError(
                f"global batch {batch_size} must divide over "
                f"{process_count} processes"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = max(1, prefetch_batches)
        self.drop_last = drop_last or process_count > 1
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _load_batch(self, pool, indices):
        samples = list(pool.map(self.dataset.__getitem__, indices))
        if isinstance(samples[0], tuple):
            return tuple(np.stack(parts, 0) for parts in zip(*samples))
        return np.stack(samples, 0)

    def __iter__(self):
        n = len(self.dataset)
        batches = [
            list(range(s, min(s + self.batch_size, n)))
            for s in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.process_count > 1:
            local = self.batch_size // self.process_count
            batches = [
                b[self.process_index * local : (self.process_index + 1) * local]
                for b in batches
            ]

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def put(item) -> bool:
            """Queue-put that stays responsive to stop (consumer gone)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    try:
                        batch = self._load_batch(pool, idxs)
                    except Exception as e:  # surface worker errors to consumer
                        put(e)
                        return
                    if not put(batch):
                        return
                put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def device_prefetch(iterator, sharding=None, depth: int = 2, batch_axis: int = 0):
    """Keep ``depth`` batches in flight to the device.

    With a ``NamedSharding`` the batch lands pre-sharded over the mesh's data
    axis; otherwise it goes to the default device.  Host->device copies of
    batch k+1 overlap with the compute of batch k.

    Multi-host: when the sharding's mesh spans more than this process, the
    incoming batch is this process's LOCAL block (see ``BatchLoader``) and is
    assembled into the global jax.Array via
    ``jax.make_array_from_process_local_data`` — each process feeds only its
    own devices; no cross-host data movement happens on the batch path.
    ``batch_axis`` names the data-sharded axis the local blocks concatenate
    along — 0 for plain (B, ...) batches, 1 for the K-stacked (K, B, ...)
    batches of ``--steps_per_dispatch`` (the scan axis K stays replicated).
    """
    import collections

    buf = collections.deque()
    multi_process = jax.process_count() > 1

    def put(batch):
        if sharding is not None:
            if multi_process:
                scale = jax.process_count()

                def mk(x):
                    gshape = list(x.shape)
                    gshape[batch_axis] *= scale
                    return jax.make_array_from_process_local_data(
                        sharding, np.ascontiguousarray(x), tuple(gshape)
                    )

                return jax.tree_util.tree_map(mk, batch)
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
