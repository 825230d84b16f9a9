"""Simple multi-threaded batch loader (torch DataLoader stand-in).

Prefetches batches on background threads; yields stacked numpy NHWC
float32 arrays ready for ``jax.device_put``.
"""

import queue
import random
import threading

import numpy as np


class BatchLoader:
    def __init__(self, dataset, batch_size, shuffle=True, num_workers=2,
                 prefetch=4, drop_last=True, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._rng = random.Random(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        indices = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(indices)
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q = queue.Queue(maxsize=self.prefetch)
        job_q = queue.Queue()
        for i, b in enumerate(batches):
            job_q.put((i, b))

        results = {}
        lock = threading.Lock()

        def worker():
            while True:
                try:
                    i, idxs = job_q.get_nowait()
                except queue.Empty:
                    return
                batch = np.stack([self.dataset[j] for j in idxs])
                with lock:
                    results[i] = batch

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        for i in range(len(batches)):
            while True:
                with lock:
                    if i in results:
                        yield results.pop(i)
                        break
                threading.Event().wait(0.002)
