"""Threaded host->device batch feed.

Replaces torch's DataLoader (reference train.py:380-381, 16 worker processes)
with a thread-pool decode + background batch assembly + device prefetch design
suited to feeding a TPU mesh:

* static shapes: every batch has exactly ``batch_size`` samples; with
  ``drop_last=False`` the final partial batch is padded — inputs with zeros and
  labels with ``PAD_LABEL`` so padded pixels drop out of the confusion matrix
  for free (see ops/confusion.py) and the jit caches exactly one executable;
* double-buffered: a producer thread assembles and ``jax.device_put``s the next
  batch (sharded across the mesh when a sharding is given) while the previous
  one is being consumed, overlapping decode + H2D with TPU compute;
* deterministic augmentation: each sample's RNG is seeded by
  (seed, epoch, dataset index), so runs reproduce regardless of thread timing.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from ..ops.confusion import PAD_LABEL

_SENTINEL = object()


class PatchLoader:
    """Iterable batch loader over a PatchDataset (or any map-style dataset
    whose __getitem__(i, rng) returns {"input": (H, W, C) f32, "label": (H, W)})."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 8,
        drop_last: bool = False,
        seed: int = 0,
        sharding=None,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
        device_preproc: bool = False,
        random_flip: bool = False,
    ):
        """``process_index``/``process_count``: multi-host mode — this host
        decodes only its contiguous 1/process_count slice of every global
        batch and the global array is stitched with
        jax.make_array_from_process_local_data (parallel/multihost.py).
        batch_size is always the GLOBAL batch size.

        ``device_preproc``: ship raw uint8 pixels + per-sample flip bits and
        let the jitted step normalize/augment on the TPU. Host work shrinks
        to pure (GIL-released) decode and host->device traffic drops 4x —
        the 16-thread host pipeline measured ~325 patches/s with in-Python
        transforms vs pure-decode rates well above it. Only valid when the
        dataset needs no host-side color math (RGB input, no blankfield).
        ``random_flip`` generates the deterministic per-sample flip bits the
        device applies (training augmentation)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self._shape_cache = None
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self.process_index = process_index
        self.process_count = process_count
        self.device_preproc = device_preproc
        self.random_flip = random_flip
        if batch_size % max(1, process_count) != 0:
            raise ValueError("batch_size must be divisible by process_count")
        if device_preproc and not hasattr(dataset, "get_raw"):
            raise ValueError("device_preproc requires a dataset with get_raw()")
        # Decide ONCE whether __getitem__ accepts the deterministic rng; a
        # call-time `except TypeError` would also swallow TypeErrors raised
        # INSIDE the dataset/transform and silently re-run them with a fresh
        # global rng, breaking the (seed, epoch, index) determinism contract.
        import inspect

        try:
            sig = inspect.signature(dataset.__getitem__)
            self._pass_rng = "rng" in sig.parameters
        except (TypeError, ValueError):  # builtins without introspection
            self._pass_rng = False
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    # -- internals -----------------------------------------------------------
    def _sample_shape(self):
        """(H, W, C) of one input, WITHOUT decoding when metadata suffices —
        a pure-padding host slice must not pay a full image decode per batch
        just to read a shape."""
        if self._shape_cache is None:
            ds = self.dataset
            if hasattr(ds, "patch_size") and hasattr(ds, "input_type"):
                # raw (device_preproc) batches are always decoded RGB; the
                # float path's channel count follows the stain space
                c = 2 if (not self.device_preproc and ds.input_type == "GH") else 3
                self._shape_cache = (ds.patch_size, ds.patch_size, c)
            else:
                self._shape_cache = tuple(np.shape(ds[0]["input"]))
        return self._shape_cache

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng([self.seed, self._epoch]).shuffle(idx)
        return idx

    def _load_sample(self, index: int):
        rng = np.random.default_rng([self.seed, self._epoch, int(index)])
        if self.device_preproc:
            inp, lab = self.dataset.get_raw(int(index))
            if hasattr(self.dataset, "input_list"):
                sid = self.dataset.input_list[int(index)].split("_input")[0]
            else:
                sid = str(index)
            sample = {"input": inp, "label": lab, "id": sid}
            if self.random_flip:
                # flips ship only when augmentation is on: an all-zero flips
                # array would still make the jitted step materialize flipped
                # copies + per-pixel selects of every eval batch for nothing
                sample["flips"] = (rng.random(2) > 0.5).astype(np.uint8)
            return sample
        if self._pass_rng:
            return self.dataset.__getitem__(int(index), rng=rng)
        return self.dataset[int(index)]

    def _assemble(self, pool: ThreadPoolExecutor, indices: np.ndarray):
        nvalid = len(indices)  # global count of real samples in this batch

        if self.process_count > 1:
            # decode only this host's contiguous slice of the padded global batch
            per = self.batch_size // self.process_count
            lo, hi = self.process_index * per, (self.process_index + 1) * per
            local_indices = indices[lo:min(hi, len(indices))]
            local_rows = per
        else:
            local_indices = indices
            local_rows = self.batch_size

        samples = list(pool.map(self._load_sample, local_indices))
        inp_dtype = np.uint8 if self.device_preproc else np.float32
        lab_dtype = np.uint8 if self.device_preproc else np.int32
        if samples:
            inp = np.stack([s["input"] for s in samples]).astype(inp_dtype)
            lab = np.stack([s["label"] for s in samples]).astype(lab_dtype)
            self._shape_cache = tuple(inp.shape[1:])
        else:  # this host's slice is pure padding
            shape = self._sample_shape()
            inp = np.zeros((0,) + shape, inp_dtype)
            lab = np.zeros((0,) + shape[:-1], lab_dtype)
        ids = [s.get("id", str(i)) for s, i in zip(samples, local_indices)]
        flips = None
        if self.device_preproc and self.random_flip:
            flips = (
                np.stack([s["flips"] for s in samples]).astype(np.uint8)
                if samples else np.zeros((0, 2), np.uint8)
            )

        if inp.shape[0] < local_rows:  # pad the final partial batch
            pad = local_rows - inp.shape[0]
            inp = np.concatenate([inp, np.zeros((pad,) + inp.shape[1:], inp_dtype)])
            # PAD_LABEL = 255 fits uint8 exactly
            lab = np.concatenate([lab, np.full((pad,) + lab.shape[1:], PAD_LABEL, lab_dtype)])
            if flips is not None:
                flips = np.concatenate([flips, np.zeros((pad, 2), np.uint8)])

        batch = {"input": inp, "label": lab}
        if flips is not None:
            batch["flips"] = flips
        batch["id"] = ids
        batch["nvalid"] = nvalid
        return batch

    def _sharding_for(self, v: np.ndarray):
        """Per-array sharding: image-shaped arrays (input NHWC, label NHW)
        take the full spec; low-rank per-example arrays (e.g. (N, 2) flips)
        keep only the leading batch axis — under a 2-D DP x SP training mesh
        the spatial axis must not shard their trailing dims."""
        spec = getattr(self.sharding, "spec", None)
        if spec is None or len(spec) <= 1 or v.ndim >= 3:
            return self.sharding
        from jax.sharding import NamedSharding, PartitionSpec

        return NamedSharding(self.sharding.mesh, PartitionSpec(spec[0]))

    def _transfer(self, batch):
        """device_put the array fields (sharded across the mesh / stitched
        across hosts); runs on its own pipeline stage so the H2D transfer of
        batch N overlaps the decode of batch N+1."""
        if self.sharding is None:
            return batch
        from ..parallel.multihost import put_global

        out = {
            k: put_global(v, self._sharding_for(v)) if isinstance(v, np.ndarray)
            else v
            for k, v in batch.items()
        }
        return out

    def __iter__(self) -> Iterator[dict]:
        order = self._order()
        nb = len(self)
        batches = [order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

        # two-stage pipeline: decode thread -> raw_q -> transfer thread -> dev_q
        # (a single producer serialized decode then device_put per batch; the
        # stages overlap them, which matters when H2D transfer is slow)
        raw_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        dev_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(q: queue.Queue, item) -> bool:
            """Bounded put that re-checks stop: a consumer abandoning iteration
            with full queues must not strand the pipeline threads (and the
            decode pool) in q.put forever."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def get_or_stop(q: queue.Queue):
            while not stop.is_set():
                try:
                    return q.get(timeout=0.1)
                except queue.Empty:
                    continue
            return None

        def decoder():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        if not put_or_stop(raw_q, self._assemble(pool, b)):
                            return
                put_or_stop(raw_q, _SENTINEL)
            except BaseException as e:  # propagate decode errors downstream
                put_or_stop(raw_q, e)

        def transferrer():
            try:
                while True:
                    item = get_or_stop(raw_q)
                    if item is None:
                        return
                    if item is _SENTINEL or isinstance(item, BaseException):
                        put_or_stop(dev_q, item)
                        return
                    if not put_or_stop(dev_q, self._transfer(item)):
                        return
            except BaseException as e:
                put_or_stop(dev_q, e)

        threading.Thread(target=decoder, daemon=True).start()
        threading.Thread(target=transferrer, daemon=True).start()
        try:
            while True:
                item = dev_q.get()
                if item is _SENTINEL:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
