"""
Disk-backed iterator tee (reference gance/iterator_on_disk.py; SURVEY.md §2.6 row 4).

`itertools.tee` holds un-consumed items in RAM; for frame streams that's gigabytes.
This version serializes each primary item to a temp file per secondary copy;
secondaries deserialize+delete lazily. Serializers: pickle (default) and HDF5
(gzip+shuffle — matching the projection-file dataset settings) for ndarray frames.
"""

import pickle
import tempfile
from collections import deque
from pathlib import Path
from typing import Any, Callable, Deque, Iterator, NamedTuple, Tuple

import numpy as np


class Serializer(NamedTuple):
    """A store/load pair over temp files (reference iterator_on_disk.py:56-115)."""

    store: Callable[[Any, Path], None]
    load: Callable[[Path], Any]


def _pickle_store(item: Any, path: Path) -> None:
    with open(str(path), "wb") as f:
        pickle.dump(item, f, protocol=pickle.HIGHEST_PROTOCOL)


def _pickle_load(path: Path) -> Any:
    with open(str(path), "rb") as f:
        return pickle.load(f)


PICKLE_SERIALIZER = Serializer(store=_pickle_store, load=_pickle_load)


def _hdf5_store(item: np.ndarray, path: Path) -> None:
    import h5py

    with h5py.File(str(path), "w") as f:
        f.create_dataset(
            "item", data=np.asarray(item), compression="gzip",
            compression_opts=9, shuffle=True,
        )


def _hdf5_load(path: Path) -> np.ndarray:
    import h5py

    with h5py.File(str(path), "r") as f:
        return f["item"][:]


HDF5_SERIALIZER = Serializer(store=_hdf5_store, load=_hdf5_load)


def _npy_store(item: np.ndarray, path: Path) -> None:
    with open(str(path), "wb") as f:
        np.save(f, np.asarray(item), allow_pickle=False)


def _npy_load(path: Path) -> np.ndarray:
    with open(str(path), "rb") as f:
        return np.load(f, allow_pickle=False)


# The tee's files are process-lifetime scratch, not archival data, so the
# serializer should cost I/O, not CPU: measured on a 1024px uint8 frame on this
# host, gzip-9 HDF5 stores at ~1.9 s/frame (a ~0.5 f/s ceiling per teed stream,
# dominating every other pipeline stage) vs ~27 ms for a raw .npy at 3.2 MB.
# HDF5_SERIALIZER remains available for disk-constrained runs (its settings
# match the projection-file datasets).
NPY_SERIALIZER = Serializer(store=_npy_store, load=_npy_load)


def iterator_on_disk(
    iterator: Iterator[Any], copies: int = 1, serializer: Serializer = PICKLE_SERIALIZER
) -> Tuple[Iterator[Any], ...]:
    """
    Tee `iterator` into (primary, *copies secondaries) with disk spill instead of
    RAM. The primary serializes each item once per secondary as it is consumed;
    each secondary deserializes (and deletes) lazily in order.
    """
    import shutil

    tmp_dir = Path(tempfile.mkdtemp(prefix="gance_tpu_tee_"))
    queues: Tuple[Deque[Path], ...] = tuple(deque() for _ in range(copies))
    done = {"primary_exhausted": False, "secondaries_live": copies}
    counter = {"n": 0}

    def _maybe_cleanup() -> None:
        if done["secondaries_live"] <= 0 and done["primary_exhausted"]:
            shutil.rmtree(tmp_dir, ignore_errors=True)

    def primary() -> Iterator[Any]:
        for item in iterator:
            for qi, queue in enumerate(queues):
                path = tmp_dir / f"item_{counter['n']}_{qi}"
                serializer.store(item, path)
                queue.append(path)
            counter["n"] += 1
            yield item
        done["primary_exhausted"] = True
        _maybe_cleanup()

    def secondary(queue: Deque[Path]) -> Iterator[Any]:
        while True:
            if queue:
                path = queue.popleft()
                item = serializer.load(path)
                path.unlink(missing_ok=True)
                yield item
            elif done["primary_exhausted"]:
                done["secondaries_live"] -= 1
                _maybe_cleanup()
                return
            else:
                raise RuntimeError(
                    "Disk-tee secondary consumed ahead of the primary iterator; "
                    "drive the primary first (it is the producer)."
                )

    return (primary(),) + tuple(secondary(q) for q in queues)
