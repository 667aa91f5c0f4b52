"""Persistent decoded-sample pack: decode+resize once, memmap forever.

The host input pipeline is decode-bound on real datasets (a 900² MVTec PNG costs
~23 ms to inflate on one core — far above the ~4.7 ms/image the device demands at
212 img/s). The RAM SampleCache (cache.py) only helps epochs 2+ of one process;
every CLI in run_pipeline.sh (train → test → visualize) used to re-decode the
dataset from scratch. This module gives datasets a content-addressed on-disk pack:

- fingerprint = sha1 over a config tag + every source file's (path, size, mtime) —
  any dataset edit or size change invalidates the pack automatically;
- arrays are stored as .npy memmaps (image/mask at the fixed training shape),
  scalars as vectors, strings in meta.json;
- the build is atomic (temp dir + rename), so concurrent/killed builds are safe;
- reads are OS-page-cache memcpys: a *fresh process* iterates at memmap speed,
  which is what makes the cold CLI epoch faster than the device step.

The reference has no counterpart (it re-decodes every image every epoch,
/root/reference/src/dataset.py:91-127).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from typing import Callable, Dict, Iterable, Optional

import numpy as np

_FORMAT_VERSION = 1


def fingerprint(tag: str, paths: Iterable[str]) -> str:
    """Content fingerprint: config tag + (basename, size, mtime_ns) per file."""
    h = hashlib.sha1()
    h.update(f"v{_FORMAT_VERSION}|{tag}".encode())
    for p in sorted(paths):
        try:
            st = os.stat(p)
            h.update(f"|{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}".encode())
        except OSError:
            h.update(f"|{os.path.basename(p)}:missing".encode())
    return h.hexdigest()[:20]


class PackedStore:
    """Memmap-backed store of homogeneous sample dicts."""

    def __init__(self, path: str):
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self.n = self.meta["n"]
        self._arrays: Dict[str, np.ndarray] = {}
        for name, spec in self.meta["fields"].items():
            if spec["kind"] in ("array", "scalar"):
                self._arrays[name] = np.load(os.path.join(path, f"{name}.npy"),
                                             mmap_mode="r")

    def load(self, idx: int) -> Dict:
        out: Dict = {}
        for name, spec in self.meta["fields"].items():
            if spec["kind"] == "array":
                out[name] = self._arrays[name][idx]
            elif spec["kind"] == "scalar":
                out[name] = self._arrays[name][idx]
            else:  # str
                out[name] = self.meta["strings"][name][idx]
        return out

    # -- construction ------------------------------------------------------

    @classmethod
    def open_or_build(cls, cache_root: str, fp: str, n: int,
                      loader_fn: Callable[[int], Dict],
                      log: Optional[Callable[[str], None]] = None
                      ) -> Optional["PackedStore"]:
        """Open the pack for fingerprint ``fp``; build it (atomically) on miss.

        Returns None when n == 0 or the build fails (caller falls back to the
        direct decode path).
        """
        if n == 0:
            return None
        path = os.path.join(cache_root, fp)
        if os.path.isdir(path):
            try:
                return cls(path)
            except Exception:
                shutil.rmtree(path, ignore_errors=True)  # corrupt — rebuild
        tmp = None
        try:
            os.makedirs(cache_root, exist_ok=True)
            tmp = tempfile.mkdtemp(prefix=f".{fp}.", dir=cache_root)
            cls._build(tmp, n, loader_fn, log)
            try:
                os.rename(tmp, path)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)  # another process won
            return cls(path)
        except Exception as e:
            if tmp is not None:  # never leak a partial build into the cache root
                shutil.rmtree(tmp, ignore_errors=True)
            if log:
                log(f"disk cache build failed ({type(e).__name__}: {e}); "
                    "continuing without it")
            return None

    @staticmethod
    def _build(path: str, n: int, loader_fn: Callable[[int], Dict],
               log: Optional[Callable[[str], None]]) -> None:
        first = loader_fn(0)
        fields: Dict[str, Dict] = {}
        strings: Dict[str, list] = {}
        mmaps: Dict[str, np.ndarray] = {}
        for name, v in first.items():
            if isinstance(v, np.ndarray) and v.ndim > 0:
                fields[name] = {"kind": "array", "shape": list(v.shape),
                                "dtype": str(v.dtype)}
                mmaps[name] = np.lib.format.open_memmap(
                    os.path.join(path, f"{name}.npy"), mode="w+",
                    dtype=v.dtype, shape=(n, *v.shape))
            elif isinstance(v, str):
                fields[name] = {"kind": "str"}
                strings[name] = [None] * n
            else:
                arr = np.asarray(v)
                fields[name] = {"kind": "scalar", "dtype": str(arr.dtype)}
                mmaps[name] = np.lib.format.open_memmap(
                    os.path.join(path, f"{name}.npy"), mode="w+",
                    dtype=arr.dtype, shape=(n,))

        def write(i: int, sample: Dict) -> None:
            for name, spec in fields.items():
                if spec["kind"] == "str":
                    strings[name][i] = sample[name]
                else:
                    mmaps[name][i] = sample[name]

        write(0, first)
        # Threaded decode (PIL releases the GIL); each thread writes disjoint rows.
        workers = min(8, os.cpu_count() or 1)
        if n > 1:
            import concurrent.futures as cf
            done = 1
            with cf.ThreadPoolExecutor(max_workers=workers) as pool:
                for i, sample in zip(range(1, n),
                                     pool.map(loader_fn, range(1, n))):
                    write(i, sample)
                    done += 1
                    if log and done % 64 == 0:
                        log(f"disk cache: packed {done}/{n} samples")
        for m in mmaps.values():
            m.flush()
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"n": n, "fields": fields, "strings": strings,
                       "format_version": _FORMAT_VERSION}, f)


def default_cache_root() -> Optional[str]:
    """Env-controlled default: TPU_UNET_DATA_CACHE (set empty/'0' to disable)."""
    v = os.environ.get("TPU_UNET_DATA_CACHE",
                       os.path.expanduser("~/.cache/tpu_unet_data"))
    return v if v not in ("", "0", "off") else None
