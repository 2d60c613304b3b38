"""Crash-safe checkpointing — imsim/checkpoint.py parity.

Named pickle blobs stored as uint8 datasets in one HDF5 file per
(visit, band, detector), with the reference's 5-step backup/rename
protocol so a crash at any instant leaves a recoverable file
(imsim/checkpoint.py:32-65): write to .new, move current to .bak,
rename .new -> current, remove .bak; on open, recover from whichever
of (.new, .bak, current) survived.

TPU-specific notes: payloads are host numpy (device arrays are pulled
once per checkpoint, matching the reference's per-batch cadence at
imsim/lsst_image.py:376-389); writes can be throttled by the caller
via nbatch_per_checkpoint exactly like config/imsim-config.yaml:166-172.
"""
from __future__ import annotations

import os
import pickle

import h5py
import numpy as np


class Checkpointer:
    def __init__(self, file_name: str, dir=None, init=True, logger=None):
        if dir:
            file_name = os.path.join(dir, file_name)
        self.file_name = file_name
        self.logger = logger
        if init:
            self._recover()

    # --- crash-state recovery (checkpoint.py:32-65) -----------------------
    def _recover(self):
        cur = self.file_name
        new = cur + "_new"
        bak = cur + "_bak"
        if os.path.exists(cur):
            # An intact current file always wins.  save() writes _new
            # while current still exists, so a crash during that write
            # (the longest window) leaves a truncated _new next to a
            # good current — promoting _new would destroy the last good
            # state (imsim/checkpoint.py:32-65 cases B/C).
            if os.path.exists(new):
                os.remove(new)
            if os.path.exists(bak):
                os.remove(bak)
        elif os.path.exists(new):
            # crash between the two renames: current was already moved
            # to _bak, and _new is complete (written+closed earlier)
            os.replace(new, cur)
            if os.path.exists(bak):
                os.remove(bak)
        elif os.path.exists(bak):
            os.replace(bak, cur)
        d = os.path.dirname(os.path.abspath(cur))
        os.makedirs(d, exist_ok=True)

    # --- API (checkpoint.py:67-121) ---------------------------------------
    def save(self, name: str, data) -> None:
        """Pickle `data` under `name`, preserving all other names."""
        cur = self.file_name
        new = cur + "_new"
        bak = cur + "_bak"
        blob = np.frombuffer(pickle.dumps(data, protocol=4), np.uint8)
        with h5py.File(new, "w") as fnew:
            if os.path.exists(cur):
                with h5py.File(cur, "r") as fcur:
                    for k in fcur:
                        if k != name:
                            fnew.create_dataset(k, data=fcur[k][:])
            fnew.create_dataset(name, data=blob)
        if os.path.exists(cur):
            os.replace(cur, bak)
        os.replace(new, cur)
        if os.path.exists(bak):
            os.remove(bak)
        if self.logger:
            self.logger.debug("checkpoint save %s (%d bytes)", name,
                              blob.nbytes)

    def load(self, name: str):
        """Return the stored object or None if absent."""
        if not os.path.exists(self.file_name):
            return None
        with h5py.File(self.file_name, "r") as f:
            if name not in f:
                return None
            blob = f[name][:]
        return pickle.loads(blob.tobytes())

    def names(self):
        if not os.path.exists(self.file_name):
            return []
        with h5py.File(self.file_name, "r") as f:
            return list(f.keys())
