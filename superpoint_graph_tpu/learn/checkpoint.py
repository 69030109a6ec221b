"""Checkpoint / resume.

Reference parity (main.py:342-346, 390-412): a single file holding
{epoch, args, model state, optimizer state, edge-feature scaler}; resume
rebuilds the model from the checkpoint's *own* saved args so architecture
flags cannot drift. Serialization is flax msgpack for arrays + a json header
for args/scaler (no torch pickle)."""
from __future__ import annotations

import json
import os
import struct
from typing import Any

import flax.serialization
import numpy as np


def save_checkpoint(path: str, state, epoch: int, args: dict, scaler: dict | None):
    """Write {epoch, args, state, scaler} to one file (model.ckpt convention)."""
    header = {
        "epoch": int(epoch),
        "args": args,
        "scaler": None
        if scaler is None
        else {k: np.asarray(v).tolist() for k, v in scaler.items()},
    }
    hb = json.dumps(header).encode()
    sb = flax.serialization.to_bytes(state)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(struct.pack("<Q", len(hb)))
        f.write(hb)
        f.write(sb)
    os.replace(tmp, path)


def load_checkpoint(path: str, state_template: Any):
    """Returns (state, epoch, args, scaler); `state_template` supplies the
    pytree structure (build the model from the returned args first when
    resuming cold — see cli/train.py resume path)."""
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode())
        sb = f.read()
    state = flax.serialization.from_bytes(state_template, sb)
    scaler = header["scaler"]
    if scaler is not None:
        scaler = {k: np.asarray(v) for k, v in scaler.items()}
    return state, header["epoch"], header["args"], scaler


def read_checkpoint_args(path: str) -> dict:
    """Read only the args header (for model reconstruction before load)."""
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        return json.loads(f.read(hlen).decode())["args"]
