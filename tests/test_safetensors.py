"""Dependency-free safetensors reader."""

import json
import struct

import numpy as np

from wise_tpu.models.clip.convert import load_safetensors


def _write_safetensors(path, tensors):
    header = {}
    blobs = []
    offset = 0
    for name, (dtype_tag, arr, raw) in tensors.items():
        header[name] = {
            "dtype": dtype_tag,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        blobs.append(raw)
        offset += len(raw)
    hj = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hj)))
        f.write(hj)
        for b in blobs:
            f.write(b)


def test_f32_and_bf16_round_trip(tmp_path, rng):
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b32 = rng.standard_normal((2, 5)).astype(np.float32)
    # bf16 = top 16 bits of the f32 pattern
    b_bf16_raw = (b32.view(np.uint32) >> 16).astype("<u2").tobytes()
    f = tmp_path / "m.safetensors"
    _write_safetensors(
        f,
        {
            "w.weight": ("F32", a, a.astype("<f4").tobytes()),
            "w.bf16": ("BF16", b32, b_bf16_raw),
        },
    )
    sd = load_safetensors(f)
    np.testing.assert_array_equal(sd["w.weight"], a)
    # bf16 loses mantissa bits; values must match after bf16 truncation
    expect = (b32.view(np.uint32) & 0xFFFF0000).view(np.float32)
    np.testing.assert_array_equal(sd["w.bf16"], expect)
