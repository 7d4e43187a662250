"""Synthetic media file generation for tests (no external assets)."""

import wave

import numpy as np


def make_video(path, seconds=4, fps=10, size=(64, 48), fourcc="mp4v"):
    """Video whose frames encode their second index in the red channel:
    frame at time t has R = 10 + 20*floor(t). Returns num frames."""
    import cv2

    w, h = size
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*fourcc), fps, (w, h)
    )
    assert writer.isOpened(), "cv2 VideoWriter failed to open"
    n = int(seconds * fps)
    for i in range(n):
        sec = int(i / fps)
        frame = np.zeros((h, w, 3), dtype=np.uint8)
        frame[:, :, 2] = (10 + 20 * sec) % 256  # BGR: red channel
        frame[:, :, 1] = (i * 3) % 256  # green varies per frame
        writer.write(frame)
    writer.release()
    return n


def make_wav(path, seconds=4.0, rate=16000, freq=440.0, channels=1):
    t = np.arange(int(seconds * rate)) / rate
    sig = 0.5 * np.sin(2 * np.pi * freq * t)
    data = (sig * 32767).astype(np.int16)
    if channels == 2:
        data = np.stack([data, data], axis=1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(data.tobytes())
    return len(t)


def make_av(path, seconds=4, fps=10, size=(64, 48), rate=16000, freq=440.0):
    """True AV file: MJPEG video + PCM16 audio muxed into an AVI container,
    written by hand (RIFF chunks) — no encoder dependency. FFmpeg reads it
    as MediaType.AV."""
    import struct

    import cv2

    w, h = size
    n_frames = int(seconds * fps)
    # JPEG frames (red encodes second index, like make_video)
    jpegs = []
    for i in range(n_frames):
        sec = int(i / fps)
        frame = np.zeros((h, w, 3), dtype=np.uint8)
        frame[:, :, 2] = (10 + 20 * sec) % 256
        frame[:, :, 1] = (i * 3) % 256
        ok, buf = cv2.imencode(".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, 90])
        assert ok
        jpegs.append(bytes(buf))
    t = np.arange(int(seconds * rate)) / rate
    pcm = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2").tobytes()
    samples_per_frame = rate // fps

    def chunk(fourcc, payload):
        pad = b"\0" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind, payload):
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, n_frames, 0, 2, 0, w, h,
        0, 0, 0, 0,
    )
    strh_v = (
        b"vids" + b"MJPG" + struct.pack("<I", 0)
        + struct.pack("<2H", 0, 0)
        + struct.pack("<8I", 0, 1, fps, 0, n_frames, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    bmih = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)
    strl_v = lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", bmih))
    strh_a = (
        b"auds" + b"\0\0\0\0" + struct.pack("<I", 0)
        + struct.pack("<2H", 0, 0)
        + struct.pack("<8I", 0, 1, rate, 0, int(seconds * rate), 0,
                      0xFFFFFFFF, 2)
        + struct.pack("<4H", 0, 0, 0, 0)
    )
    wfmt = struct.pack("<2H2I2H", 1, 1, rate, rate * 2, 2, 16)
    strl_a = lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", wfmt))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl_v + strl_a)

    movi_payload = b""
    for i, jp in enumerate(jpegs):
        movi_payload += chunk(b"00dc", jp)
        a0 = i * samples_per_frame * 2
        movi_payload += chunk(b"01wb", pcm[a0 : a0 + samples_per_frame * 2])
    movi = lst(b"movi", movi_payload)

    riff_payload = b"AVI " + hdrl + movi
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
    return n_frames


def make_av_lossless(path, seconds=6, fps=4, size=(48, 32), rate=48000,
                     freq=440.0, block_seconds=2, seed=20260816):
    """Lossless AV file: raw bottom-up BGR24 (DIB / BI_RGB) video + PCM16
    audio muxed into a hand-written AVI. Every decoder (libav rawvideo,
    cv2) reproduces the frame bytes EXACTLY — no DCT, no chroma subsampling,
    no colorspace rounding — so content-hashed extractors (RandomFeatures)
    are bit-stable and the output can be pinned in a golden file
    (VERDICT round-1 item 5: put video under the committed-CSV pin).

    Frames are constant within each ``block_seconds`` block (pattern varies
    per block), so 2 fps samples inside one block embed identically and
    exercise merge0's adjacent-in-time merging. Width*3 must be a multiple
    of 4 (DIB row stride) — asserted.

    Returns num frames.
    """
    import struct

    w, h = size
    assert (w * 3) % 4 == 0, "DIB rows must be 4-byte aligned; pick w%4==0"
    n_frames = int(seconds * fps)
    rng = np.random.default_rng(seed)
    n_blocks = int(np.ceil(seconds / block_seconds))
    block_imgs = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for _ in range(n_blocks)
    ]

    def dib(frame_bgr):
        return frame_bgr[::-1].tobytes()  # bottom-up rows

    t = np.arange(int(seconds * rate)) / rate
    pcm = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2").tobytes()
    samples_per_frame = rate // fps

    def chunk(fourcc, payload):
        pad = b"\0" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind, payload):
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, n_frames, 0, 2, 0, w, h,
        0, 0, 0, 0,
    )
    strh_v = (
        b"vids" + b"DIB " + struct.pack("<I", 0)
        + struct.pack("<2H", 0, 0)
        + struct.pack("<8I", 0, 1, fps, 0, n_frames, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    # biCompression = 0 (BI_RGB), 24 bpp, positive height => bottom-up
    bmih = struct.pack("<I2i2H2I2i2I", 40, w, h, 1, 24, 0, w * h * 3,
                       0, 0, 0, 0)
    strl_v = lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", bmih))
    strh_a = (
        b"auds" + b"\0\0\0\0" + struct.pack("<I", 0)
        + struct.pack("<2H", 0, 0)
        + struct.pack("<8I", 0, 1, rate, 0, int(seconds * rate), 0,
                      0xFFFFFFFF, 2)
        + struct.pack("<4H", 0, 0, 0, 0)
    )
    wfmt = struct.pack("<2H2I2H", 1, 1, rate, rate * 2, 2, 16)
    strl_a = lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", wfmt))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl_v + strl_a)

    movi_payload = b""
    for i in range(n_frames):
        sec = i / fps
        block = min(int(sec // block_seconds), n_blocks - 1)
        movi_payload += chunk(b"00db", dib(block_imgs[block]))
        a0 = i * samples_per_frame * 2
        movi_payload += chunk(b"01wb", pcm[a0 : a0 + samples_per_frame * 2])
    movi = lst(b"movi", movi_payload)

    riff_payload = b"AVI " + hdrl + movi
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
    return n_frames


def make_image(path, size=(32, 32), value=128):
    import cv2

    h, w = size
    img = np.full((h, w, 3), value, dtype=np.uint8)
    cv2.imwrite(str(path), img)
