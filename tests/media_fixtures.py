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


def make_image(path, size=(32, 32), value=128):
    import cv2

    h, w = size
    img = np.full((h, w, 3), value, dtype=np.uint8)
    cv2.imwrite(str(path), img)
