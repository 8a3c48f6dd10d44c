"""Media IO: video/frame saving and loading.

Covers the reference utilities (``animation/diffsynth/utils/data/__init__.py``:
``VideoData``, ``save_video``, ``save_frames``).  Backend ladder:
imageio-ffmpeg (mp4) -> PIL GIF -> PNG frame directory, since the execution
image may lack ffmpeg.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def _to_uint8_frames(video) -> List[np.ndarray]:
    frames = []
    for f in video:
        a = np.asarray(f)
        if a.dtype != np.uint8:
            a = np.clip(a, 0, 255).astype(np.uint8)
        frames.append(a)
    return frames


def save_frames(video, save_path: str):
    """Frames -> numbered PNGs (reference utils/data/__init__.py:147)."""
    from PIL import Image

    os.makedirs(save_path, exist_ok=True)
    for i, frame in enumerate(_to_uint8_frames(video)):
        Image.fromarray(frame).save(os.path.join(save_path, f"{i:05d}.png"))


def save_video(video, save_path: str, fps: int = 15, quality: int = 5):
    """Frames -> mp4 (ffmpeg) with GIF / frame-dir fallbacks."""
    frames = _to_uint8_frames(video)
    os.makedirs(os.path.dirname(os.path.abspath(save_path)) or ".", exist_ok=True)
    try:
        import imageio

        writer = imageio.get_writer(save_path, fps=fps, quality=quality)
        for f in frames:
            writer.append_data(f)
        writer.close()
        return save_path
    except Exception:
        pass
    from PIL import Image

    if not save_path.lower().endswith(".gif"):
        save_path = os.path.splitext(save_path)[0] + ".gif"
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(save_path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return save_path


class VideoData:
    """Lazy frame access over a video file or a frame directory
    (reference utils/data/__init__.py:83)."""

    def __init__(self, video_file: Optional[str] = None,
                 image_folder: Optional[str] = None, height=None, width=None):
        self.height = height
        self.width = width
        if image_folder is not None:
            self._files = [
                os.path.join(image_folder, f)
                for f in sorted(os.listdir(image_folder))
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
            ]
            self._reader = None
        else:
            import imageio

            self._reader = imageio.get_reader(video_file)
            self._files = None

    def __len__(self):
        if self._files is not None:
            return len(self._files)
        return int(self._reader.count_frames())

    def __getitem__(self, i):
        from PIL import Image

        if self._files is not None:
            img = Image.open(self._files[i]).convert("RGB")
        else:
            img = Image.fromarray(self._reader.get_data(i))
        if self.height and self.width:
            img = img.resize((self.width, self.height))
        return img


def load_video_frames(path: str, height: Optional[int] = None,
                      width: Optional[int] = None):
    """Load all frames of a video file or frame directory as PIL images."""
    vd = (VideoData(image_folder=path, height=height, width=width)
          if os.path.isdir(path)
          else VideoData(video_file=path, height=height, width=width))
    return [vd[i] for i in range(len(vd))]


def load_wav(path: str):
    """Decode a PCM ``.wav`` to a mono float waveform in [-1, 1].

    Returns ``(samples, sample_rate)``.  Handles the PCM sample widths the
    ``wave`` module can carry: 8-bit unsigned, 16-bit, 24-bit packed and
    32-bit signed little-endian; multi-channel files are averaged to mono.
    (The S2V audio path feeds this straight into the Wav2Vec2 tower —
    a misdecoded width would silently drive the video with noise.)"""
    import wave

    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        width = f.getsampwidth()
        n_ch = f.getnchannels()
        raw = f.readframes(f.getnframes())
    if width == 1:  # unsigned 8-bit
        data = np.frombuffer(raw, np.uint8).astype(np.float32)
        data = (data - 128.0) / 128.0
    elif width == 2:
        data = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif width == 3:  # packed 24-bit: widen to int32 via a zero LSB byte
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        i32 = np.zeros((b.shape[0], 4), np.uint8)
        i32[:, 1:] = b  # little-endian: pad the low byte
        data = i32.view("<i4")[:, 0].astype(np.float32) / 2147483648.0
    elif width == 4:
        data = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported wav sample width: {width} bytes")
    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1)
    return data, sr


def merge_video_audio(video_path: str, audio_path: str):
    """Mux an audio track into an existing video via ffmpeg (reference
    utils/data/__init__.py:150-212): copy the video stream, AAC-encode the
    audio, trim to the shorter of the two.  Raises if ffmpeg is missing or
    fails — callers that can live without audio should catch."""
    import shutil
    import subprocess

    if not os.path.exists(video_path):
        raise FileNotFoundError(f"video file {video_path} does not exist")
    if not os.path.exists(audio_path):
        raise FileNotFoundError(f"audio file {audio_path} does not exist")
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        try:
            import imageio_ffmpeg

            ffmpeg = imageio_ffmpeg.get_ffmpeg_exe()
        except Exception as e:
            raise RuntimeError("no ffmpeg available to mux audio") from e
    base, ext = os.path.splitext(video_path)
    temp_output = f"{base}_temp{ext}"
    command = [
        ffmpeg, "-y", "-i", video_path, "-i", audio_path,
        "-c:v", "copy", "-c:a", "aac", "-b:a", "192k",
        "-map", "0:v:0", "-map", "1:a:0", "-shortest", temp_output,
    ]
    try:
        result = subprocess.run(command, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True)
        if result.returncode != 0:
            raise RuntimeError(f"ffmpeg failed: {result.stderr[-2000:]}")
        shutil.move(temp_output, video_path)
    except Exception:
        if os.path.exists(temp_output):
            os.remove(temp_output)
        raise


def save_video_with_audio(video, save_path: str, audio_path: str,
                          fps: int = 16, quality: int = 9):
    """Reference ``save_video_with_audio`` (utils/data/__init__.py:215):
    write the frames, then mux the driving audio (S2V outputs)."""
    out = save_video(video, save_path, fps=fps, quality=quality)
    merge_video_audio(out, audio_path)
    return out
