"""Frame-sequence assembly (the counterpart of utils/video_merge.py).

The reference delegates video assembly to an out-of-repo OpenCV script that
globs tmp/*.png, sorts by the frame_<i> index and writes an mp4.  Here: GIF
assembly via PIL (always available) and mp4 via the ffmpeg binary when
present.
"""
from __future__ import annotations

import re
import shutil
import subprocess
from pathlib import Path

_FRAME_RE = re.compile(r"frame_(\d+)\.png$")


def sorted_frames(folder):
    """tmp/*.png sorted by frame index (video_merge.py semantics)."""
    frames = []
    for p in Path(folder).glob("frame_*.png"):
        m = _FRAME_RE.search(p.name)
        if m:
            frames.append((int(m.group(1)), p))
    return [p for _, p in sorted(frames)]


def assemble_gif(folder, out_path, frame_rate=30.0):
    from PIL import Image
    frames = sorted_frames(folder)
    if not frames:
        raise FileNotFoundError(f"no frame_<i>.png files in {folder}")
    imgs = [Image.open(p) for p in frames]
    imgs[0].save(out_path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / frame_rate), loop=0)
    return Path(out_path)


def assemble_mp4(folder, out_path, frame_rate=30.0):
    """mp4 via ffmpeg's concat demuxer over the *actual* sorted frames —
    unlike a frame_%d.png input pattern, this tolerates gapped or
    non-zero-start indices (which a resumed render can produce)."""
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not available; use assemble_gif or the "
                           "frames directly")
    frames = sorted_frames(folder)
    if not frames:
        raise FileNotFoundError(f"no frame_<i>.png files in {folder}")
    lst = Path(folder) / ".concat_frames.txt"
    lst.write_text("".join(
        f"file '{p.resolve()}'\nduration {1.0 / frame_rate}\n"
        for p in frames) + f"file '{frames[-1].resolve()}'\n")
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-f", "concat", "-safe", "0", "-i", str(lst),
             "-vf", f"fps={frame_rate}", "-pix_fmt", "yuv420p",
             str(out_path)],
            check=True, capture_output=True)
    finally:
        lst.unlink(missing_ok=True)
    return Path(out_path)
