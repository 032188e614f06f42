"""Host-side rendering: terminal text -> RGB frames -> gif/mp4.

Parity: the reference's render cache + text->image + animation path
(srl/base/render.py:15-23, srl/utils/render_functions.py, Runner.animation_save_gif
srl/runner/runner.py:1019). Rendering never touches the compiled path — an episode is
replayed host-side from the functional env (whose state pytree makes replay trivial)
and frames are drawn with PIL.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from typing import Callable, List, Optional

import numpy as np


def text_to_rgb(text: str, font_size: int = 14, pad: int = 8) -> np.ndarray:
    """Monospace-render a text block to an RGB array (parity:
    srl/utils/render_functions.py text_to_rgb_array)."""
    from PIL import Image, ImageDraw, ImageFont

    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf", font_size
        )
    except OSError:
        font = ImageFont.load_default()
    lines = text.rstrip("\n").split("\n") or [""]
    dummy = Image.new("RGB", (1, 1))
    d = ImageDraw.Draw(dummy)
    w = max(int(d.textlength(line, font=font)) for line in lines) + 2 * pad
    line_h = font_size + 4
    h = line_h * len(lines) + 2 * pad
    img = Image.new("RGB", (max(w, 32), max(h, 32)), (20, 20, 30))
    draw = ImageDraw.Draw(img)
    for i, line in enumerate(lines):
        draw.text((pad, pad + i * line_h), line, fill=(230, 230, 230), font=font)
    return np.asarray(img)


def capture_terminal_render(env, state) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        env.render_terminal(state)
    return buf.getvalue()


def env_frame(env, state) -> np.ndarray:
    """Best-available RGB frame: env.render_rgb if defined, else rendered text."""
    fn = getattr(env, "render_rgb", None)
    if fn is not None:
        out = fn(state)
        if out is not None:
            return np.asarray(out)
    return text_to_rgb(capture_terminal_render(env, state) or "(no render)")


def composite_frame(env_img: np.ndarray, text: str) -> np.ndarray:
    """Stack an env frame above a rendered text panel — the reference's composite of
    env image + RL worker view (srl/base/rl/worker_run.py create_render_image,
    :413-543)."""
    panel = text_to_rgb(text)
    w = max(env_img.shape[1], panel.shape[1])
    h = env_img.shape[0] + panel.shape[0]
    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[: env_img.shape[0], : env_img.shape[1]] = env_img[..., :3]
    canvas[env_img.shape[0] :, : panel.shape[1]] = panel
    return canvas


def save_gif(frames: List[np.ndarray], path: str, fps: float = 2.0) -> None:
    from PIL import Image

    if not frames:
        raise ValueError("no frames to save")
    # pad frames to a common size
    h = max(f.shape[0] for f in frames)
    w = max(f.shape[1] for f in frames)
    imgs = []
    for f in frames:
        canvas = np.zeros((h, w, 3), np.uint8)
        canvas[: f.shape[0], : f.shape[1]] = f[..., :3]
        imgs.append(Image.fromarray(canvas))
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=int(1000 / fps),
        loop=0,
    )
