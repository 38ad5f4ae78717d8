"""Host platform layer: frame loop, input, hot reload, output.

TPU-native counterpart of the reference's Win32 platform EXE + platform contract
(SURVEY.md §2 #1/#2): instead of a window + DIB blit + message pump, the platform owns
an offscreen device framebuffer, a scripted/programmatic input source, frame timing,
PNG/NPY output, and the hot-reload loop. The EXE<->DLL split becomes host-Python <->
jitted-frame-function: `PlatformInput`/`RenderState` are the structs crossing the
boundary, `update(state, input) -> state` is the DTR_Update analog, and hot reload
(CS-4: state survives, code swaps) is a module-mtime watch + importlib.reload + re-jit
— the RenderState pytree persists across code swaps exactly like PlatformMemory did.

The reference's worker-thread job queue (CS-5) has no host analog here by design: XLA
owns intra-chip scheduling and parallel/shard.py owns multi-chip decomposition.
"""

from __future__ import annotations

import dataclasses
import importlib
import os
import time
from typing import Callable

import numpy as np
import jax


@dataclasses.dataclass
class PlatformInput:
    """Per-frame input (PlatformInput analog: keys w/ transition counts, mouse)."""
    delta_for_frame: float = 1.0 / 60.0
    time_now_s: float = 0.0
    keys_down: frozenset[str] = frozenset()
    keys_pressed: frozenset[str] = frozenset()  # went down this frame
    transition_counts: dict[str, int] = dataclasses.field(default_factory=dict)
    mouse_x: int = 0
    mouse_y: int = 0
    mouse_buttons: frozenset[str] = frozenset()


class InputScript:
    """Deterministic scripted input source (headless stand-in for the message pump)."""

    def __init__(self, events: dict[int, dict] | None = None, dt: float = 1 / 60):
        self.events = events or {}
        self.dt = dt
        self._down: set[str] = set()
        self.frame = 0

    def next_frame(self) -> PlatformInput:
        ev = self.events.get(self.frame, {})
        pressed = set(ev.get("press", ()))
        released = set(ev.get("release", ()))
        self._down |= pressed
        self._down -= released
        counts: dict[str, int] = {}
        for k in pressed | released:
            counts[k] = counts.get(k, 0) + 1
        inp = PlatformInput(
            delta_for_frame=self.dt,
            time_now_s=self.frame * self.dt,
            keys_down=frozenset(self._down),
            keys_pressed=frozenset(pressed),
            transition_counts=counts,
            mouse_x=ev.get("mouse_x", 0),
            mouse_y=ev.get("mouse_y", 0),
            mouse_buttons=frozenset(ev.get("mouse_buttons", ())),
        )
        self.frame += 1
        return inp


class HotReloader:
    """Watch a module's source file; reload + re-jit when it changes (CS-4 analog)."""

    def __init__(self, module):
        self.module = module
        self.path = module.__file__
        self.mtime = os.path.getmtime(self.path)
        self.reload_count = 0

    def maybe_reload(self) -> bool:
        try:
            mtime = os.path.getmtime(self.path)
        except OSError:
            return False
        if mtime == self.mtime:
            return False
        self.mtime = mtime
        # Re-exec from source (works for both package modules and file-loaded
        # scene scripts, unlike importlib.reload which needs an importable name).
        import importlib.util
        import sys

        spec = importlib.util.spec_from_file_location(
            self.module.__name__, self.path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules[self.module.__name__] = mod
        self.module = mod
        self.reload_count += 1
        return True


def run_app(
    update: Callable,
    state,
    n_frames: int,
    input_source: InputScript | None = None,
    reloader: HotReloader | None = None,
    update_attr: str = "update",
    on_frame: Callable | None = None,
    target_fps: float | None = None,
):
    """The main loop (CS-2 analog): poll input -> maybe hot reload -> update.

    update(state, PlatformInput) -> state must be a host function that calls jitted
    frame kernels internally (re-tracing after a reload is automatic because reload
    produces new function objects). When `reloader` is given, `update` is re-fetched
    from the reloaded module via `update_attr` after each swap — `state` (the pytree)
    survives, code changes, exactly the reference's hot-reload semantics.
    Returns (final_state, frames_rendered, reloads).
    """
    input_source = input_source or InputScript()
    reloads = 0
    frame_budget = (1.0 / target_fps) if target_fps else None
    for i in range(n_frames):
        t0 = time.perf_counter()
        if reloader is not None and reloader.maybe_reload():
            update = getattr(reloader.module, update_attr)
            reloads += 1
        inp = input_source.next_frame()
        state = update(state, inp)
        if on_frame is not None:
            on_frame(i, state)
        if frame_budget is not None:
            # sleep-to-target-fps (reference CS-2: QPC timing + Sleep)
            remaining = frame_budget - (time.perf_counter() - t0)
            if remaining > 0:
                time.sleep(remaining)
    return state, n_frames, reloads


def present_png(state_or_fb, path: str) -> None:
    """Blit-to-screen analog: pack and write the framebuffer as PNG."""
    from PIL import Image

    from dtrenderer_tpu.ops import fb as fblib

    fb = getattr(state_or_fb, "fb", state_or_fb)
    img = np.asarray(fblib.pack(fb))
    Image.fromarray(img, "RGBA").save(path)
