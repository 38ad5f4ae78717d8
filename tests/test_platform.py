"""Platform layer tests: scripted input, frame loop, hot reload (CS-4 analog), RNG."""

import os
import textwrap
import time

import numpy as np
import jax.numpy as jnp

from dtrenderer_tpu import platform as plat
from dtrenderer_tpu.ops import fb as fblib


def test_input_script_transitions():
    script = plat.InputScript({
        0: {"press": ["w"]},
        2: {"press": ["a"], "release": ["w"]},
    })
    f0 = script.next_frame()
    assert "w" in f0.keys_down and "w" in f0.keys_pressed
    f1 = script.next_frame()
    assert "w" in f1.keys_down and "w" not in f1.keys_pressed
    f2 = script.next_frame()
    assert "a" in f2.keys_down and "w" not in f2.keys_down
    assert abs(f2.time_now_s - 2 / 60) < 1e-9


def test_run_app_loop():
    frames_seen = []

    def update(state, inp):
        return state + (1 if "w" in inp.keys_down else 0)

    script = plat.InputScript({0: {"press": ["w"]}, 3: {"release": ["w"]}})
    state, n, reloads = plat.run_app(
        update, 0, 6, script, on_frame=lambda i, s: frames_seen.append(i)
    )
    assert state == 3  # frames 0,1,2 had w down
    assert n == 6 and reloads == 0
    assert frames_seen == list(range(6))


def test_hot_reload_preserves_state(tmp_path):
    # A scene module whose update() increments state; edit it mid-run and verify
    # the loop picks up new code while the state value survives (CS-4 semantics).
    mod_path = tmp_path / "hot_scene.py"
    mod_path.write_text("def update(state, inp):\n    return state + 1\n")

    import importlib.util

    spec = importlib.util.spec_from_file_location("hot_scene", mod_path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    import sys

    sys.modules["hot_scene"] = module

    reloader = plat.HotReloader(module)

    def edit_after_frame(i, state):
        if i == 2:
            mod_path.write_text(
                "def update(state, inp):\n    return state + 100\n"
            )
            os.utime(mod_path, (time.time() + 2, time.time() + 2))

    state, n, reloads = plat.run_app(
        module.update, 0, 6, reloader=reloader, on_frame=edit_after_frame
    )
    assert reloads == 1
    # frames 0..2 ran +1 (3 total); reload detected at frame 3 -> +100 x3
    assert state == 3 + 300
    del sys.modules["hot_scene"]


def test_present_png(tmp_path):
    fb = fblib.clear(fblib.create(16, 16), jnp.asarray([1, 0, 0, 1], jnp.float32))
    p = str(tmp_path / "out.png")
    plat.present_png(fb, p)
    from PIL import Image

    img = np.asarray(Image.open(p))
    assert img.shape == (16, 16, 4)
    assert img[0, 0, 0] == 255 and img[0, 0, 1] == 0


def test_pcg32_reference_stream():
    from dtrenderer_tpu.utils.rng import Pcg32

    r = Pcg32(seed=42)
    seq = [r.next_u32() for _ in range(4)]
    # deterministic stream: same seed -> same sequence
    r2 = Pcg32(seed=42)
    assert seq == [r2.next_u32() for _ in range(4)]
    r3 = Pcg32(seed=43)
    assert seq != [r3.next_u32() for _ in range(4)]
    f = Pcg32(seed=7)
    vals = [f.next_f32() for _ in range(100)]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert 0.2 < float(np.mean(vals)) < 0.8
    ints = [Pcg32(seed=1).range_i32(5, 10) for _ in range(10)]
    assert all(5 <= v < 10 for v in ints)


def test_pcg32_device_stream_matches_host():
    """Counter-based device PCG32 == sequential host PCG32, bit for bit."""
    import jax
    import jax.numpy as jnp

    from dtrenderer_tpu.utils.rng import Pcg32, pcg32_f32_stream, pcg32_stream

    for seed in (0x853C49E6748FEA9B, 0, 12345, 2**63 + 17):
        g = Pcg32(seed)
        host = np.asarray([g.next_u32() for _ in range(64)], np.uint32)
        dev = np.asarray(jax.jit(lambda s=seed: pcg32_stream(s, 64))())
        assert np.array_equal(host, dev), hex(seed)
    # traced (device-scalar) seed path
    g = Pcg32(777)
    host = np.asarray([g.next_u32() for _ in range(32)], np.uint32)
    dev = np.asarray(jax.jit(lambda s: pcg32_stream(s, 32))(jnp.uint32(777)))
    assert np.array_equal(host, dev)
    g = Pcg32(777)
    hf = np.asarray([g.next_f32() for _ in range(16)], np.float32)
    assert np.array_equal(hf, np.asarray(pcg32_f32_stream(777, 16)))


def test_transition_counts_and_fps_pacing():
    script = plat.InputScript({0: {"press": ["w"], "release": ["s"]}})
    f0 = script.next_frame()
    assert f0.transition_counts == {"w": 1, "s": 1}
    f1 = script.next_frame()
    assert f1.transition_counts == {}

    t0 = time.perf_counter()
    plat.run_app(lambda s, i: s, 0, 3, target_fps=100)  # 3 frames @ >=10ms
    assert time.perf_counter() - t0 >= 0.025
